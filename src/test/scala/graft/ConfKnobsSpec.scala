package graft

import graft.operators.{Curation, Similarity, TextOps}

/** The fixture-scaled constants are session-conf knobs ([[Conf]]): each
  * test here sets a NON-default value, proves the entry honors it with
  * a brute-force expectation, and unsets the key (shared session — a
  * leaked knob would silently move other suites off their oracles).
  */
class ConfKnobsSpec extends SparkSpecBase {

  private def withConf[T](key: String, value: String)(body: => T): T =
    try { spark.conf.set(key, value); body }
    finally spark.conf.unset(key)

  test("coverage sizes knob: custom size list, coverage vs brute force") {
    withConf(TextOps.CoverageVocabSizesConf, "2, 31") {
      val rows = TextOps.vocabCoverage(spark, Sf).collect()
        .map(r => r.getAs[Long]("vocab_size") -> (r.getAs[Long]("n_covered"), r.getAs[Double]("coverage"))).toMap
      assert(rows.keySet == Set(2L, 31L))
      // brute force off the same fixture: sum of the top-V counts
      val wc = TextOps.wordCount(spark, Sf).collect()
        .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt"))
      val byRank = wc.sortBy { case (w, c) => (-c, w) }.map(_._2)
      val tot = byRank.sum.toDouble
      Seq(2, 31).foreach { v =>
        val want = byRank.take(v).sum
        assert(rows(v.toLong) == ((want, want / tot)), s"V=$v")
      }
      // the fixture vocabulary is 31 types — full coverage at V=31
      assert(rows(31L)._2 == 1.0)
    }
  }

  test("coverage select knobs: K=3 picks exactly 3, small universe") {
    withConf(Curation.CovSelectKConf, "3") {
      withConf(Curation.CovUniverseConf, "64") {
        val rows = Curation.coverageSelect(spark, Sf).collect()
        assert(rows.length <= 3)
        assert(rows.map(_.getAs[Long]("step")).toSeq ==
          (1L to rows.length.toLong).toSeq)
        // covered never exceeds the shrunken universe
        assert(rows.forall(_.getAs[Long]("covered") <= 64L))
      }
    }
  }

  test("mrl budgets knob: custom widths, full width still identity") {
    withConf(Similarity.MrlBudgetsConf, "4, 64") {
      val rows = Similarity.matryoshka(spark, Sf).collect()
        .map(r => r.getAs[Long]("dims") -> r.getAs[Double]("recall")).toMap
      assert(rows.keySet == Set(4L, 64L))
      assert(rows(64L) == 1.0)
      assert(rows(4L) <= rows(64L))
    }
  }

  test("encode vocab knob: V=4 leaves only 4 distinct non-OOV ids") {
    withConf(TextOps.EncodeVocabConf, "4") {
      val ids = TextOps.queries("llm_encode")(spark, Sf).collect()
        .flatMap(_.getString(3).split(",")).filter(_.nonEmpty)
        .map(_.toLong).toSet
      assert(ids == Set(TextOps.OovId, 0L, 1L, 2L, 3L),
        s"got id set $ids")
    }
  }

  test("sim numQueries knob: exactly 3 query groups, ranks intact") {
    withConf(Similarity.NumQueriesConf, "3") {
      val rows = Similarity.queries("llm_sim_topk")(spark, Sf).collect()
      val byQ = rows.groupBy(_.getLong(0))
      assert(byQ.keySet == Set(0L, 1L, 2L))
      byQ.values.foreach { g =>
        assert(g.map(_.getInt(3).toLong).sorted.toSeq ==
          (1L to Similarity.TopK).toSeq)
      }
    }
  }

  test("sim numCentroids knob: IVF trains a 4-list quantizer and still " +
    "returns every query") {
    withConf(Similarity.NumCentroidsConf, "4") {
      val cents = Similarity.kmeansCentroids(
        Tables(spark, Sf, "embeddings").select(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding")
            .cast("array<double>").as("e")),
        iters = 1, k = 4)
      assert(cents.length == 4)
      val got = Similarity.queries("llm_sim_ivf_topk")(spark, Sf)
      assert(got.select("query_id").distinct().count() ==
        Similarity.NumQueries)
    }
  }

  test("graft.materialize=reliable: dedup + graph entries hash-identical " +
    "to the local default") {
    // the 100 TB deployment story is a CONF FLIP: a session with
    // graft.materialize=reliable builds every session-cached artifact
    // (dedup band index, graph edges/kernel, converged ranks) as a
    // reliable checkpoint instead of a localCheckpoint, with identical
    // values. A fresh newSession isolates the flipped caches (the
    // SessionCache key dimension), and the reliable files are released
    // by the ordinary invalidate hooks.
    val ckDir =
      java.nio.file.Files.createTempDirectory("graft-ck-conf").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    val rel = spark.newSession()
    rel.conf.set("graft.materialize", "reliable")
    assert(Materialize.session(rel) eq Materialize.Reliable)
    assert(Materialize.sessionTruncating(rel) eq Materialize.Reliable)
    // disk retains lineage — the iterative family must map it to a
    // truncating cut (the Materialize.Disk plan-doubling note)
    val dsk = spark.newSession()
    dsk.conf.set("graft.materialize", "disk")
    assert(Materialize.session(dsk) eq Materialize.Disk)
    assert(Materialize.sessionTruncating(dsk) eq Materialize.Local)
    try {
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      Seq("llm_dedup_minhash", "graph_pagerank").foreach { name =>
        val base = rows(SparkEntry.queries(name)(spark, Sf))
        val flip = rows(SparkEntry.queries(name)(rel, Sf))
        assert(flip == base, s"$name diverged under reliable")
      }
      // disk end-to-end: Disk persists LAZILY, so these two entries
      // exercise the force-before-release ordering in the triangle
      // kernel and the frequent-basket build (a regression there
      // recomputes instead of corrupting — this pins value identity
      // and that the lazy path still runs at all)
      Seq("graph_triangles", "apriori_freq_itemsets").foreach { name =>
        val base = rows(SparkEntry.queries(name)(spark, Sf))
        val flip = rows(SparkEntry.queries(name)(dsk, Sf))
        assert(flip == base, s"$name diverged under disk")
      }
      // the flip really checkpointed: rdd-* dirs exist under ckDir
      def rddDirs() = Option(new java.io.File(ckDir).listFiles()).toSeq
        .flatten.flatMap(d => Option(d.listFiles()).toSeq.flatten)
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs().nonEmpty,
        "reliable session produced no reliable checkpoints")
    } finally {
      // drop EVERY cache the two entries populated for the flipped
      // sessions before deleting their checkpoint files — a retained
      // entry over a deleted reliable checkpoint fails its next read.
      // (Suites that use .checkpoint() set their own dir first —
      // SparkSpecBase shares one context — so deleting ours is safe.)
      Seq(rel, dsk).foreach { s =>
        operators.Dedup.invalidateIndex(s)
        operators.Graph.invalidateEdges(s)
        operators.Apriori.invalidateSupports(s)
      }
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(ckDir))
    }
  }

  test("shuffle rank-buckets knob: ranks identical at any bucketing") {
    val base = Curation.queries("llm_shuffle_assign")(spark, Sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    withConf(Curation.RankBucketsConf, "7") {
      val got = Curation.queries("llm_shuffle_assign")(spark, Sf)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == base,
        "bucketing is an execution detail — ranks must not move")
    }
  }
}
