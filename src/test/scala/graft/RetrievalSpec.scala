package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, TextOps}

/** Retrieval-family invariants beyond the oracle diff: posting heads
  * agree with the independent word-count path, BM25 behaves like BM25
  * (tf monotone, saturating, length-penalized), and the probe side of
  * the ranking plan broadcasts.
  */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Tables(spark, Sf, "documents")
    .select("doc_id", "text")

  test("postings: cf sums to the word-count table, df <= cf") {
    val posts = Retrieval.postings(spark, Sf).collect()
      .map(r => r.getAs[String]("word") -> (r.getAs[Long]("df"), r.getAs[Long]("cf"))).toMap
    val wc = TextOps.wordCountOf(corpus).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    assert(posts.keySet == wc.keySet, "every term has one posting head")
    posts.foreach { case (w, (df, cf)) =>
      assert(cf == wc(w), s"cf($w) drift: $cf vs ${wc(w)}")
      assert(df >= 1 && df <= cf, s"df($w)=$df out of [1, cf=$cf]")
    }
  }

  test("postings: top posting really is that term's max-tf document") {
    val tf = Retrieval.tfOf(corpus)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val best = tf.groupBy(_._1).map { case (w, rows) =>
      w -> rows.map { case (_, d, t) => (-t, d) }.min
    }
    Retrieval.postings(spark, Sf).collect().foreach { r =>
      val (negTf, docId) = best(r.getAs[String]("word"))
      assert(r.getAs[Long]("top_tf") == -negTf && r.getAs[Long]("top_doc_id") == docId,
        s"posting head mismatch for ${r.getAs[String]("word")}")
    }
  }

  test("bm25: exactly the rank-window query terms, k docs each, dense rk") {
    val rows = Retrieval.bm25TopK(spark, Sf).collect()
    val terms = rows.map(_.getAs[String]("word")).distinct
    assert(terms.length == Retrieval.BmQueryN.toInt, terms.mkString(","))
    terms.foreach { t =>
      val rks = rows.filter(_.getAs[String]("word") == t)
        .map(_.getAs[Long]("rk")).sorted
      assert(rks.toSeq == (1L to Retrieval.BmTopK.toLong).toSeq,
        s"$t ranks: ${rks.mkString(",")}")
    }
  }

  test("bm25 score: tf-monotone and saturating on a controlled corpus") {
    // equal-length docs differing only in tf of the probed word; the
    // window constants make 'target' the rank-5 term by corpus count
    val filler = Seq("f1", "f2", "f3", "f4")
    val docs = (1 to 8).map { i =>
      val pad = (1 to (10 - i)).map(j => filler((i + j) % 4))
      (i.toLong,
        (Seq.fill(i)("target") ++ pad ++
          filler.flatMap(f => Seq.fill(12)(f))).mkString(" "))
    }.toDF("doc_id", "text")
    val scored = Retrieval.bm25TopKOf(docs)
      .where(col("word") === "target")
      .orderBy(col("rk")).collect()
      .map(r => (r.getAs[Long]("tf"), r.getAs[Double]("score")))
    assert(scored.nonEmpty, "'target' must be a probed query term")
    // ranks follow tf (equal dl): strictly increasing tf down the list
    assert(scored.sliding(2).forall {
      case Array((tf1, s1), (tf2, s2)) => tf1 > tf2 && s1 > s2
      case _ => true
    }, s"tf/score not monotone: ${scored.mkString(",")}")
    // saturation: the score step from the top pair is smaller than the
    // step at the bottom pair (diminishing returns in tf)
    if (scored.length >= 3) {
      val top = scored(0)._2 - scored(1)._2
      val bottom = scored(scored.length - 2)._2 - scored.last._2
      assert(top < bottom, s"no saturation: top=$top bottom=$bottom")
    }
  }

  test("bm25: longer doc scores below shorter at equal tf") {
    // p1..p4 outrank 'target' by corpus count, pushing it to exactly
    // vocabulary rank 5 — the low edge of the probe window
    val docs = Seq(
      (1L, (Seq.fill(3)("target") ++ Seq.fill(7)("p1")).mkString(" ")),
      (2L, (Seq.fill(3)("target") ++ Seq.fill(47)("p1")).mkString(" ")),
      (3L, Seq("p1", "p2", "p3", "p4")
        .flatMap(p => Seq.fill(10)(p)).mkString(" ")))
      .toDF("doc_id", "text")
    val scored = Retrieval.bm25TopKOf(docs)
      .where(col("word") === "target").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scored.contains(1L) && scored.contains(2L),
      s"'target' should be probed: $scored")
    assert(scored(1L) > scored(2L),
      s"length normalization inverted: $scored")
  }

  test("ql: Dirichlet ranking is tf-monotone and length-normalized") {
    // equal-length docs: higher tf must score higher; equal-tf docs:
    // the shorter one must score higher (its posterior concentrates)
    val filler = Seq("f1", "f2", "f3", "f4")
    val docs = Seq(
      (1L, (Seq.fill(3)("target") ++ Seq.fill(7)("pad")).mkString(" ")),
      (2L, (Seq.fill(5)("target") ++ Seq.fill(5)("pad")).mkString(" ")),
      (3L, (Seq.fill(3)("target") ++ Seq.fill(27)("pad")).mkString(" ")),
      (4L, filler.flatMap(f => Seq.fill(12)(f)).mkString(" ")))
      .toDF("doc_id", "text")
    val scored = Retrieval.qlTopKOf(docs)
      .where(col("word") === "target").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(scored.keySet == Set(1L, 2L, 3L),
      s"'target' should be probed with its 3 postings: $scored")
    assert(scored(2L) > scored(1L), s"tf monotonicity: $scored")
    assert(scored(1L) > scored(3L), s"length normalization: $scored")
  }

  test("rrf: fused scores replay from the two rank lists, dense ranks") {
    val rows = Retrieval.hybridRrf(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bm = if (r.isNullAt(2)) None else Some(r.getAs[Long]("bm_rk"))
      val ql = if (r.isNullAt(3)) None else Some(r.getAs[Long]("ql_rk"))
      val expect =
        bm.map(k => 1.0 / (Retrieval.RrfK + k).toDouble).getOrElse(0.0) +
        ql.map(k => 1.0 / (Retrieval.RrfK + k).toDouble).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect,
        s"rrf mismatch for (${r.getAs[String]("word")}, ${r.getAs[Long]("doc_id")})")
      assert(bm.forall(k => k >= 1 && k <= Retrieval.FuseDepth))
      assert(ql.forall(k => k >= 1 && k <= Retrieval.FuseDepth))
      assert(bm.nonEmpty || ql.nonEmpty, "a fused doc came from somewhere")
    }
    rows.groupBy(_.getString(0)).foreach { case (w, rs) =>
      val rks = rs.map(_.getLong(5)).sorted
      assert(rks.toSeq == (1L to rks.length.toLong).toSeq, s"$w ranks")
    }
  }

  test("expansion: replays the in-memory PRF pool, no stopwords") {
    // independent replay: feedback docs from the public bm25TopK, tf
    // and the vocabulary ranking recomputed in memory
    val tf = Retrieval.tfOf(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val vocab = tf.groupBy(_._2).map { case (w, rows) =>
      w -> (rows.length.toLong, rows.map(_._3).sum)
    }
    val vrk = vocab.toSeq.sortBy { case (w, (_, cf)) => (-cf, w) }
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val fb = Retrieval.bm25TopK(spark, Sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("doc_id")))
    val expect = fb.groupBy(_._1).flatMap { case (qw, docs) =>
      val ds = docs.map(_._2).toSet
      tf.filter { case (d, w, _) =>
          ds(d) && w != qw && vrk(w) >= Retrieval.BmRankLo }
        .groupBy(_._2)
        .map { case (w, rows) => (w, rows.map(_._3).sum) }
        .toSeq.sortBy { case (w, s) => (-s, w) }
        .take(Retrieval.PrfTerms)
        .zipWithIndex
        .map { case ((w, s), i) =>
          (qw, w) -> ((s, vocab(w)._1, (i + 1).toLong)) }
    }
    val got = Retrieval.queryExpansion(spark, Sf).collect()
      .map(r => (r.getAs[String]("qword"), r.getAs[String]("exp_word")) ->
        ((r.getAs[Long]("sum_tf"), r.getAs[Long]("df"), r.getAs[Long]("rk")))).toMap
    assert(got == expect, s"PRF replay mismatch:\n$got\nvs\n$expect")
  }

  test("phrase postings: adjacency replay incl. overlapping repeats") {
    val s = spark; import s.implicits._
    // controlled corpus: overlapping self-phrase "x x x" has tf 2, and
    // the (a b) phrase dominates by count across docs
    val docsC = Seq(
      (0L, "a b a b c"), (1L, "a b c a b"), (2L, "x x x a b"),
      (3L, "c c a b"), (4L, "b a b a"))
      .toDF("doc_id", "text")
    val rows = Retrieval.phrasePostingsOf(docsC).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("phrase_tf"), r.getAs[Long]("rk")))
    // brute force over the same corpus
    val texts = Seq((0L, "a b a b c"), (1L, "a b c a b"),
      (2L, "x x x a b"), (3L, "c c a b"), (4L, "b a b a"))
    val allBi = texts.flatMap { case (d, t) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (d, p(0), p(1))).toSeq
    }
    val top = allBi.groupBy { case (_, a, b) => (a, b) }
      .map { case (k, xs) => k -> xs.size.toLong }
      .toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      .take(Retrieval.PhraseCount).map(_._1)
    val expect = top.flatMap { case (a, b) =>
      allBi.filter(x => x._2 == a && x._3 == b)
        .groupBy(_._1).map { case (d, xs) => (a, b, d, xs.size.toLong) }
        .toSeq.sortBy { case (_, _, d, tf) => (-tf, d) }
        .take(Retrieval.PhraseTopK).zipWithIndex
        .map { case ((w1, w2, d, tf), i) => (w1, w2, d, tf, (i + 1).toLong) }
    }.toSet
    assert(rows.toSet == expect)
    // the overlapping repeat counts both occurrences
    assert(allBi.count(x => x._2 == "x" && x._3 == "x") == 2)
    // plan: the rank cut prunes map-side (WindowGroupLimit), and the
    // bounded phrase list broadcasts into the postings filter
    val plan = Retrieval.phrasePostings(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("proximity: brute replay; dominates phrase match at W = 1") {
    val s = spark; import s.implicits._
    val texts = Seq(
      (0L, "a b a b c"), (1L, "a c c b a b"), (2L, "x x x a b"),
      (3L, "c c a q q b"), (4L, "b a b a"))
    val docsC = texts.toDF("doc_id", "text")
    val allBi = texts.flatMap { case (d, t) =>
      t.split(" ").sliding(2).filter(_.length == 2)
        .map(p => (d, p(0), p(1))).toSeq }
    val top = allBi.groupBy { case (_, a, b) => (a, b) }
      .map { case (k, xs) => k -> xs.size.toLong }
      .toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      .take(Retrieval.PhraseCount).map(_._1)
    val expect = top.flatMap { case (a, b) =>
      texts.flatMap { case (d, t) =>
        val w = t.split(" ")
        val n = (for {
          i <- w.indices if w(i) == a
          j <- (i + 1) to math.min(i + Retrieval.ProxWindow, w.length - 1)
          if w(j) == b
        } yield 1).size.toLong
        if (n > 0) Some((a, b, d, n)) else None
      }.sortBy { case (_, _, d, n) => (-n, d) }
        .take(Retrieval.PhraseTopK).zipWithIndex
        .map { case ((w1, w2, d, n), i) => (w1, w2, d, n, (i + 1).toLong) }
    }.toSet
    val got = Retrieval.proximityTopKOf(docsC).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("prox_tf"), r.getAs[Long]("rk"))).toSet
    assert(got == expect)
    // dominance: every phrase (W = 1) hit count is ≤ the proximity count
    val phrase = Retrieval.phrasePostingsOf(docsC).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("doc_id")),
        r.getAs[Long]("phrase_tf"))).toMap
    val prox = Retrieval.proximityTopKOf(docsC).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("doc_id")),
        r.getAs[Long]("prox_tf"))).toMap
    phrase.foreach { case (k, tf) =>
      prox.get(k).foreach(p => assert(p >= tf, s"$k: $p < $tf"))
    }
  }

  test("plan: query terms and corpus stats ride broadcast joins") {
    val plan = Retrieval.bm25TopK(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("BroadcastNestedLoopJoin"),
      s"bounded sides should broadcast:\n$plan")
  }

  test("eval scorecard: metric identities and [0,1] bounds hold") {
    val rows = Retrieval.evalRetrievalOf(corpus).collect()
    assert(rows.length == Retrieval.BmQueryN, "one row per query term")
    rows.foreach { r =>
      val (nRel, dcg, idcg) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val (ndcg, mrr) = (r.getDouble(4), r.getDouble(5))
      val (p, rec) = (r.getDouble(6), r.getDouble(7))
      assert(idcg > 0.0 && dcg > 0.0, "query terms always retrieve")
      assert(dcg <= idcg + 1e-12, s"dcg $dcg exceeds ideal $idcg")
      assert(ndcg == dcg / idcg, "ndcg is exactly the ratio")
      assert(ndcg > 0.0 && ndcg <= 1.0)
      assert(mrr >= 0.0 && mrr <= 1.0)
      // mrr is 0 or exactly 1/rank for an integer rank within the cut
      assert(mrr == 0.0 ||
        (1 to Retrieval.EvalK).exists(k => mrr == 1.0 / k))
      assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
      assert(nRel >= 0L)
    }
  }

  test("eval scorecard: perfect run scores ndcg = mrr = precision = 1") {
    val s = spark; import s.implicits._
    // corpus where one mid-frequency term's BM25 ranking IS the ideal
    // ranking: identical doc lengths, graded tf 3,2,1 on the probed
    // term. With <= EvalK relevant docs, recall must also be 1.
    // Build 12 docs so vocabulary ranks place "qq" in the 5..9 band.
    val fill = (0 until 12).map(i => s"f$i " * 12).mkString(" ")
    // ensure high-frequency filler terms occupy ranks outside the band
    val docs = Seq(
      (0L, "qq qq qq pad pad pad pad pad pad"),
      (1L, "qq qq aa pad pad pad pad pad pad"),
      (2L, "qq aa aa pad pad pad pad pad pad")) ++
      (3L until 15L).map(i => (i, s"w$i w$i w$i w$i w$i w$i w$i w$i w$i"))
    val df = docs.toDF("doc_id", "text")
    val out = Retrieval.evalRetrievalOf(df).collect()
      .map(r => r.getAs[String]("word") -> r).toMap
    out.get("qq").foreach { r =>
      assert(r.getDouble(4) == 1.0, s"ndcg ${r.getDouble(4)}")
      assert(r.getDouble(5) == 1.0, "first hit at rank 1")
      assert(r.getDouble(7) == 1.0, "all relevant docs inside the cut")
    }
  }

  test("wand audit: skipped blocks never contain a top-k document") {
    val rows = Retrieval.wandAuditOf(corpus).collect()
    assert(rows.length == Retrieval.BmQueryN)
    rows.foreach { r =>
      val (n, nb) = (r.getLong(1), r.getLong(2))
      val (sb, sp, frac) = (r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(sb >= 0 && sb < nb, "cannot skip every block: top-k lives somewhere")
      assert(sp >= 0 && sp <= n && frac == sp.toDouble / n.toDouble)
      // a skipped block holds at most CompressBlock postings each
      assert(sp <= sb * Retrieval.CompressBlock)
    }
    // replay: per term, every rank-<=k posting sits in an unskipped
    // block, so total skip counts reconstruct from the rank table
    val bm = Retrieval.bm25TopKOf(corpus).collect()
      .map(r => (r.getAs[String]("word"),
        r.getAs[Long]("doc_id") / Retrieval.CompressBlock)).toSet
    // (word, blk) pairs of top-k docs must all be in unskipped blocks:
    // if any were skippable its blk_max >= its own score >= theta -
    // contradiction. Just assert the audit found them un-skipped by
    // bounding: n_skip_postings <= n_postings - BmTopK
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1) - Retrieval.BmTopK) }
    assert(bm.nonEmpty)
  }

  test("ranker bake-off: bm25 rows equal the single-system scorecard") {
    val single = Retrieval.evalRetrievalOf(corpus).collect()
      .map(r => r.getAs[String]("word") -> r.toSeq.drop(1)).toMap
    val multi = Retrieval.evalRankersOf(corpus).collect()
    assert(multi.length == 3 * Retrieval.BmQueryN)
    val bySys = multi.groupBy(_.getString(0))
    assert(bySys.keySet == Set("bm25", "ql", "rrf"))
    bySys("bm25").foreach { r =>
      assert(r.toSeq.drop(2) == single(r.getString(1)),
        s"bm25 card drifted for ${r.getString(1)}")
    }
    // every system's metrics stay in range
    multi.foreach { r =>
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, "ndcg")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0, "mrr")
    }
  }
}
