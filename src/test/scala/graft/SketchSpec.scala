package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketch, TextOps}

/** Count-Min sketch invariants the oracle cannot see in isolation:
  * one-sided error over EVERY token (the entry only probes the top-k),
  * the fixed cell bound, and the broadcast probe plan.
  */
class SketchSpec extends SparkSpecBase {

  private def corpus = Tables(spark, Sf, "documents")
    .select("doc_id", "text")

  test("CMS estimate is one-sided: >= exact count for EVERY token") {
    val exact = TextOps.wordCountOf(corpus)
    val est = Sketch.cmsEstimate(exact, Sketch.cmsOf(corpus))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    val under = est.filter { case (_, cnt, e) => e < cnt }
    assert(under.isEmpty,
      s"undercounts (impossible for CMS): ${under.take(5).mkString(",")}")
    // and the sketch is not vacuous: at fixture scale most tokens
    // should still be exact (width >> distinct tokens at sf0.001)
    val exactHits = est.count { case (_, cnt, e) => e == cnt }
    assert(exactHits * 2 > est.length,
      s"collisions dominate: $exactHits/${est.length} exact")
  }

  test("sketch table is bounded by depth x width, whatever the corpus") {
    val n = Sketch.cmsOf(corpus).count()
    assert(n <= Sketch.CmsDepth * Sketch.CmsWidth, s"$n cells")
    // every occurrence lands in exactly CmsDepth cells
    val totalIncrements = Sketch.cmsOf(corpus)
      .agg(sum("c")).head().getLong(0)
    val words = corpus
      .select(explode(split(col("text"), " ")).as("w")).count()
    assert(totalIncrements == words * Sketch.CmsDepth)
  }

  test("heavy-hitters entry: exact top-k baseline, overcount >= 0") {
    val rows = Sketch.heavyHitters(spark, Sf).collect()
    assert(rows.length == Sketch.ProbeTopK)
    val exact = TextOps.wordCountOf(corpus).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") == exact(r.getAs[String]("word")), s"cnt drift: $r")
      assert(r.getAs[Long]("overcount") >= 0L, s"negative overcount: $r")
      assert(r.getAs[Long]("cnt_est") == r.getAs[Long]("cnt") + r.getAs[Long]("overcount"))
    }
  }

  test("probe joins the sketch broadcast, never shuffles the corpus") {
    val plan = Sketch.heavyHitters(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sketch probe should broadcast:\n$plan")
  }

  test("quantile sketch: every probed q reported, bounded error") {
    val rows = Sketch.quantileSketch(spark, Sf).collect()
      .map(r => (r.getAs[String]("q"), r.getAs[Double]("exact_v"), r.getAs[Double]("est_v"),
        r.getAs[Double]("abs_err")))
    assert(rows.map(_._1).toSet ==
      Sketch.QSketchQs.map(_.toString).toSet)
    rows.foreach { case (q, exact, est, err) =>
      assert(err == math.abs(est - exact), q)
      // DKW-style sanity at k=512: the estimate's rank error is a few
      // percent, so the VALUE error stays well inside the value range
      val range = rows.map(_._2).max - rows.map(_._2).min
      assert(err <= range * 0.25, s"q=$q err=$err vs range $range")
    }
  }

  test("quantile sketch sample is a bounded TakeOrdered, not a sort") {
    val plan = Sketch.quantileSketch(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sample should be per-partition bounded heaps:\n$plan")
  }

  test("hll: every scope estimated within the 512-register error band") {
    val rows = Sketch.distinctHll(spark, Sf).collect()
    assert(rows.map(_.getAs[String]("scope")).contains("ALL"))
    rows.foreach { r =>
      val (scope, err) = (r.getAs[String]("scope"), r.getAs[Double]("rel_err"))
      // 1.04/sqrt(512) ≈ 4.6% std error; 3σ band ≈ 14%
      assert(math.abs(err) < 0.15, s"scope=$scope rel_err=$err")
    }
  }

  test("hll registers merge: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, Sf, "documents")
    val words = docs.select(lit("all").as("scope"),
      explode(split(col("text"), " ")).as("word"),
      (col("doc_id") % 2).as("half"))
    val whole = Sketch.hllRegisters(words.select("scope", "word"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toMap
    val halves = Seq(0, 1).map(h =>
      Sketch.hllRegisters(words.where(col("half") === h)
        .select("scope", "word"))
        .collect().map(r => (r.getLong(1), r.getInt(2))).toMap)
    val merged = (halves(0).keySet ++ halves(1).keySet).map(j =>
      j -> math.max(halves(0).getOrElse(j, 0), halves(1).getOrElse(j, 0)))
      .toMap
    assert(merged === whole)
  }

  test("group quantiles: per-group rank prunes map-side, all probed " +
    "qs per source, error bounded by the value range") {
    val df = Sketch.groupQuantiles(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter should prune per-partition:\n$plan")
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getString(1)).toSet ===
        Sketch.GQQs.map(_.toString).toSet, src)
      val range = rs.map(_.getDouble(2)).max - rs.map(_.getDouble(2)).min
      rs.foreach(r => assert(r.getDouble(4) <= math.max(range, 1.0) * 4,
        s"$src q=${r.getString(1)} err=${r.getDouble(4)}"))
    }
  }

  test("distributed exact-quantile selection == sorted-rank reference " +
    "on adversarial shapes") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    val cases: Seq[(String, Seq[Double])] = Seq(
      "all-equal" -> Seq.fill(100)(7.5),
      "two-values" -> (Seq.fill(97)(1.0) ++ Seq.fill(3)(2.0)),
      "singleton" -> Seq(42.0),
      "skewed" -> (1 to 1000).map(i => math.pow(1.01, i)),
      "negatives" -> Seq(-5.0, -1.0, 0.0, 3.5, 3.5, 3.5, 9.9)
    )
    cases.foreach { case (name, vs) =>
      val df = vs.toDF("v").repartition(4)
      val got = Sketch.exactQuantilesOf(df, qs).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sorted = vs.sorted
      val expect = qs.map(q => q.toString ->
        sorted(math.ceil(q * vs.size).toInt - 1)).toMap
      assert(got === expect, name)
    }
  }

  test("kmv audience overlap: exact regime identity + estimate band") {
    import spark.implicits._
    // sf0.001: 15 users per type < k -> the sketch IS the set; both
    // estimators must return the exact values
    Sketch.audienceKmv(spark, Sf).collect().foreach { r =>
      assert(r.getAs[Double]("union_est") == r.getAs[Long]("union_exact").toDouble,
        s"union_est != union_exact in exact regime: $r")
      assert(r.getAs[Double]("inter_est") == r.getAs[Long]("inter_exact").toDouble,
        s"inter_est != inter_exact in exact regime: $r")
    }
    // synthetic big audiences force the estimate regime: 1200 users in
    // A (even ids < 2400) and B (multiples of 3 < 3600); true
    // inter = multiples of 6 below 2400 = 400, union = 2000
    val members = ((0 until 2400 by 2).map(i => ("a", i.toLong)) ++
      (0 until 3600 by 3).map(i => ("b", i.toLong)))
      .toDF("t", "user_id")
    val r = Sketch.audienceKmvOf(members).head()
    assert(r.getLong(2) == 1200 && r.getLong(3) == 1200)
    assert(r.getLong(4) == 400 && r.getLong(5) == 2000)
    val (ue, ie) = (r.getDouble(6), r.getDouble(7))
    assert(math.abs(ue - 2000) / 2000 < 0.4, s"union_est=$ue")
    // intersection noise: c ~ Binomial(k, rho) with rho = 400/2000, so
    // sigma(c)/E[c] = sqrt((1-rho)/(k*rho)) ~ 25% -> a 3-sigma band is
    // ~75%; the md5 draw is deterministic (measured 0.69 high), the
    // band just documents the k=64 error theory instead of the draw
    assert(ie > 0 && math.abs(ie - 400) / 400 < 0.8, s"inter_est=$ie")
  }

  test("hll register table is bounded at m rows per scope") {
    val docs = graft.Tables(spark, Sf, "documents")
    val words = docs.select(col("source").as("scope"),
      explode(split(col("text"), " ")).as("word"))
    val over = Sketch.hllRegisters(words).groupBy("scope").count()
      .where(col("count") > Sketch.HllM).count()
    assert(over === 0L)
  }

  test("subsample CI replays the md5 coin; replicas bracket the truth") {
    def coin(b: Long, id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ci:$b:$id".getBytes("UTF-8"))
        .take(4).map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) / 4294967296.0 < 0.5
    }
    val vs = Tables(spark, Sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = ((-1L, vs.map(_._2)) +:
      (0L until Sketch.CiReplicas.toLong).map(b =>
        b -> vs.filter(d => coin(b, d._1)).map(_._2)))
      .map { case (b, xs) =>
        b -> ((xs.length.toLong, xs.sum.toDouble / xs.length.toDouble))
      }.toMap
    val got = Sketch.subsampleCi(spark, Sf).collect()
      .map(r => r.getAs[Long]("replica") -> ((r.getAs[Long]("n"), r.getAs[Double]("mean_len")))).toMap
    assert(got == expect)
    // the replicas genuinely vary AND center near the full-corpus mean
    val reps = got.filter(_._1 >= 0).values.map(_._2).toSeq
    val full = got(-1L)._2
    assert(reps.distinct.size > 1)
    assert(math.abs(reps.sum / reps.size - full) < full * 0.05)
  }

  test("winsorize replays the rank-selected clip in memory") {
    val vs = Tables(spark, Sf, "documents").select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sorted = vs.map(_._2).sorted
    def pick(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)
    val (lo, hi) = (pick(Sketch.WinsLoQ), pick(Sketch.WinsHiQ))
    val expect = vs.groupBy(_._1).map { case (src, rows) =>
      val raw = rows.map(_._2)
      val w = raw.map(v => math.max(lo, math.min(hi, v)))
      src -> ((raw.length.toLong, raw.count(_ < lo).toLong,
        raw.count(_ > hi).toLong, w.min, w.max,
        w.sum.toDouble / w.length.toDouble))
    }
    val got = Sketch.winsorize(spark, Sf).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("n"), r.getAs[Long]("n_lo"),
        r.getAs[Long]("n_hi"), r.getAs[Long]("min_w"), r.getAs[Long]("max_w"), r.getAs[Double]("mean_w"))))
      .toMap
    assert(got == expect)
  }

  test("ks drift: D matches the two-sample statistic, baseline excluded") {
    val vs = Tables(spark, Sf, "documents").select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = vs.groupBy(_._1).map { case (s, r) => s -> r.map(_._2) }
    val base = bySrc.keys.min
    val support = vs.map(_._2).distinct.sorted
    def cdf(xs: Seq[Long])(x: Long): Double =
      xs.count(_ <= x).toDouble / xs.length.toDouble
    val expect = (bySrc - base).map { case (s, xs) =>
      val d = support.map(x =>
        math.abs(cdf(xs)(x) - cdf(bySrc(base))(x))).max
      s -> ((xs.length.toLong, bySrc(base).length.toLong, d))
    }
    val got = Sketch.ksDrift(spark, Sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n0"), r.getAs[Double]("d_stat")))).toMap
    assert(got == expect)
    assert(!got.contains(base))
  }

  test("rollup merge: weekly stats from daily partials equal the " +
    "direct-from-raw aggregation, exactly, and cover every week") {
    val rows = Sketch.rollupMerge(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_direct") == r.getAs[Long]("n_merged"), s"count mismatch: $r")
      // DECIMAL-carried partial sums merge EXACTLY — == on the doubles,
      // not a tolerance (a double-summed partial would break this)
      assert(r.getAs[Double]("sum_direct") == r.getAs[Double]("sum_merged"), s"sum mismatch: $r")
      assert(r.getAs[Double]("min_direct") == r.getAs[Double]("min_merged"), s"min mismatch: $r")
      assert(r.getAs[Double]("max_direct") == r.getAs[Double]("max_merged"), s"max mismatch: $r")
    }
    // the week key partitions the observed day range: no week absent
    val weeks = rows.map(_.getLong(0)).sorted.toSeq
    assert(weeks == (weeks.min to weeks.max).toSeq)
  }

  test("ams f2: sign-counter replay, merge additivity, honest pricing") {
    def sign(j: Int, t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ams:$j:$t".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      1L - 2L * (java.lang.Long.parseLong(hex, 16) % 2L)
    }
    val toks = graft.Tables(spark, Sf, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
    val k = Sketch.AmsEstimators
    val sj = (0 until k).map(j => toks.iterator.map(sign(j, _)).sum)
    val s2 = sj.map(s => BigInt(s) * BigInt(s)).sum
    val f2 = toks.groupBy(identity).values
      .map(g => BigInt(g.size) * BigInt(g.size)).sum
    val r = Sketch.f2Ams(spark, Sf).head()
    assert(r.getAs[Long]("k") == k.toLong)
    assert(r.getAs[Long]("sum_s2") == s2.toLong)
    assert(r.getAs[Long]("f2_exact") == f2.toLong)
    val est = s2.toLong.toDouble / k.toDouble
    assert(r.getAs[Double]("f2_est") == est)
    assert(r.getAs[Double]("rel_err") ==
      math.abs(est - f2.toLong.toDouble) / f2.toLong.toDouble)
    // mergeability: per-estimator counters over a split corpus ADD —
    // the property that lets shards sketch independently
    val (l, rgt) = toks.splitAt(toks.length / 2)
    (0 until k).foreach { j =>
      assert(l.iterator.map(sign(j, _)).sum
        + rgt.iterator.map(sign(j, _)).sum == sj(j))
    }
  }
}
