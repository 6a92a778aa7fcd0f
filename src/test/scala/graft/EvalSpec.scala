package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

class EvalSpec extends SparkSpecBase {

  /** Scala replay of the clipped-count definition on raw token arrays. */
  private def brute(pairs: Seq[(Array[String], Array[String])])
      : Map[Int, (Long, Long, Long)] =
    (1 to Eval.MaxN).map { n =>
      var m = 0L; var ht = 0L; var rt = 0L
      pairs.foreach { case (h, r) =>
        def grams(t: Array[String]) =
          t.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
        val hg = grams(h).groupBy(identity).map { case (k, v) => k -> v.size }
        val rg = grams(r).groupBy(identity).map { case (k, v) => k -> v.size }
        m += hg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0)) }.sum
        ht += math.max(0, h.length - n + 1)
        rt += math.max(0, r.length - n + 1)
      }
      n -> ((m, ht, rt))
    }.toMap

  test("evalNgramOverlap matches the brute-force clipped counts") {
    val texts = Tables(spark, Sf, "documents")
      .select("doc_id", "text").limit(50).collect()
      .map(r => r.getString(1))
    val pairs = texts.map { t =>
      val r = t.split(" ", -1)
      val h = r.zipWithIndex
        .filter { case (_, i) => (i + 1) % Eval.DropEvery != 0 }
        .map(_._1)
      (h, r)
    }.toSeq
    val expect = brute(pairs)
    val s = spark; import s.implicits._
    val df = pairs.zipWithIndex
      .map { case ((h, r), i) => (i.toLong, h, r) }
      .toDF("doc_id", "h", "r")
    val got = Eval.evalNgramOverlapOf(df).collect()
      .map(r => r.getAs[Long]("n").toInt ->
        ((r.getAs[Long]("n_match"), r.getAs[Long]("hyp_total"), r.getAs[Long]("ref_total")))).toMap
    assert(got == expect)
    // the degraded hypothesis must actually differ: 4-gram precision
    // strictly below unigram precision (deletions break long grams
    // disproportionately), and all matches clipped sanely
    val byN = Eval.evalNgramOverlapOf(df).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Double]("prec")).toMap
    assert(byN(1L) > byN(4L))
    (1 to Eval.MaxN).foreach { n =>
      val (m, ht, rt) = expect(n)
      assert(m <= math.min(ht, rt))
    }
  }

  test("evalEditDistance replays capped Levenshtein bucketing exactly") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = Tables(spark, Sf, "documents")
      .select("text").limit(40).collect().map(_.getString(0))
    val s = spark; import s.implicits._
    val pairs = texts.zipWithIndex.map { case (t, i) =>
      val r = t.split(" ", -1)
      val h = r.zipWithIndex
        .filter { case (_, k) => (k + 1) % Eval.DropEvery != 0 }.map(_._1)
      (i.toLong, h, r)
    }.toSeq
    val want = pairs.map { case (_, h, r) =>
      val hs = h.mkString(" ").take(Eval.EditCap)
      val rs = r.mkString(" ").take(Eval.EditCap)
      val l = lev(hs, rs)
      val mx = math.max(hs.length, rs.length)
      val norm = if (mx == 0) 0.0 else l.toDouble / mx
      val bucket = math.min(Eval.EditBuckets - 1L,
        math.floor(norm * Eval.EditBuckets).toLong)
      (bucket, l.toLong)
    }.groupBy(_._1).map { case (b, xs) =>
      (b, xs.size.toLong, xs.map(_._2).sum) }.toSet
    val got = Eval.evalEditDistanceOf(pairs.toDF("doc_id", "h", "r"))
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"), r.getAs[Long]("sum_lev")))
      .toSet
    assert(got == want)
    // deletions must register: not everything lands in bucket 0
    assert(got.exists { case (b, _, _) => b > 0 })
  }

  test("pair seam accepts an arbitrary (hyp, ref) table, ties exact") {
    val s = spark; import s.implicits._
    // identical pair → every precision/recall exactly 1.0; disjoint
    // pair → exactly 0.0 (clipping floor)
    val df = Seq(
      (0L, Array("a", "b", "a", "b"), Array("a", "b", "a", "b")),
      (1L, Array("x", "y"), Array("p", "q")))
      .toDF("doc_id", "h", "r")
    val rows = Eval.evalNgramOverlapOf(df)
      .orderBy("n").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // n=1: matches = 4 (doc0) + 0 (doc1); totals = 6 each side
    assert(rows(0).getLong(1) == 4L)
    assert(rows(0).getLong(2) == 6L && rows(0).getLong(3) == 6L)
    // n=4: only doc0 has a 4-gram, and it matches itself
    assert(rows(3).getLong(1) == 1L)
    assert(rows(3).getDouble(4) == 1.0 && rows(3).getDouble(5) == 1.0)
  }
}
