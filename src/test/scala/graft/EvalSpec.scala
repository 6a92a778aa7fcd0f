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
      .map(r => r.getLong(0).toInt ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // the degraded hypothesis must actually differ: 4-gram precision
    // strictly below unigram precision (deletions break long grams
    // disproportionately), and all matches clipped sanely
    val byN = Eval.evalNgramOverlapOf(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(byN(1L) > byN(4L))
    (1 to Eval.MaxN).foreach { n =>
      val (m, ht, rt) = expect(n)
      assert(m <= math.min(ht, rt))
    }
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
