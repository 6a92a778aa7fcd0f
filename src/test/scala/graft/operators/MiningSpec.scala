package graft.operators

import graft.{SparkSpecBase, Tables}
import org.apache.spark.sql.functions.col

/** Embedding-space mining ops: semantic decontamination and margin
  * bitext mining, both checked against sequential Scala brute force
  * with BITWISE double equality (the kernels and fold orders are pinned
  * to match the DuckDB oracle — any drift shows up here first).
  */
class MiningSpec extends SparkSpecBase {

  private def emb(): Map[Long, Array[Double]] =
    Tables(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  test("semantic decontamination: copies flag at cos≈1, reversals don't") {
    val got = Contamination.contamSemantic(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == Contamination.SemEvalN)
    val e = emb()
    got.foreach { case (evalId, (topId, maxCos, flag)) =>
      val src = evalId * Contamination.SemCopyStride
      if (evalId % 2 == 0) {
        // verbatim copy: argmax is the copied train vector, flagged
        assert(topId == src, s"eval $evalId")
        assert(maxCos > 0.999 && flag, s"eval $evalId cos=$maxCos")
      } else {
        // reversed vector: decorrelated — lands in the natural pair
        // range, never at the threshold
        assert(!flag && maxCos < Contamination.SemThreshold,
          s"eval $evalId cos=$maxCos")
        // and the argmax is the true sequential-kernel argmax
        val q = e(src).reverse
        val want = e.toSeq.map { case (id, v) =>
          (id, Hashing.cosineSeq(q, v)) }
          .minBy { case (id, c) => (-c, id) }
        assert((topId, maxCos) == want, s"eval $evalId")
      }
    }
  }

  test("bitext margins equal the sequential brute-force, bitwise") {
    val e = emb()
    val langs = Tables(spark, Sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val de = e.keys.filter(langs(_) == Bitext.SrcLang).toSeq.sorted
    val en = e.keys.filter(langs(_) == Bitext.TgtLang).toSeq.sorted
    val q = de.take(Bitext.BitextQ)
    def topk(pid: Long, pe: Array[Double], side: Seq[Long]) =
      side.map(id => (id, Hashing.cosineSeq(pe, e(id))))
        .sortBy { case (id, c) => (-c, id) }.take(Bitext.BitextK)
    def mean(cs: Seq[Double]) = cs.foldLeft(0.0)(_ + _) / cs.size
    val fwd = q.map(s => s -> topk(s, e(s), en)).toMap
    val mx = fwd.map { case (s, t) => s -> mean(t.map(_._2)) }
    val ys = fwd.values.flatMap(_.map(_._1)).toSet
    val my = ys.map(y => y -> mean(topk(y, e(y), de).map(_._2))).toMap
    val want = fwd.flatMap { case (s, cands) =>
      cands.map { case (t, c) =>
        (s, t) -> (c / ((mx(s) + my(t)) / 2.0)) }
    }
    val byName = Bitext.bitextMine(spark, Sf)
      .select("src_id", "tgt_id", "margin", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(byName.size == want.size)
    want.foreach { case (k, m) =>
      assert(byName(k)._1 == m, s"margin mismatch at $k") }
    // ranks: 1..k per src in margin-desc order
    byName.groupBy(_._1._1).values.foreach { g =>
      assert(g.values.map(_._2).toSeq.sorted ==
        (1L to g.size).toSeq)
    }
  }

  test("bitext/semantic plans: no cartesian, rank windows prune map-side") {
    Seq(Bitext.bitextMine(spark, Sf),
        Contamination.contamSemantic(spark, Sf)).foreach { df =>
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p)
    }
  }
}
