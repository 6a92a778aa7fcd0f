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
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), s"cnt drift: $r")
      assert(r.getLong(3) >= 0L, s"negative overcount: $r")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3))
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
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
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
}
