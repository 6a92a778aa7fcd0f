package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Physical-layout operators ([[graft.operators.Layout]]): Morton-code
  * zone-map skipping and the bin-bucketed range join.
  */
class LayoutSpec extends SparkSpecBase {

  test("morton interleave is a bijection on the 256×256 grid") {
    // Reuse the production column through the public query on a synthetic
    // check: every (px, py) pair must map to a distinct 16-bit code.
    // Rebuilt here from the same formula the operator uses — if the two
    // ever drift, the oracle hash gate catches the operator side.
    val grid = spark.range(0, 65536).selectExpr(
      "id div 256 as px", "id % 256 as py")
    val morton = (0 until 8).map { i =>
      shiftleft(shiftright(col("px"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(col("py"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    val row = grid.select(morton.as("m"))
      .agg(countDistinct("m").as("n"), min("m").as("lo"), max("m").as("hi"))
      .head()
    assert(row.getLong(0) == 65536L && row.getLong(1) == 0L &&
      row.getLong(2) == 65535L)
  }

  test("zorder audit: matches are layout-invariant, z-order prunes BOTH " +
    "dimensions, single-key sort prunes only its own") {
    val rows = Layout.zorderSkipping(spark, Sf)
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    assert(rows.keySet == Set("natural", "partsort", "zorder"))
    def l(n: String, f: String) =
      rows(n).getLong(rows(n).fieldIndex(f))
    // rows_match is a pure predicate count — identical whatever the layout
    for (p <- Seq("rows_match_p1", "rows_match_p2"))
      assert(Set("natural", "partsort", "zorder").map(l(_, p)).size == 1)
    // files_total varies per layout (each layout occupies however many
    // of its 256 possible buckets the key distribution reaches — at tiny
    // sf the 10-value suppkey leaves z-order prefixes empty), so every
    // pruning claim is relative to the layout's OWN file count.
    def total(n: String) = l(n, "files_total")
    // natural layout: keys are uncorrelated with insertion order → next
    // to no pruning (a sparse file can dodge a predicate by luck at tiny
    // sf, so ≥ 95% rather than == 100%)
    assert(l("natural", "files_scanned_p1") * 20 >= total("natural") * 19)
    assert(l("natural", "files_scanned_p2") * 20 >= total("natural") * 19)
    // single-key sort: perfect on its own dimension, useless on the other
    assert(l("partsort", "files_scanned_p1") < total("partsort") / 4)
    assert(l("partsort", "files_scanned_p2") == total("partsort"))
    // z-order: real pruning on BOTH dimensions — the whole point
    assert(l("zorder", "files_scanned_p1") < total("zorder") / 4)
    assert(l("zorder", "files_scanned_p2") < total("zorder") / 4)
    // scanned-rows never undercount the true matches (zone maps are
    // conservative)
    assert(l("zorder", "rows_scanned_p1") >= l("zorder", "rows_match_p1"))
    assert(l("zorder", "rows_scanned_p2") >= l("zorder", "rows_match_p2"))
  }

  test("binned range join equals the naive inequality join") {
    val binned = Layout.rangeJoinBinned(spark, Sf)
    // Naive reference: the direct non-equi join Catalyst can only run as
    // a nested loop — exactly the DuckDB oracle's formulation.
    val bands = spark.range(0, 1961).toDF("k").select(col("k"),
      (col("k").cast("double") / 4.0 +
        (col("k") % 7).cast("double") / 64.0).as("lo"),
      ((col("k") + 1).cast("double") / 4.0 +
        ((col("k") + 1) % 7).cast("double") / 64.0).as("hi"))
    val naive = Tables(spark, Sf, "events").select("value")
      .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("k", "lo")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(24,6)")).cast("double")
          .as("sum_value"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("binned range join plans as an equi-join: no nested loop, no " +
    "cartesian; every event matches exactly one band") {
    val plan = Layout.rangeJoinBinned(spark, Sf)
      .queryExecution.sparkPlan
    assert(plan.collect {
      case b: BroadcastNestedLoopJoinExec => b
      case c: CartesianProductExec => c
    }.isEmpty, s"non-equi join shape survived binning:\n$plan")
    // Bands partition [0, 490.25) and every fixture value falls inside →
    // the join is total: per-band counts sum to the full event count.
    val matched = Layout.rangeJoinBinned(spark, Sf)
      .agg(sum("n_events").as("m")).head().getAs[Long]("m")
    assert(matched == Tables(spark, Sf, "events").count())
  }
}
