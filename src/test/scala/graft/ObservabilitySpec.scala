package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Pipeline telemetry via Spark's `observe()` API — the production
  * pattern for gate dashboards at 100 TB: metrics (row counts, gate
  * pass counts, null counts) are computed INSIDE the job that produces
  * the output, as accumulator-style observations on the streamed-through
  * rows — zero extra scans, zero extra actions — instead of the naive
  * `df.count()` + `df.where(...).count()` re-runs that each re-read the
  * corpus. The gate-report ENTRIES stay oracle-checked aggregations
  * (they are the contract); this spec pins that the same numbers are
  * extractable as observations from a single producing pass.
  */
class ObservabilitySpec extends SparkSpecBase {

  test("observe() yields gate metrics from the one producing pass") {
    val obs = Observation("curate-metrics")
    val scored = TextOps.qualityScore(spark, Sf)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(when(col("quality_pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(col("n_tokens")).as("n_tokens"))
    // ONE action: write-shaped consumption of the gated output
    val kept = scored.where(col("quality_pass")).collect()
    val m = obs.get
    // the observation saw every pre-filter row of the single pass
    val total = TextOps.qualityScore(spark, Sf).count()
    assert(m("n_docs") == total)
    assert(m("n_pass") == kept.length.toLong)
    val tok = TextOps.qualityScore(spark, Sf)
      .agg(sum(col("n_tokens")).as("tok")).collect().head
      .getAs[Long]("tok")
    assert(m("n_tokens") == tok)
  }
}
