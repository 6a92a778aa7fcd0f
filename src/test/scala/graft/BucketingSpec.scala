package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join technique the 100 TB design leans on:
  * two tables bucketed on the join key join WITHOUT shuffling either
  * side, because the bucketed layout already satisfies the required
  * distribution. Local-mode proof of the cluster behavior.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of co-bucketed tables shuffles neither side") {
    val s = spark; import s.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Tables(spark, Sf, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables(spark, Sf, "orders").select("o_orderkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed layout satisfies the join AND the same-key aggregation:
      // zero shuffle stages in the executed plan
      assert(!plan.contains("ShuffleQueryStage")
        && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffled:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
