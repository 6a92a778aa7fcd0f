package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join technique the 100 TB design leans on:
  * two tables bucketed on the join key join WITHOUT shuffling either
  * side, because the bucketed layout already satisfies the required
  * distribution. Local-mode proof of the cluster behavior.
  */
class BucketingSpec extends SparkSpecBase {

  test("hive-partitioned layout prunes partitions at planning time") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-partitioned").toString
    try {
    Tables(spark, Sf, "events")
      .select($"event_id", $"user_id", $"value", $"event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).where($"event_type" === "click")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the predicate must resolve at PLANNING time against directory
    // names (PartitionFilters), never as a row-level filter
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type"), plan)
    // and the files ACTUALLY read are only the matching directory's
    // (inputFiles lists the relation pre-pruning, so ask the executor)
    val read = spark.read.parquet(dir).where($"event_type" === "click")
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(read.nonEmpty && read.forall(_.contains("event_type=click")),
      s"pruned scan still read: ${read.mkString(",")}")

    // correctness of the pruned read vs the unpartitioned source
    val want = Tables(spark, Sf, "events")
      .where($"event_type" === "click")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("selective shuffle join is eligible for runtime bloom-filter pruning") {
    val s = spark; import s.implicits._
    // at 100 TB the probe side of a selective join should be pre-filtered
    // by a runtime bloom filter built from the small side — prove the
    // engine's plain equi-join plans are ELIGIBLE for Spark's injection
    // (thresholds lowered because the fixture scan is far below the
    // production 10 GB application-side default)
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    // control result BEFORE touching any conf, so it runs un-pruned —
    // comparing two identically-configured runs would be vacuous
    val want = Tables(spark, Sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .join(Tables(spark, Sf, "orders")
        .where($"o_orderpriority" === "1-URGENT").select("o_orderkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy("l_orderkey").agg(sum($"l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ord = Tables(spark, Sf, "orders")
        .where($"o_orderpriority" === "1-URGENT")
        .select("o_orderkey")
      val q = Tables(spark, Sf, "lineitem").select("l_orderkey", "l_quantity")
        .join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy("l_orderkey").agg(sum($"l_quantity").as("q"))
      val rows = q.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // the filter is a pre-shuffle prune, not a correctness change:
      // pruned run ≡ the un-pruned control collected above
      assert(rows == want)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

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
