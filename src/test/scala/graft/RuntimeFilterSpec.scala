package graft

import org.apache.spark.sql.functions._

/** Runtime (bloom) filter injection — the 100 TB join-pruning
  * mechanism beside AQE skew splitting ([[SkewSpec]]): when a fact
  * table shuffle-joins a dimension that carries a selective predicate,
  * Spark builds a bloom filter over the dimension's join keys at
  * runtime and pushes a `might_contain` probe into the FACT side, so
  * the shuffle moves only rows that can possibly match. Local-mode
  * demonstration with the size thresholds scaled down to fixture scale
  * — the conf discipline a cluster deployment tunes, pinned here so a
  * regression in our query shapes (a rewrite that hides the selective
  * predicate) shows up as a failed injection.
  */
class RuntimeFilterSpec extends SparkSpecBase {

  test("selective dim predicate injects a bloom probe into the fact side") {
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables(spark, Sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = Tables(spark, Sf, "lineitem")
        .select("l_orderkey", "l_quantity")
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(sum("l_quantity").as("q"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom runtime filter injected:\n$optimized")
      // and the probe must test the FACT side's key (l_orderkey), fed
      // by a bloom built over the filtered dim keys (o_orderkey)
      val probeLine = optimized.split("\n")
        .find(_.contains("might_contain")).getOrElse("")
      assert(probeLine.contains("l_orderkey"),
        s"bloom probe not on the fact key:\n$optimized")
      assert(optimized.contains("bloom_filter_agg(xxhash64(o_orderkey"),
        s"bloom not built from the dim keys:\n$optimized")
      // semantics unchanged by the filter
      val withF = j.collect().head.getDouble(0)
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val withoutF = j.collect().head.getDouble(0)
      assert(withF == withoutF)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
