package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a shuffle join with one hot key gets its skewed
  * partition split at runtime (the `skew=true` marker in the final
  * adaptive plan) — the mechanism that keeps 100 TB joins from stalling
  * on a straggler task, demonstrated in local mode with thresholds
  * scaled down to fixture size.
  */
class SkewSpec extends SparkSpecBase {

  test("AQE splits the hot-key partition of a skewed shuffle join") {
    val s = spark; import s.implicits._
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4KB")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows on one hot key + a thin tail; incompressible payload
      // so the compressed map-output sizes actually show the skew.
      val left = spark.range(0, 100000)
        .select(when($"id" % 100 === 0, $"id" % 50).otherwise(0L).as("k"),
          md5(concat(lit("payload-"), $"id")).as("pad"))
      val right = spark.range(0, 50).select($"id".as("k"),
        concat(lit("dim-"), $"id").as("name"))
      val joined = left.join(right, "k").select("name", "pad")
      val n = joined.count()
      joined.collect()
      assert(n == 100000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
