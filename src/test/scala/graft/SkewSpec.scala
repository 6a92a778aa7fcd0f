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

  // (user_id, event_id, ts_nanos, event_type); all ts are whole micros
  private def pairsOf(evts: Seq[(Long, Long, Long, String)])
      : Map[(String, String), Long] =
    (for {
      a <- evts; b <- evts
      if a._1 == b._1 && b._3 > a._3 &&
        (b._3 - a._3) / 1000 <= graft.streaming.Streams.PairWindowUs
    } yield (a._4, b._4))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def run(evts: Seq[(Long, Long, Long, String)],
                  maxBurst: Int): Map[(String, String), Long] = {
    val s = spark; import s.implicits._
    graft.streaming.Streams
      .eventPairs(evts.toDF("user_id", "event_id", "ts", "event_type"),
        maxBurst)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("eventPairs bucketed join matches brute force across bucket bounds") {
    val wUs = graft.streaming.Streams.PairWindowUs
    def at(us: Long) = us * 1000 // micros → parquet-style nanos
    // straddle bucket edges incl. a gap of exactly the window width
    val evts = Seq[(Long, Long, Long, String)](
      (1L, 1L, at(10), "view"), (1L, 2L, at(wUs - 10), "click"),
      (1L, 3L, at(wUs + 10), "buy"), (1L, 4L, at(2 * wUs + 10), "view"),
      (1L, 5L, at(2 * wUs + 20), "buy"),
      (2L, 6L, at(5), "view"), (2L, 7L, at(3 * wUs), "buy"))
    val want = pairsOf(evts)
    assert(run(evts, Int.MaxValue) == want)
    assert(want.contains(("click", "buy"))) // a cross-bucket pair exists
    assert(want.contains(("view", "buy")))  // incl. the exactly-W pair
  }

  test("eventPairs burst cap bounds a planted bot user's pair expansion") {
    def at(us: Long) = us * 1000
    val bot = (0 until 50).map(i =>
      (99L, 1000L + i, at(i * 100L), "bot"))
    val normal = Seq[(Long, Long, Long, String)](
      (1L, 1L, at(10), "view"), (1L, 2L, at(20), "buy"))
    // Cap 10: the bot pairs only among its first 10 events — C(10,2)
    // ordered pairs — instead of C(50,2); normal traffic is untouched.
    val got = run(bot ++ normal, 10)
    assert(got(("bot", "bot")) == 45L)
    assert(got(("view", "buy")) == 1L)
    // Uncapped reference: the full n² expansion the guard exists to stop.
    assert(run(bot ++ normal, Int.MaxValue)(("bot", "bot")) == 50L * 49 / 2)
  }
}
