package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** The `ts` fixture encoding is driver-controlled and has already changed
  * once mid-project (TIMESTAMP(NANOS)-as-Long → timestamp[us], the
  * round-7 regression). This spec pins [[Streams.withEventTime]]'s
  * contract: the SAME instants written as (a) nanosecond Longs, (b)
  * timestamp[us] parquet (surfaced TIMESTAMP_NTZ with Spark's NTZ
  * inference), and (c) an in-memory TIMESTAMP column must normalize to
  * the identical `ts_us` and flow through every stream transform to
  * identical results.
  */
class EventTimeEncodingSpec extends SparkSpecBase {

  // 2h of events across 3 users / 3 types with sub-second offsets so
  // window boundaries, session gaps, and pair buckets are all exercised.
  private val BaseUs = 1700000000000000L // 2023-11-14T22:13:20Z, micros
  private def rows: Seq[(Long, Long, Long, String, Double)] =
    (0L until 200L).map { i =>
      val ts = BaseUs + i * 37L * 1000000L + i % 7 * 123456L
      val tpe = Seq("view", "click", "purchase")(i.toInt % 3)
      (i, ts, i % 3, tpe, (i % 11).toDouble / 2.0)
    }

  /** events with ts as a nanosecond Long (the legacy fixture surface). */
  private def longNanos(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts") * 1000L)
  }

  /** events written to parquet as timestamp[us] (isAdjustedToUTC=false)
    * and read back — the current fixture surface (TIMESTAMP_NTZ).
    */
  private def ntzParquet(s: SparkSession): DataFrame = {
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ntz-events-").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  /** events with ts as a plain TIMESTAMP column. */
  private def tsColumn(s: SparkSession): DataFrame = {
    import s.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("ts")))
  }

  private def encodings = Seq(
    "long-nanos" -> longNanos(spark),
    "ntz-parquet" -> ntzParquet(spark),
    "timestamp" -> tsColumn(spark))

  test("withEventTime normalizes all encodings to identical ts_us") {
    val expected = rows.map { case (id, ts, _, _, _) => (id, ts) }.toSet
    encodings.foreach { case (name, df) =>
      val got = Streams.withEventTime(df)
        .select("event_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"encoding $name diverges on ts_us")
    }
  }

  test("every ts-dependent stream transform is encoding-invariant") {
    val transforms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "tumblingStats" -> (Streams.tumblingStats(_, None)),
      "hoppingStats" -> (Streams.hoppingStats(_, None)),
      "topkTypes" -> (Streams.topkTypes(_)),
      "sessions" -> (Streams.sessions(_)),
      "gapHistogram" -> (Streams.gapHistogram(_)),
      "sessionWindowStats" -> (Streams.sessionWindowStats(_)),
      "eventPairs" -> (Streams.eventPairs(_, Streams.MaxBurstPerUser)),
      "funnel" -> (Streams.funnel(_)),
      "retention" -> (Streams.retention(_)),
      "resampleDaily" -> (Streams.resampleDaily(_)),
      "firstTouch" -> (Streams.firstTouch(_)),
      "asofViewBeforePurchase" -> (Streams.asofViewBeforePurchase(_)),
      "ewmaValue" -> (Streams.ewmaValue(_)),
      "conversionLatency" -> (Streams.conversionLatency(_)),
      "rateAnomaly" -> (Streams.rateAnomaly(_)),
      "dailyTrend" -> (Streams.dailyTrend(_)))
    val (refName, refDf) = encodings.head
    transforms.foreach { case (tName, t) =>
      val ref = t(refDf).collect().map(_.toSeq).toSet
      encodings.tail.foreach { case (name, df) =>
        val got = t(df).collect().map(_.toSeq).toSet
        assert(got == ref,
          s"$tName($name) diverges from $tName($refName)")
      }
    }
  }
}
