package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Structured Streaming execution of the shared transforms (SURVEY.md
  * §2.10): the SAME code that the DuckDB oracle checks in batch runs
  * under readStream/writeStream with an event-time watermark, and the
  * emitted (finalized) results agree with the batch answer.
  */
case class Ev(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double)

class StreamingSpec extends SparkSpecBase {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val MinNs = 60L * 1000 * 1000 * 1000

  private def ev(id: Long, tsNs: Long, user: Long = 1L,
      typ: String = "click", v: Double = 1.0): Ev =
    Ev(id, tsNs, user, typ, v)

  test("tumbling stats finalize under watermark and match batch") {
    val s = spark; import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.tumblingStats(mem.toDF(), Some("2 hours"))
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("append").start()
    try {
      val wave1 = Seq(
        ev(1, 10 * MinNs), ev(2, 20 * MinNs, typ = "view"),
        ev(3, HourNs + 5 * MinNs), ev(4, HourNs + 40 * MinNs))
      mem.addData(wave1: _*)
      q.processAllAvailable()
      // push the watermark past hour 1, then once more so append emits
      mem.addData(ev(5, 10 * HourNs))
      q.processAllAvailable()
      mem.addData(ev(6, 11 * HourNs))
      q.processAllAvailable()

      val streamed = spark.table("tumbling_test")
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      val batch = Streams.tumblingStats(wave1.toDF(), None)
        .collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(batch.subsetOf(streamed),
        s"finalized windows missing: ${batch -- streamed}")
    } finally q.stop()
  }

  test("session windows close on gap expiry and match batch sessions") {
    val s = spark; import s.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.sessionWindowStats(mem.toDF(), Some("1 hour"))
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // user 1: two sessions (10-min burst, then a 2-hour gap);
      // user 2: one singleton session.
      val wave = Seq(
        ev(1, 0, user = 1), ev(2, 10 * MinNs, user = 1),
        ev(3, 2 * HourNs + 10 * MinNs, user = 1),
        ev(4, 5 * MinNs, user = 2))
      mem.addData(wave: _*)
      q.processAllAvailable()
      mem.addData(ev(9, 20 * HourNs)) // advance watermark far
      q.processAllAvailable()
      mem.addData(ev(10, 21 * HourNs))
      q.processAllAvailable()

      val streamed = spark.table("session_test")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet
      val batch = Streams.sessionWindowStats(wave.toDF(), None)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
        .toSet
      assert(batch.subsetOf(streamed),
        s"closed sessions missing: ${batch -- streamed}")
      // the hand-computable shape: user 1 has a 2-event and a 1-event
      // session, user 2 a singleton
      val u1 = batch.filter(_._1 == 1L).map(_._3)
      assert(u1 == Set(2L, 1L) && batch.count(_._1 == 2L) == 1)
    } finally q.stop()
  }
}
