package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event row for the streaming fault proof (top-level: Spark's
  * generated deserializers cannot reach nested case classes). Shape
  * matches the `events` fixture contract [[graft.streaming.Streams]]
  * transforms expect (`ts` = nanosecond Long).
  */
case class FpEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double)

/** Executor-loss fault-tolerance proof for STREAMING state (the
  * `graft.streaming.stateStore` seam) — completes the failure-mode
  * matrix: batch×kill is [[FaultProof]], streaming×restart is the
  * StreamingSpec checkpoint-recovery test, this is streaming×kill.
  *
  * Scenario (run via spark-submit on `local-cluster[2,2,…]`, one JVM
  * per executor):
  *
  *   1. CONTROL: run the `flatMapGroupsWithState` sessionizer
  *      ([[graft.streaming.Streams.sessionizeStateful]]) over a
  *      deterministic two-phase MemoryStream feed to a parquet sink,
  *      un-killed, and collect the closed sessions;
  *   2. KILLED: the same feed through a fresh checkpoint/sink, but
  *      `kill -9` one CoarseGrainedExecutorBackend JVM between the
  *      phases — phase 2's microbatches then hit a dead executor whose
  *      in-memory state maps are gone;
  *   3. compare: the killed run must RECOVER (tasks retry on the
  *      survivor / respawned executor; per-partition state reloads
  *      from the checkpointLocation's snapshot+changelog files) and
  *      emit rows identical to the control — open sessions spanning
  *      the kill must close with pre-kill counts, not reset.
  *
  * Expected outcome for BOTH providers (`hdfs` and `rocksdb`): recover
  * with identical rows — unlike [[FaultProof]]'s `local` mode, every
  * streaming state provider persists to the checkpoint location, so
  * executor loss is survivable by design; this proof demonstrates the
  * recovery actually happens (and that the RocksDB changelog path,
  * the 100 TB provider, restores mid-stream state bit-identically).
  *
  * Prints one JSON line; exit 0 when the observed outcome matches the
  * expectation, 1 otherwise. See BASELINE.md "Round-15 streaming
  * executor-loss proof" for the recorded run.
  */
object FaultProofStream {

  private def jstr(s: String): String = Bench.q(s)

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val MinNs = 60L * 1000 * 1000 * 1000

  /** Phase 1: open a 2-event session for each of 8 users (spread over
    * the shuffle partitions so BOTH executors hold state).
    */
  private def phase1: Seq[FpEvent] =
    (0L until 8L).flatMap { u =>
      Seq(FpEvent(u * 10 + 1, HourNs + u * MinNs, u, "click", 1.0),
        FpEvent(u * 10 + 2, HourNs + u * MinNs + 10 * MinNs, u,
          "view", 2.0))
    }

  /** Phase 2a: extend half the open sessions within the gap — only
    * RECOVERED state can produce 3-event sessions after the kill.
    */
  private def phase2a: Seq[FpEvent] =
    (0L until 8L by 2).map { u =>
      FpEvent(u * 10 + 3, HourNs + u * MinNs + 25 * MinNs, u,
        "purchase", 3.0)
    }

  /** Phase 2b/2c: far-future events pushing the watermark so every
    * open session times out and EMITS (two steps: the watermark
    * advances at batch end, the timeouts fire in the next batch).
    */
  private def phase2b: Seq[FpEvent] =
    Seq(FpEvent(900, 50 * HourNs, 99, "click", 0.0))
  private def phase2c: Seq[FpEvent] =
    Seq(FpEvent(901, 60 * HourNs, 99, "view", 0.0))

  /** One full feed through the sessionizer into a parquet sink.
    * `killBetween` fires [[FaultProof.killOneExecutor]] after phase 1
    * is fully processed, so phase 2 exercises mid-stream recovery.
    * Returns the sorted closed-session rows.
    */
  private def run(spark: SparkSession, tag: String,
      killBetween: Boolean): (Seq[String], Long) = {
    val s = spark; import s.implicits._
    implicit val ctx = spark.sqlContext
    val ck = java.nio.file.Files
      .createTempDirectory(s"graft-fps-ck-$tag").toString
    val out = java.nio.file.Files
      .createTempDirectory(s"graft-fps-out-$tag").toString
    val mem = MemoryStream[FpEvent]
    // through the public start seam: configureStateStore is resolved
    // by startQuery itself (the default-on contract)
    val q = graft.streaming.Streams.startQuery(
      graft.streaming.Streams.sessionizeStateful(mem.toDF()))(
      _.format("parquet").option("path", out)
        .option("checkpointLocation", ck).outputMode("append"))
    var killed = -1L
    try {
      mem.addData(phase1)
      q.processAllAvailable()
      if (killBetween) killed = FaultProof.killOneExecutor(spark)
      mem.addData(phase2a)
      q.processAllAvailable()
      mem.addData(phase2b)
      q.processAllAvailable()
      mem.addData(phase2c)
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out)
      .select("user_id", "start_us", "duration_us", "n_events")
      .collect().map(_.toString).sorted.toSeq
    (rows, killed)
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0) // hdfs | rocksdb
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("graft.streaming.stateStore", mode)
      .config(Tables.RequiredConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // BOTH runs are caught: an uncaught control-run failure would exit
    // without the JSON contract line at all, leaving half the failure
    // modes undiagnosable from the artifact the gate script greps
    def msg(e: Throwable): String =
      Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
    val (control, ctlErr) =
      try { (run(spark, "control", killBetween = false)._1, "") }
      catch { case e: Throwable => (Seq.empty[String], msg(e)) }
    val (killedRows, killedPid, err) =
      if (ctlErr.nonEmpty) (Seq.empty[String], -1L, s"control: $ctlErr")
      else try { val (r, k) = run(spark, "killed", killBetween = true)
        (r, k, "")
      } catch { case e: Throwable => (Seq.empty[String], -1L, msg(e)) }
    val serveOk = err.isEmpty
    val rowsMatch = serveOk && killedRows == control
    // extended-past-the-kill sessions really exist (n_events = 3), or
    // the recovery claim is vacuous
    val extended = control.count(_.contains(",3]"))
    val expected = rowsMatch && control.nonEmpty && extended > 0
    println(s"""{"proof":"faultproof_stream","mode":${jstr(mode)},""" +
      s""""killed_pid":$killedPid,"serve_ok":$serveOk,""" +
      s""""rows_match":$rowsMatch,"n_sessions":${control.size},""" +
      s""""n_extended":$extended,"expected_outcome":$expected,""" +
      s""""err":${jstr(err)}}""")
    spark.stop()
    sys.exit(if (expected) 0 else 1)
  }
}
