package graft

import org.apache.spark.sql.SparkSession

/** Executor-loss fault-tolerance proof for the `graft.materialize`
  * conf (run via spark-submit on `local-cluster[2,2,…]` — multi-JVM
  * executors on one machine, the closest local stand-in for a real
  * cluster):
  *
  *   1. build two session-cached artifacts under the conf'd strategy —
  *      the Dedup band index (`llm_dedup_minhash`) and a rank-cache
  *      graph entry (`graph_pagerank`) — and hash their served rows;
  *   2. `kill -9` one CoarseGrainedExecutorBackend JVM;
  *   3. serve both entries again from the same session and compare.
  *
  * Expected outcomes (the point of the conf):
  *   - `reliable`: the serve succeeds with identical hashes — the
  *     cached state lives as checkpoint FILES (a DFS path on a real
  *     cluster; a shared local dir here), so a lost executor's blocks
  *     recompute from files instead of failing;
  *   - `local`: the serve FAILS (`Checkpoint block … not found`) —
  *     localCheckpoint pins blocks to executor storage with no lineage
  *     fallback, exactly the documented single-JVM-only limitation;
  *   - `disk`: the serve FAILS the same way — persist(DISK_ONLY) keeps
  *     lineage for DAG-shaped caches (the band index would recompute),
  *     but the ITERATIVE family's cuts map `disk` to [[Materialize.Local]]
  *     ([[Materialize.sessionTruncating]] — retained lineage doubles a
  *     self-referencing round's plan), so the rank cache still dies
  *     with its executor. The proof records WHY `disk` is not the
  *     cluster answer: only `reliable` makes every cached artifact,
  *     iterative ones included, survive executor loss.
  *
  * Prints one JSON line; exit 0 when the observed outcome matches the
  * expectation for the mode, 1 otherwise. See BASELINE.md "Round-14
  * executor-loss proof" for the recorded run.
  */
object FaultProof {

  private def jstr(s: String): String = Bench.q(s)

  /** `kill -9` one executor JVM of THIS application (local-cluster
    * executors are separate CoarseGrainedExecutorBackend processes on
    * this host). Candidates are filtered by the backend's `--app-id
    * <applicationId>` argv so a concurrently running unrelated Spark
    * job can never lose an executor to a proof run (which would both
    * corrupt it and leave our own executors alive, making the scenario
    * vacuous); a refused destroy or a still-alive process fails the
    * proof instead of proceeding as if an executor died. Returns the
    * killed pid. Shared by [[FaultProof]] (batch) and
    * [[FaultProofStream]] (streaming recovery).
    */
  private[graft] def killOneExecutor(
      spark: SparkSession): Long = {
    val appId = spark.sparkContext.applicationId
    val victims = ProcessHandle.allProcesses().iterator()
    var killed = -1L
    while (victims.hasNext && killed < 0) {
      val p = victims.next()
      val cmd = p.info().commandLine().orElse("")
      if (cmd.contains("CoarseGrainedExecutorBackend") &&
          cmd.contains(appId)) {
        if (p.destroyForcibly()) {
          p.onExit().get(30, java.util.concurrent.TimeUnit.SECONDS): Unit
          killed = p.pid()
        } else if (!p.isAlive) {
          // the candidate exited in the enumerate-to-kill window
          // (respawn churn): an executor of this app IS dead, which is
          // the scenario under test — proceed rather than failing the
          // proof spuriously
          killed = p.pid()
        }
        // else: no permission to kill this one — keep scanning
      }
    }
    require(killed > 0,
      s"no executor JVM of app $appId found to kill - wrong master?")
    killed
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0) // local | disk | reliable
    val sfDir = args(1)
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("graft.materialize", mode)
      .config(Tables.RequiredConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckDir = java.nio.file.Files
      .createTempDirectory(s"graft-faultproof-$mode").toString
    spark.sparkContext.setCheckpointDir(ckDir)

    val entries = Seq("llm_dedup_minhash", "graph_pagerank")
    def hashes(): Map[String, Int] = entries.map { name =>
      name -> SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq.hashCode()
    }.toMap

    // 1. build + first serve under the conf'd strategy
    val before = hashes()

    // 2. kill one executor JVM of THIS app ([[killOneExecutor]])
    val killed = killOneExecutor(spark)
    // let the loss register (the worker may respawn a FRESH executor;
    // the dead one's block-store contents are gone either way)
    Thread.sleep(8000)

    // 3. serve again from the same session's caches
    val (serveOk, after, err) =
      try { val h = hashes(); (true, h, "") }
      catch { case e: Throwable =>
        (false, Map.empty[String, Int],
          Option(e.getMessage).getOrElse(e.getClass.getName).take(160))
      }
    val hashMatch = serveOk && after == before
    val expected = if (mode == "reliable") hashMatch else !serveOk
    println(s"""{"proof":"faultproof","mode":${jstr(mode)},""" +
      s""""killed_pid":$killed,"serve_ok":$serveOk,""" +
      s""""hash_match":$hashMatch,"expected_outcome":$expected,""" +
      s""""err":${jstr(err)},"sf":${jstr(sfDir)}}""")
    spark.stop()
    sys.exit(if (expected) 0 else 1)
  }
}
