package graft

import org.apache.spark.sql.functions._

/** Pins [[Materialize.release]]'s reclamation contract — the half of
  * the strategy seam the cluster story depends on: per-round release
  * in the iterative loops must actually reclaim what each strategy
  * allocated, or checkpoint storage grows linearly with round count.
  */
class MaterializeSpec extends SparkSpecBase {

  private def rootRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[_] =
    df.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd

  test("release deletes a Reliable checkpoint's files") {
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft_ck_rel").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    try {
      val ck = Materialize.Reliable(
        spark.range(100).toDF("id").select(col("id"), (col("id") * 2).as("v")))
      val file = rootRdd(ck).getCheckpointFile
      assert(file.nonEmpty, "Reliable output is not a reliable checkpoint")
      val p = new org.apache.hadoop.fs.Path(file.get)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(p), "checkpoint files were never written")
      // unpersist alone is a no-op for reliable checkpoints — release
      // must delete the directory, or every superseded loop round
      // leaks a full-table checkpoint for the application lifetime
      Materialize.release(ck)
      assert(!fs.exists(p),
        s"release left the reliable checkpoint files at ${file.get}")
    } finally {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(ckDir))
    }
  }

  test("release unwraps rename projections to the checkpointed root") {
    val ck = Materialize.Local(
      spark.range(50).toDF("id").select(col("id"), (col("id") + 1).as("v")))
    val rdd = rootRdd(ck)
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // the `select(col("id").as("doc_id"))` shape the iterative loops
    // return their final table through: a pure rename must not hide
    // the root from release
    val renamed = ck.select(col("id").as("doc_id"), col("v").as("w"))
    Materialize.release(renamed)
    assert(rdd.getStorageLevel ==
        org.apache.spark.storage.StorageLevel.NONE,
      "release did not reach the checkpoint behind a rename projection")
  }

  test("release does not pierce a Filter barrier over a shared table") {
    // the ownership contract's escape hatch: an API that must hand a
    // view of a SHARED cached table to a caller who may release() it
    // wraps the view in `WHERE true` — inert at execution (Catalyst
    // folds it), but the ANALYZED plan release walks keeps it, so the
    // walk stops before the shared root (curateStrictMat's cached
    // branch; trianglesOf's edge projection under Disk)
    val shared = Materialize.Local(
      spark.range(40).toDF("id").select(col("id"), (col("id") * 3).as("v")))
    val rdd = rootRdd(shared)
    assert(rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
    val view = shared.select(col("id"), col("v")).where(lit(true))
    Materialize.release(view)
    assert(rdd.getStorageLevel !=
        org.apache.spark.storage.StorageLevel.NONE,
      "release pierced the WHERE-true barrier and killed the shared table")
    assert(view.count() == 40) // the barrier costs nothing at execution
    Materialize.release(shared)
  }

  test("eager classifies the strategies by when they materialize") {
    assert(Materialize.eager(Materialize.Local))
    assert(Materialize.eager(Materialize.Reliable))
    // Disk persists on FIRST ACTION — builders releasing staged inputs
    // must force derived tables first (triKernelOf, frequentBaskets)
    assert(!Materialize.eager(Materialize.Disk))
    assert(!Materialize.eager(Materialize.None))
  }

  test("Session sentinel: applied as a strategy it degrades to the " +
    "input session's conf strategy") {
    // dispatch sites compare `mat eq Materialize.Session`; if a caller
    // instead APPLIES it where a concrete cut is expected, it must cut
    // with the input's own session conf (local default → an eager
    // lineage-truncating checkpoint, same as Local)
    val df = spark.range(30).selectExpr("id", "id * 2 AS v")
    val cut = Materialize.Session(df.toDF())
    try {
      assert(cut.collect().map(_.getLong(1)).sorted.toSeq ==
        df.collect().map(_.getLong(1)).sorted.toSeq)
      assert(cut.queryExecution.analyzed
        .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
        "Session under the local default must checkpoint like Local")
    } finally Materialize.release(cut)
  }

  test("requireTruncating rejects Disk in the iterative forms") {
    // the public-API path: sessionTruncating never yields Disk, but a
    // caller passing it explicitly must fail fast (plan-doubling OOM)
    // rather than N rounds in
    val ed = spark.range(4).selectExpr("id AS a", "id + 1 AS b",
      "CAST(5 AS LONG) AS w")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.kcoreOf(ed.toDF(), Materialize.Disk)
    }
    assert(e.getMessage.contains("iterative"))
    // …while the conf path maps disk to a truncating cut and runs
    val viaConf = spark.newSession()
    viaConf.conf.set("graft.materialize", "disk")
    assert(Materialize.sessionTruncating(viaConf) eq Materialize.Local)
  }

  test("isCheckpointLoss matches the REAL lost-block failure and walks " +
    "cause chains; unrelated failures do not match") {
    // the real thing: a localCheckpoint whose blocks are gone serves
    // the same failure class an executor kill produces
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the r15 matrix's recorded
    // local/disk outcome)
    val ck = Materialize.Local(
      spark.range(100).toDF("id").select(col("id"), (col("id") + 1).as("v")))
    rootRdd(ck).unpersist(blocking = true)
    val e = intercept[Exception](ck.count())
    assert(Materialize.isCheckpointLoss(e),
      s"real lost-block failure unmatched: ${e.getMessage}")
    // cause-chain walking: Spark wraps task failures in job-abort layers
    assert(Materialize.isCheckpointLoss(new RuntimeException("outer",
      new RuntimeException("Checkpoint block rdd_9_1 not found! ..."))))
    assert(Materialize.isCheckpointLoss(
      new RuntimeException("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND: gone")))
    // a rebuild must never mask a real bug
    assert(!Materialize.isCheckpointLoss(new RuntimeException("boom")))
    assert(!Materialize.isCheckpointLoss(
      new RuntimeException("block rdd_1_0 misplaced")))
  }

  test("recovering: checkpoint loss invalidates the session's caches " +
    "and rebuilds ONCE; other failures and double loss propagate") {
    val cache = new SessionCache[String, java.lang.Integer](_ => ())
    cache.getOrBuild(spark, "k")(42): Unit
    assert(cache.size == 1)
    var calls = 0
    var rebuilds = 0
    val got = Materialize.recovering(spark, _ => rebuilds += 1) {
      calls += 1
      if (calls == 1) throw new RuntimeException("job aborted",
        new RuntimeException("Checkpoint block rdd_7_0 not found! ..."))
      "served"
    }
    assert(got == "served" && calls == 2 && rebuilds == 1)
    assert(cache.size == 0,
      "recovery must drop the session's cached artifacts before rebuild")
    // a NON-matching failure propagates without touching the caches
    cache.getOrBuild(spark, "k2")(7): Unit
    intercept[RuntimeException](
      Materialize.recovering(spark)(throw new RuntimeException("boom")))
    assert(cache.size == 1,
      "an unrelated failure must not invalidate cached artifacts")
    // a SECOND checkpoint loss propagates — one rebuild is the
    // contract, not a retry loop (executors actively dying must fail
    // loudly, not spin)
    var n = 0
    val e2 = intercept[RuntimeException](Materialize.recovering(spark) {
      n += 1
      throw new RuntimeException("Checkpoint block rdd_1_0 not found!")
    })
    assert(n == 2 && Materialize.isCheckpointLoss(e2))
    cache.invalidate(spark, _ => true)
  }

  test("GraftBlockBridge: block-location lookup runs against a live " +
    "session and excludes driver-held blocks") {
    // local-mode pin for the faultproof targeting seam: a persisted
    // DF's blocks live on the DRIVER block manager here, and the
    // bridge must exclude it (killing the driver is not the scenario)
    // rather than throw — on local-cluster the same call returns the
    // executor ids FaultProof prefers as kill victims
    val df = spark.range(50).toDF("id")
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count(): Unit
    assert(org.apache.spark.GraftBlockBridge
      .executorsHoldingRddBlocks(spark.sparkContext).isEmpty)
    df.unpersist(blocking = true): Unit
  }

  test("requireTruncating resolves the Session sentinel at ENTRY, " +
    "mapping a disk conf to a truncating cut") {
    // the r14 hazard: Session passed to an iterative form slipped the
    // Disk guard (it is neither Disk nor None), then every per-round
    // APPLICATION re-read the conf — under graft.materialize=disk that
    // cut each round with Disk, the lineage-retaining plan-doubling
    // path the guard exists to reject. Entry resolution must hand the
    // loop sessionTruncating's mapping instead.
    val viaConf = spark.newSession()
    viaConf.conf.set("graft.materialize", "disk")
    assert(Materialize.requireTruncating(
      Materialize.Session, viaConf, "spec") eq Materialize.Local)
    viaConf.conf.set("graft.materialize", "reliable")
    assert(Materialize.requireTruncating(
      Materialize.Session, viaConf, "spec") eq Materialize.Reliable)
    // concrete strategies pass through unchanged (None stays legal for
    // the non-looping …Of forms that accept it)
    assert(Materialize.requireTruncating(
      Materialize.Local, viaConf, "spec") eq Materialize.Local)
    assert(Materialize.requireTruncating(
      Materialize.None, viaConf, "spec") eq Materialize.None)
    // …and an iterative form fed the sentinel under a disk conf RUNS
    // (resolved to Local at entry) instead of plan-doubling: 4-node
    // chain, one clustersOf fixed point
    val disky = spark.newSession()
    disky.conf.set("graft.materialize", "disk")
    val pairs = disky.range(3).selectExpr(
      "id AS doc_a", "id + 1 AS doc_b")
    val labels = graft.operators.Dedup.clustersOf(
      pairs.toDF(), Materialize.Session)
    try {
      val lbls = labels.collect().map(r => r.getLong(1)).distinct
      assert(lbls.length == 1, "a 4-node chain is one component")
    } finally Materialize.release(labels)
  }
}
