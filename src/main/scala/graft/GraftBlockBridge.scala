package org.apache.spark

import org.apache.spark.storage.RDDBlockId

/** Block-location bridge for graft's executor-loss fault proof.
  *
  * [[graft.FaultProof]] must kill an executor that actually HOLDS
  * cached RDD blocks — with 2 executors and small build jobs, all of a
  * localCheckpoint's blocks can land on one JVM (whichever registered
  * first), and killing the other one proves nothing: the serve
  * succeeds directly and the recovery arm never fires (observed r16 —
  * the `local`-mode proof flaked exactly this way). Block locations
  * live behind `private[spark]` types (`SparkEnv.blockManager.master`,
  * `BlockManagerMaster.getLocations`), so the lookup sits in this
  * package-placed accessor — the same technique as
  * [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftBlockBridge {

  /** Executor ids (as in the backend's `--executor-id` argv) currently
    * holding at least one block of a persisted/checkpointed RDD of
    * this application; "driver" is excluded (local-mode blocks cannot
    * be killed out from under the proof anyway).
    */
  def executorsHoldingRddBlocks(sc: SparkContext): Set[String] = {
    val master = SparkEnv.get.blockManager.master
    sc.getPersistentRDDs.flatMap { case (rid, rdd) =>
      (0 until rdd.getNumPartitions).flatMap { p =>
        master.getLocations(RDDBlockId(rid, p)).map(_.executorId)
      }
    }.toSet - "driver"
  }
}
