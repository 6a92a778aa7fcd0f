package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization strategy for intermediate tables that feed multiple
  * plan consumers (dedup shingle tables, band indexes): without a cut,
  * each consumer of a self-joined narrow pipeline recomputes it from the
  * scan. The default is `localCheckpoint` — cheapest cut, right for
  * single-JVM local mode — but it pins blocks to executor storage with no
  * lineage fallback, so a 100 TB deployment selects [[Materialize.Disk]]
  * (or any custom strategy) instead: reliable, recomputable, spillable.
  */
object Materialize {

  /** A materialization point: given the DataFrame to cut, return the
    * (possibly same) DataFrame consumers should read from.
    */
  type Strategy = DataFrame => DataFrame

  /** Executor-local checkpoint: truncates lineage, blocks live in
    * executor storage only. Fast; loses the job if an executor dies.
    */
  val Local: Strategy = _.localCheckpoint()

  /** Reliable persistence to executor disk with lineage retained — a
    * lost block recomputes instead of failing the job. The scale choice.
    */
  val Disk: Strategy = _.persist(StorageLevel.DISK_ONLY)

  /** No cut at all (consumers recompute) — for single-consumer plans. */
  val None: Strategy = identity
}
