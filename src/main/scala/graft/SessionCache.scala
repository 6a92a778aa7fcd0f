package graft

import org.apache.spark.sql.SparkSession

/** The ONE session-lifetime cache discipline behind every operator
  * serving index (dedup shingle/band tables, the triangle kernel, the
  * int8/PQ/PCA serving indexes, the Bloom filter, the BPE merge table,
  * the coverage incidence, the DSIR distributions, …):
  *
  *  - keyed by (SparkSession, K) — one entry per live session per
  *    operator key (typically a fixture dir plus a kind tag);
  *  - get + putIfAbsent, NEVER computeIfAbsent: builds nest (bands
  *    derive from shingles, scored pairs from the quantized corpus),
  *    and a nested computeIfAbsent on one map throws "Recursive
  *    update" when keys share a bin. A lost race builds one redundant
  *    deterministic table and releases it — harmless; holding a bin
  *    lock through a Spark job is not;
  *  - explicit [[invalidate]] hooks at the (session, dir) boundary —
  *    callers that rewrite parquet under a cached dir or cycle
  *    sessions invalidate there (the
  *    [[graft.operators.Graph.invalidateEdges]] contract);
  *  - a dead-session sweep on every access: entries whose session has
  *    stopped are DROPPED (references only — no release call: the
  *    stopped context already reclaimed its blocks, and unpersist on a
  *    dead session throws), so session churn in a long-lived JVM (the
  *    repeated-test-session pattern) cannot accumulate pinned
  *    SparkSession/DataFrame references across the now-many
  *    per-operator caches.
  *
  * r11 carried ~18 hand-rolled copies of this pattern; one drifted
  * copy shipped a release leak. This class is the single spelling.
  */
final class SessionCache[K, V](release: V => Unit) {

  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]

  // register AFTER every field is initialized: publishing `this` to the
  // global registry first is a this-escape — a concurrent
  // Materialize.invalidateAll racing another thread's first touch of an
  // operator singleton could observe m == null and NPE mid-walk
  SessionCache.register(this)

  private def sweep(): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      if (it.next().getKey._1.sparkContext.isStopped) it.remove()
    }
  }

  def getOrBuild(spark: SparkSession, key: K)(build: => V): V = {
    sweep()
    val k = (spark, key)
    val got = m.get(k)
    if (got != null) got
    else {
      val built = build
      val prev = m.putIfAbsent(k, built)
      if (prev != null) { release(built); prev } else built
    }
  }

  /** Drop matching entries: a specific session (or all with `spark =
    * null`) and whatever key predicate the operator's public hook
    * translates its (dir, …) arguments into. Live sessions get their
    * value released; stopped ones are reference-dropped like [[sweep]].
    */
  def invalidate(spark: SparkSession, p: K => Boolean): Unit = {
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if ((spark == null || e.getKey._1 == spark) && p(e.getKey._2)) {
        if (!e.getKey._1.sparkContext.isStopped) release(e.getValue)
        it.remove()
      }
    }
  }

  /** Every key this session holds, dropped ([[SessionCache]] registry
    * walk — typed `K` is existential there, so the all-keys case gets
    * its own spelling).
    */
  private[graft] def invalidateSession(spark: SparkSession): Unit =
    invalidate(spark, _ => true)

  /** Test seam: number of live entries (post-sweep). */
  def size: Int = { sweep(); m.size() }
}

/** Registry of every [[SessionCache]] instance in the JVM (each is an
  * operator-object singleton, so the set is small and lives for the
  * application): lets [[graft.Materialize.invalidateAll]] drop a
  * session's artifacts across ALL operators in one call — the remedy
  * for a mid-session `graft.materialize` flip. A cache in a
  * not-yet-loaded operator object is unregistered AND empty, so the
  * walk is still complete for any session.
  */
object SessionCache {

  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[SessionCache[_, _]]

  private def register(c: SessionCache[_, _]): Unit = { registry.add(c): Unit }

  /** Release and drop every entry the given session holds, in every
    * registered cache (`spark = null` clears all sessions).
    */
  def invalidateAll(spark: SparkSession): Unit =
    registry.forEach(_.invalidateSession(spark))
}
