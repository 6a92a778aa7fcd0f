package graft

/** Every registered entry must ANALYZE against the current fixture.
  *
  * Round-7 lesson: the driver regenerated `events.parquet` with a new
  * `ts` encoding and 12 `stream_*` queries started failing analysis —
  * invisibly, because Verify swallowed per-query exceptions. Analysis is
  * cheap (no job runs), so this spec walks the ENTIRE `SparkEntry
  * .queries` registry and fails at commit time if any entry no longer
  * resolves against `/root/testdata/sf0.001` — the first line of defense
  * against fixture drift.
  */
class EntryAnalysisSpec extends SparkSpecBase {

  test("every SparkEntry.queries entry analyzes against the fixture") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, Sf).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | ")}")
        }
    }
    assert(broken.isEmpty,
      s"${broken.size} entries fail analysis:\n  ${broken.mkString("\n  ")}")
  }

  test("every oracleSql key has a queries entry (and is not orphaned)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every queries entry carries an oracle — zero rows-only") {
    // the r11 SGD-fold replay (explicit id % P sharding + the shared
    // table-sigmoid, Sgd.fitCtes) closed the last three rows-only
    // exemptions; from here a new entry missing its oracle fails HERE,
    // not silently as a weaker rows-only row in the driver's gate
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"entries without an oracle: $rowsOnly")
  }
}
