package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Physical-data-layout operators: the two techniques a 100 TB warehouse
  * leans on to make the *storage* side of the engine scale, neither of
  * which the reference engine (whiker92/MapReduce_code) can express at
  * all — its jobs re-scan every input split unconditionally
  * (TextInputFormat over the full directory, apriori/apriori_final.java:259).
  *
  *   - [[zorderSkipping]] — multi-dimensional clustering: interleave the
  *     bits of two query dimensions into a Morton (Z-order) code, lay
  *     files out along that curve, and AUDIT the payoff — how many
  *     file-level zone maps (min/max per file) a selective predicate on
  *     EITHER dimension can skip, versus a natural (insertion-order)
  *     layout and a single-key sorted layout. This is the
  *     `OPTIMIZE ... ZORDER BY` technique of modern lakehouses, reduced
  *     to its testable core: the same rows, three layouts, one
  *     deterministic skipping count per (layout, predicate). The
  *     physical writer half lives in
  *     [[graft.sources.TextSources.writeZOrdered]] (MSB-aligned Morton
  *     + `repartitionByRange`); this entry is the hash-gated
  *     effectiveness audit of the same curve, with both keys scaled to
  *     equal 8-bit widths (at equal widths MSB and LSB alignment pick
  *     the same bit pairs, only the dimension parity differs).
  *   - [[rangeJoinBinned]] — the bin-bucketed interval join: a point-in-
  *     interval join with NO equi key is the one join shape Catalyst can
  *     only plan as BroadcastNestedLoopJoin (small side) or a Cartesian
  *     product (both large) — O(|points|·|intervals|) either way. Binning
  *     manufactures the missing equi key: overlay a fixed-width grid,
  *     explode each interval into the cells it overlaps (bounded fan-out:
  *     width ≤ cell ⇒ ≤ 2 cells), map each point to its one cell, and
  *     equi-join on the cell — a plain shuffled hash join that scales
  *     with data size, then an exact containment filter. Each point lives
  *     in exactly one cell, so every matching (point, interval) pair
  *     surfaces exactly once — no dedup pass.
  *
  * Determinism discipline (see [[Relational]]): the z-order audit is
  * all-integer arithmetic (`div` here = `//` in DuckDB); the range join's
  * band boundaries are double expressions evaluated identically in both
  * engines (same literals, same IEEE ops), and its value sum rides
  * DECIMAL(24,6).
  */
object Layout {

  // ---- Z-order / zone-map skipping audit ----

  /** Bits per dimension: keys are scaled to 0..2^B-1, the Morton code is
    * 2B bits, and a file is one 2B-8-bit Morton prefix (256 files).
    */
  private val ZBits = 8

  /** Audit predicates, stated on the scaled key space (always 0..255
    * regardless of sf): one sixteenth of each dimension — exactly one
    * high nibble, so the expected zone-map behavior is provable:
    * partsort scans 16/256 files for P1 but all 256 for P2; zorder scans
    * 16/256 for BOTH (the top 8 Morton bits interleave both high
    * nibbles); natural scans everything for both.
    */
  private val P1Lo = 96L;  private val P1Hi = 111L // px ∈ [96,111]
  private val P2Lo = 32L;  private val P2Hi = 47L  // py ∈ [32,47]

  /** Morton interleave of two [[ZBits]]-bit codes: px bits land on odd
    * positions, py bits on even — a pure bit-shuffle, monotone along the
    * Z curve, bijective on the 2^(2B) grid (property-tested).
    */
  private def mortonCol(px: Column, py: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftright(px, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(py, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** The same interleave as DuckDB SQL over columns `px`, `py`. */
  private def mortonSql: String =
    (0 until ZBits).map { i =>
      s"((((px >> $i) & 1) << ${2 * i + 1}) + (((py >> $i) & 1) << ${2 * i}))"
    }.mkString(" + ")

  /** Zone-map skipping audit over lineitem, dimensions (l_partkey,
    * l_suppkey): one row per layout with, for each audit predicate, how
    * many of the 256 files survive min/max pruning, how many rows those
    * files hold, and how many rows actually match (layout-invariant — a
    * built-in consistency check: `rows_match_*` must agree across the
    * three rows).
    *
    * Scale shape: one 1-row min/max aggregate broadcast back over the
    * fact scan (the Q15 scalar pattern — at 100 TB this is a metadata
    * read), one projection computing the three file ids, a 3× explode,
    * and two bounded aggregations (≤ 3·256 zone rows, then 3). No
    * global sort is needed to MEASURE the layouts: the file id of every
    * layout is a pure function of the row's keys, which is exactly why
    * Z-order clustering scales — assigning a row to its file is
    * embarrassingly parallel, and the physical write would be one
    * `repartitionByRange(morton)` whose range exchange samples rather
    * than sorts globally.
    */
  def zorderSkipping(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val bounds = li.agg(
      min("l_partkey").as("minp"), max("l_partkey").as("maxp"),
      min("l_suppkey").as("mins"), max("l_suppkey").as("maxs"),
      min("l_orderkey").as("mino"), max("l_orderkey").as("maxo"))
    val keyed = li
      .select("l_partkey", "l_suppkey", "l_orderkey")
      .crossJoin(broadcast(bounds)) // 1-row build side
      .select(
        expr("((l_partkey - minp) * 256) div (maxp - minp + 1)").as("px"),
        expr("((l_suppkey - mins) * 256) div (maxs - mins + 1)").as("py"),
        expr("((l_orderkey - mino) * 256) div (maxo - mino + 1)").as("fnat"))
      .withColumn("morton", mortonCol(col("px"), col("py")))
    val filed = keyed
      .select(col("px"), col("py"), explode(array(
        struct(lit("natural").as("layout"), col("fnat").as("file")),
        struct(lit("partsort").as("layout"), col("px").as("file")),
        struct(lit("zorder").as("layout"),
          shiftright(col("morton"), 2 * ZBits - 8).as("file")))).as("lf"))
      .select(col("lf.layout").as("layout"), col("lf.file").as("file"),
        col("px"), col("py"))
    val zones = filed.groupBy("layout", "file").agg(
      min("px").as("min_px"), max("px").as("max_px"),
      min("py").as("min_py"), max("py").as("max_py"),
      count(lit(1)).as("n_rows"),
      sum(when(col("px").between(P1Lo, P1Hi), 1L).otherwise(0L))
        .as("rows_p1"),
      sum(when(col("py").between(P2Lo, P2Hi), 1L).otherwise(0L))
        .as("rows_p2"))
    val scan1 = !(col("min_px") > P1Hi || col("max_px") < P1Lo)
    val scan2 = !(col("min_py") > P2Hi || col("max_py") < P2Lo)
    zones.groupBy("layout").agg(
      count(lit(1)).as("files_total"),
      sum(when(scan1, 1L).otherwise(0L)).as("files_scanned_p1"),
      sum(when(scan1, col("n_rows")).otherwise(0L)).as("rows_scanned_p1"),
      sum("rows_p1").as("rows_match_p1"),
      sum(when(scan2, 1L).otherwise(0L)).as("files_scanned_p2"),
      sum(when(scan2, col("n_rows")).otherwise(0L)).as("rows_scanned_p2"),
      sum("rows_p2").as("rows_match_p2"))
  }

  // ---- Bin-bucketed range (point-in-interval) join ----

  /** Band k covers [lo(k), lo(k+1)) with lo(k) = k/4 + (k mod 7)/64:
    * strictly monotone (step ∈ [0.25 − 6/64, 0.25 + 1/64]) but
    * deliberately IRREGULAR widths, so no closed-form
    * `floor(value/width)` can replace the join — the shape genuinely
    * requires interval containment, like the IP-range / SCD2-validity /
    * price-band joins it stands in for. Both addends are exact binary
    * fractions, so the boundaries are bit-identical doubles in any
    * IEEE-754 engine.
    */
  private val NumBands = 1961 // covers value ∈ [0, 490.25+): 490.02 max

  /** Grid cell width; ≥ max band width (0.265625) ⇒ a band overlaps ≤ 2
    * cells, so the interval explode is a bounded ≤2× fan-out however
    * many bands there are.
    */
  private val CellW = 0.5

  private def bandLo(k: Column): Column =
    k.cast("double") / 4.0 + (k % 7).cast("double") / 64.0

  /** Per-band event count and exact value sum, computed WITHOUT a single
    * non-equi join: intervals explode onto the ≤ 2 grid cells they
    * overlap, points hash to their one cell, and the join is a plain
    * equi-join on the cell followed by the exact `lo ≤ value < hi`
    * filter. Each point has exactly one cell row, so a matching pair
    * joins exactly once. At fixture scale Catalyst broadcasts the ~4k
    * exploded band rows; with a 10^9-row interval table the same plan
    * degrades gracefully to a shuffled hash join on `cell` — which is
    * the entire point: the naive formulation has NO non-broadcast
    * strategy (BroadcastNestedLoopJoin or Cartesian only; a
    * plan-shape spec pins that neither appears here).
    *
    * The DuckDB oracle is deliberately the NAIVE inequality join — the
    * binned rewrite must reproduce exact containment semantics, not an
    * approximation of them.
    */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = spark.range(0, NumBands).toDF("k")
      .select(col("k"), bandLo(col("k")).as("lo"),
        bandLo(col("k") + 1).as("hi"))
    val bandCells = bands
      .select(col("k"), col("lo"), col("hi"),
        explode(sequence(
          floor(col("lo") / CellW).cast("long"),
          floor(col("hi") / CellW).cast("long"))).as("cell"))
    val pts = Tables(spark, dir, "events")
      .select(col("value"),
        floor(col("value") / CellW).cast("long").as("cell"))
    pts.join(bandCells, Seq("cell"))
      .where(col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("k", "lo")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(24,6)")).cast("double")
          .as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_zorder_skipping" -> zorderSkipping,
    "rel_range_join_binned" -> rangeJoinBinned
  )

  val oracle: Map[String, String] = Map(
    "rel_zorder_skipping" ->
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
         |    min(l_suppkey) AS mins, max(l_suppkey) AS maxs,
         |    min(l_orderkey) AS mino, max(l_orderkey) AS maxo
         |  FROM lineitem),
         |k AS (
         |  SELECT ((l_partkey - minp) * 256) // (maxp - minp + 1) AS px,
         |    ((l_suppkey - mins) * 256) // (maxs - mins + 1) AS py,
         |    ((l_orderkey - mino) * 256) // (maxo - mino + 1) AS fnat
         |  FROM lineitem, b),
         |m AS (SELECT px, py, fnat, $mortonSql AS morton FROM k),
         |lf AS (
         |  SELECT 'natural' AS layout, fnat AS file, px, py FROM m
         |  UNION ALL SELECT 'partsort', px, px, py FROM m
         |  UNION ALL SELECT 'zorder', morton >> ${2 * ZBits - 8}, px, py
         |    FROM m),
         |z AS (
         |  SELECT layout, file,
         |    min(px) AS min_px, max(px) AS max_px,
         |    min(py) AS min_py, max(py) AS max_py,
         |    count(*)::BIGINT AS n_rows,
         |    sum(CASE WHEN px BETWEEN $P1Lo AND $P1Hi THEN 1 ELSE 0
         |      END)::BIGINT AS rows_p1,
         |    sum(CASE WHEN py BETWEEN $P2Lo AND $P2Hi THEN 1 ELSE 0
         |      END)::BIGINT AS rows_p2
         |  FROM lf GROUP BY layout, file)
         |SELECT layout, count(*)::BIGINT AS files_total,
         |  sum(CASE WHEN NOT (min_px > $P1Hi OR max_px < $P1Lo)
         |    THEN 1 ELSE 0 END)::BIGINT AS files_scanned_p1,
         |  sum(CASE WHEN NOT (min_px > $P1Hi OR max_px < $P1Lo)
         |    THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned_p1,
         |  sum(rows_p1)::BIGINT AS rows_match_p1,
         |  sum(CASE WHEN NOT (min_py > $P2Hi OR max_py < $P2Lo)
         |    THEN 1 ELSE 0 END)::BIGINT AS files_scanned_p2,
         |  sum(CASE WHEN NOT (min_py > $P2Hi OR max_py < $P2Lo)
         |    THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned_p2,
         |  sum(rows_p2)::BIGINT AS rows_match_p2
         |FROM z GROUP BY layout""".stripMargin,
    "rel_range_join_binned" ->
      s"""WITH bands AS (
         |  SELECT range AS k,
         |    range / 4.0 + (range % 7) / 64.0 AS lo,
         |    (range + 1) / 4.0 + ((range + 1) % 7) / 64.0 AS hi
         |  FROM range(0, $NumBands))
         |SELECT k, lo, count(*)::BIGINT AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
         |FROM events e JOIN bands b
         |  ON e.value >= b.lo AND e.value < b.hi
         |GROUP BY k, lo""".stripMargin
  )
}
