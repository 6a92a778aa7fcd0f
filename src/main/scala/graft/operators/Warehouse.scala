package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H optimizer-shape pack (SURVEY.md §2.7 widening): the multi-join /
  * subquery report shapes [[Relational]] does not already cover, each
  * chosen to exercise a DIFFERENT Catalyst capability a 100 TB warehouse
  * user leans on daily:
  *
  *   - [[localSupplierVolume]] (Q5 shape)  — 6-table join reorder with a
  *     non-hierarchical correlation (customer and supplier must share a
  *     nation), dimension filters reducing fact scans transitively.
  *   - [[nationTradeVolume]] (Q7 shape)    — the same dimension joined
  *     twice under different roles, with a disjunctive cross-role pair
  *     predicate evaluated after both broadcasts.
  *   - [[promoRevenue]] (Q14 shape)        — conditional-aggregate ratio
  *     in one pass (no second scan for the numerator).
  *   - [[topSupplier]] (Q15 shape)         — scalar aggregate subquery
  *     (global max) applied via a 1-row broadcast, never a global sort.
  *   - [[smallQtyRevenue]] (Q17 shape)     — correlated per-key average
  *     subquery, decorrelated into ONE window pass (single fact scan).
  *   - [[disjunctiveRevenue]] (Q19 shape)  — OR-of-conjuncts across both
  *     join sides: the equi-join key must still factor out, and the
  *     implied coarse ranges must still reach the scans.
  *   - [[idleCustomers]] (Q22 shape)       — global scalar threshold +
  *     NOT EXISTS anti-join, in exact arithmetic.
  *   - [[lateOrderPriority]] (Q4 shape)    — EXISTS as a semi-join whose
  *     condition mixes equi and cross-table non-equi parts.
  *   - [[soleLateSupplier]] (Q21 shape)    — one derived fact in three
  *     roles: probe, self semi-join, self anti-join, each with a
  *     supplier-key inequality beside the order-key equality.
  *   - [[importantSuppliers]] (Q11 shape)  — grouped aggregate kept only
  *     where it exceeds a fraction of its own global total.
  *
  * The reference engine (whiker92/MapReduce_code) has no optimizer at all
  * — every one of these shapes would be a hand-sequenced MR job chain
  * (cf. the manual two-job pipeline in apriori_final.java:49-160); here
  * each is one declarative plan Catalyst reorders, pushes down, and
  * broadcasts.
  *
  * Cross-engine determinism discipline (see [[Relational]]): float SUMs
  * ride DECIMAL(24,6); every scalar-subquery comparison is restated in
  * exact integer/decimal arithmetic so both engines compute identical
  * booleans; timestamps compare as raw NTZ values (pushdown-friendly)
  * against literals.
  */
object Warehouse {

  /** Exact decimal sum of a double expression, surfaced back as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(24,6)")).cast("double")

  /** TIMESTAMP_NTZ literal matching the parquet column type, so raw-column
    * comparisons reach the scan as PushedFilters (the ShipCut pattern,
    * Relational.scala:248-254).
    */
  private def ts(s: String): Column =
    lit(java.time.LocalDateTime.parse(s + "T00:00:00"))

  private def rev: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---- Q5 shape: local supplier volume ----

  /** Revenue shipped within one region by suppliers to customers of the
    * SAME nation, per nation. The join graph is not a star: the
    * `c_nationkey = s_nationkey` edge correlates two different fact
    * foreign keys, so join ORDER matters. Written filter-first: the
    * 5-row region filter reduces nation (25 rows) before either
    * broadcast, suppliers shrink 5× before touching lineitem, and the
    * order-date filter is pushed to the orders scan — the fact table is
    * never joined against an unfiltered dimension.
    */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asian = Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region").where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(asian), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_nationkey", "n_name")
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey") &&
        supp("s_nationkey") === cust("c_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
  }

  // ---- Q7 shape: cross-nation trade volume ----

  /** The two trading nations of [[nationTradeVolume]]. */
  val TradeNationA = "NATION_1"
  val TradeNationB = "NATION_2"

  /** Yearly shipping volume between two nations, in both directions.
    * nation joins the plan TWICE under different roles (supplier's vs
    * customer's); each copy broadcasts pre-filtered to the two names (a
    * 12.5× fact reduction before the orders join), and the directional
    * pair predicate — an OR spanning BOTH copies, so no single join can
    * evaluate it — filters after the second broadcast.
    */
  def nationTradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables(spark, dir, "nation")
      .where(col("n_name").isin(TradeNationA, TradeNationB))
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.select(col("n_nationkey"),
        col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
      .join(broadcast(nat.select(col("n_nationkey").as("n2_nationkey"),
        col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("n2_nationkey"))
      .select("c_custkey", "cust_nation")
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), rev.as("rev"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .where((col("supp_nation") === TradeNationA &&
        col("cust_nation") === TradeNationB) ||
        (col("supp_nation") === TradeNationB &&
          col("cust_nation") === TradeNationA))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
  }

  // ---- Q6 shape: forecasting revenue change ----

  /** Revenue increase from lifting narrow-band discounts for one year —
    * the no-join TPC-H shape: three range predicates ALL pushed to the
    * parquet scan (year of shipdate, discount band, quantity cap), one
    * global aggregate. The simplest query in the pack and the purest
    * pushdown demonstration: at 100 TB the scan reads only row groups
    * whose min/max stats intersect all three ranges.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  // ---- Q8 shape: national market share ----

  /** [[TradeNationA]]'s market share of ECONOMY-part revenue sold to
    * ASIA-region customers, by order year. The widest join in the pack
    * (7 tables, nation in BOTH roles again) topped by a conditional
    * ratio per group: numerator and denominator aggregate in the same
    * pass, so the plan is the join tree + ONE aggregation. Selective
    * dimensions (part type, region) are filtered before their joins;
    * the supplier-side nation only decorates (no filter), so it stays a
    * broadcast decoration join.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_type") === "ECONOMY").select("p_partkey")
    val asianCust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
      .join(broadcast(Tables(spark, dir, "nation")
        .join(Tables(spark, dir, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables(spark, dir, "nation")
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        rev.as("rev"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === ord("o_orderkey"))
      .join(asianCust, ord("o_custkey") === asianCust("c_custkey"))
      .join(supp, col("l_suppkey") === supp("s_suppkey"))
      .groupBy("o_year")
      .agg(
        dsum(when(col("supp_nation") === TradeNationA, col("rev"))
          .otherwise(lit(0.0))).as("nation_volume"),
        dsum(col("rev")).as("total_volume"),
        count(lit(1)).as("n_items"))
      .select(col("o_year"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"),
        col("nation_volume"), col("total_volume"), col("n_items"))
  }

  // ---- Q14 shape: promo revenue ratio ----

  /** Share of one month's revenue from promotional parts: numerator
    * (conditional) and denominator (total) aggregate in the SAME pass —
    * one scan, one join, two sums — instead of the two-query form a
    * naive ratio computes. Both sums are exact decimals; the single
    * double division is then bit-identical across engines.
    */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1997-09-01") &&
        col("l_shipdate") < ts("1997-10-01"))
      .select(col("l_partkey"), rev.as("rev"))
    val part = Tables(spark, dir, "part").select("p_partkey", "p_type")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        dsum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0.0)))
          .as("promo_revenue"),
        dsum(col("rev")).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(
        (lit(100.0) * col("promo_revenue") / col("total_revenue"))
          .as("promo_pct"),
        col("promo_revenue"), col("total_revenue"), col("n_items"))
  }

  // ---- Q15 shape: top supplier by quarterly revenue ----

  /** Supplier(s) with the maximum revenue over one quarter. The global
    * max is a scalar aggregate subquery: computed as a 1-row aggregate
    * and applied via broadcast — the revenue table is scanned once,
    * never globally sorted, and ties are kept (same semantics as the
    * correlated `= (SELECT max …)`). Revenue stays DECIMAL through the
    * equality (exact), cast to double only on output.
    */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev.cast("decimal(24,6)")).as("rev_dec"))
      // referenced by BOTH the max aggregate and the equality side: cut
      // here so the filtered lineitem scan + aggregation run once (the
      // table is one row per supplier — small at any scale)
      .localCheckpoint()
    val maxRev = perSupp.agg(max(col("rev_dec")).as("max_rev"))
    val supp = Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    perSupp
      .crossJoin(broadcast(maxRev))
      .where(col("rev_dec") === col("max_rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  // ---- Q17 shape: small-quantity revenue (correlated average) ----

  val SmallQtyBrand = "Brand#23"
  val SmallQtyMaxSize = 10

  /** Average yearly revenue lost if small-quantity orders (below 20% of
    * their part's average quantity) were no longer filled. The textbook
    * correlated scalar subquery — `l_quantity < 0.2 · avg(per part)` —
    * decorrelated into ONE window pass over the part key: lineitem is
    * scanned once (the self-join a literal decorrelation produces would
    * scan it twice), the filtered part side broadcasts, and count+sum
    * share a single Window node. The predicate is restated in exact
    * int64 arithmetic (5·qty·n < Σqty ⟺ qty < 0.2·avg; fixture
    * quantities are integral, asserted by the oracle's own match) so no
    * float average can diverge between engines.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_brand") === SmallQtyBrand &&
        col("p_size") <= SmallQtyMaxSize)
      .select("p_partkey")
    val w = Window.partitionBy(col("l_partkey"))
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      // both per-part aggregates in ONE projection → a single Window
      // node and a single exchange on l_partkey
      .select(col("qty"), col("l_extendedprice"),
        count(lit(1)).over(w).as("n_li"),
        sum(col("qty")).over(w).as("qty_sum"))
      .where(col("qty") * lit(5L) * col("n_li") < col("qty_sum"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  // ---- Q19 shape: disjunctive predicate revenue ----

  /** The three (brand, max size, quantity range) branches. */
  val DisjunctiveBranches: Seq[(String, Int, Double, Double)] = Seq(
    ("Brand#12", 5, 1.0, 11.0),
    ("Brand#23", 10, 10.0, 20.0),
    ("Brand#34", 15, 20.0, 30.0))

  /** Revenue from three disjoint (brand, size, quantity) corners — an
    * OR-of-conjuncts spanning BOTH join sides. Two plan hazards, both
    * handled: (1) the common `l_partkey = p_partkey` must factor out of
    * the OR so the join stays an equi-join (written factored); (2)
    * Catalyst does not derive implied ranges from a disjunction, so the
    * coarse bounds each side implies (quantity ∈ [1,30], brand ∈ the
    * three, size ≥ 1) are written explicitly where the scans see them —
    * at 100 TB that is the difference between scanning 2% and 100% of
    * lineitem row groups.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val qLo = DisjunctiveBranches.map(_._3).min
    val qHi = DisjunctiveBranches.map(_._4).max
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_quantity") >= qLo && col("l_quantity") <= qHi)
      .select(col("l_partkey"), col("l_quantity"), rev.as("rev"))
    val part = Tables(spark, dir, "part")
      .where(col("p_brand").isin(DisjunctiveBranches.map(_._1): _*) &&
        col("p_size") >= 1 &&
        col("p_size") <= DisjunctiveBranches.map(_._2).max)
      .select("p_partkey", "p_brand", "p_size")
    val branch = DisjunctiveBranches.map { case (b, sz, lo, hi) =>
      col("p_brand") === b && col("p_size") <= sz &&
        col("l_quantity") >= lo && col("l_quantity") <= hi
    }.reduce(_ || _)
    li.join(part, col("l_partkey") === col("p_partkey"))
      .where(branch)
      .groupBy("p_brand")
      .agg(dsum(col("rev")).as("revenue"), count(lit(1)).as("n_items"))
  }

  // ---- Q22 shape: idle high-balance customers ----

  /** Customers above the positive-balance average who never ordered,
    * summarized per market segment. The global average is a scalar
    * subquery → a 1-row (count, Σ) aggregate broadcast to every
    * partition; the threshold is evaluated as exact decimal
    * `bal · n > Σ` (never a float average); "never ordered" is a
    * NOT EXISTS anti-join. The count rides DECIMAL(14,0) so the product
    * stays within DECIMAL(38,6) in BOTH engines (DuckDB silently widens
    * an over-width decimal product to DOUBLE, which would break
    * exactness).
    */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val bal = cust.where(col("c_acctbal") > 0.0)
      .agg(count(lit(1)).cast("decimal(14,0)").as("n_pos"),
        sum(col("c_acctbal").cast("decimal(24,6)")).as("bal_sum"))
    val ord = Tables(spark, dir, "orders").select("o_custkey")
    cust
      .crossJoin(broadcast(bal))
      .where(col("c_acctbal").cast("decimal(24,6)") * col("n_pos") >
        col("bal_sum"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
  }

  // ---- Q4 shape: late-order priority check ----

  /** Order-priority histogram over orders having at least one lineitem
    * shipped more than 60 days after the order date (TPC-H Q4 shape,
    * restated on this schema: lateness is ship-vs-ORDER-date — the
    * fixture has no commit/receipt dates). The EXISTS becomes a LEFT
    * SEMI join whose condition mixes the equi part (`l_orderkey =
    * o_orderkey`) with a non-equi part referencing BOTH sides
    * (`l_shipdate > o_orderdate + 60 days`): the late predicate cannot
    * be pushed to either scan alone, so it must ride the hash join as a
    * post-probe filter — the capability Q4 exists to exercise. Contrast
    * [[Relational.prioritySemiJoin]] (J1), whose lineitem filter is
    * side-local and the semi-join purely equi.
    */
  def lateOrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  // ---- Q21 shape: sole late supplier on multi-supplier orders ----

  /** Suppliers who were the ONLY late shipper on a finished ('F')
    * multi-supplier order (TPC-H Q21 shape; late := shipped > 75 days
    * after the order date, restated as in [[lateOrderPriority]]). One
    * derived fact — lineitem ⋈ finished orders with a lateness flag —
    * is consumed in THREE roles: the probe side, an EXISTS (another
    * supplier on the same order → LEFT SEMI whose condition carries a
    * supplier-key INEQUALITY next to the order-key equality), and a
    * NOT EXISTS (no OTHER supplier also late → LEFT ANTI, same
    * correlation pattern plus the flag). Per-role column pruning makes
    * the three subplans distinct, so each re-derives from the two
    * scans; at 100 TB the derived fact is what you'd materialize once
    * (the Dedup family's Materialize.Local seam is that call). The
    * supplier dimension broadcasts onto the final 100-row aggregate.
    */
  def soleLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val f = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
          .as("late"))
    val others = f.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val lateOthers = f.where(col("late"))
      .select(col("ok").as("ok3"), col("sk").as("sk3"))
    val supp = Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    f.where(col("late"))
      .join(others,
        col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(lateOthers,
        col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      .groupBy("sk")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supp), col("sk") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  // ---- Q11 shape: important suppliers by share of global revenue ----

  /** Suppliers whose revenue exceeds 1/98 of GLOBAL revenue (TPC-H
    * Q11's grouped-aggregate-vs-fraction-of-global-total shape, on the
    * revenue ledger — the fixture has no partsupp). The same
    * per-supplier aggregate feeds both the kept rows and the 1-row
    * global total that broadcasts back over them; the threshold is
    * exact decimal (`rev · 98 > Σrev` — never a float fraction, the
    * [[idleCustomers]] discipline), and the reported share divides as
    * IEEE double only at output. At 100 TB the per-supplier aggregate
    * is tiny (one row per supplier), so the second pass over it costs
    * nothing; the one large shuffle is the groupBy both consumers
    * share.
    */
  def importantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(rev.cast("decimal(24,6)")).cast("decimal(24,6)").as("rev"))
    val g = s.agg(sum(col("rev")).cast("decimal(30,6)").as("tot"))
    val supp = Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    s.crossJoin(broadcast(g))
      .where(col("rev") * lit(98).cast("decimal(3,0)") > col("tot"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev").cast("double").as("revenue"),
        (col("rev").cast("double") / col("tot").cast("double")).as("share"))
  }

  // ---- Q2 shape: cheapest supplier per part ----

  /** For every SMALL-type part of size ≤ 15, the supplier(s) whose best
    * (minimum) unit sale price for that part equals the part's global
    * minimum (TPC-H Q2's correlated-min shape; the fixture has no
    * partsupp, so the part↔supplier bridge and the "cost" both come
    * from the sales ledger — unit price = l_extendedprice/l_quantity,
    * one exactly-rounded IEEE division per row, bit-equal in both
    * engines). The correlated `= (SELECT min(..) WHERE ps_partkey =
    * p_partkey)` decorrelates into ONE pass: aggregate min unit price
    * per (part, supplier), then a window-min per part over that tiny
    * aggregate — the [[smallQtyRevenue]] discipline, except the window
    * rides the POST-aggregate rows (one row per pair), so the extra
    * exchange is proportional to the pair count, never the fact table.
    * The 15%-of-part dimension filter broadcasts into the fact scan
    * before any aggregation.
    */
  def cheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_type") === "SMALL" && col("p_size") <= 15)
      .select("p_partkey", "p_name")
    val pairs = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("p_name"))
      .agg(min(col("unit_price")).as("best_price"))
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    pairs
      .withColumn("part_min", min(col("best_price")).over(
        Window.partitionBy(col("l_partkey"))))
      .where(col("best_price") === col("part_min"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"),
        col("s_name"), col("n_name"), col("best_price"))
  }

  // ---- Q9 shape: product-line profit by nation and year ----

  /** Profit on red parts per supplier nation per order year (TPC-H Q9
    * shape: the widest join in the suite — lineitem against part,
    * supplier, orders, nation — with amount arithmetic mixing columns
    * of THREE tables, so no single join can pre-reduce the expression;
    * the fixture has no ps_supplycost, so cost is restated as
    * 0.5 · p_retailprice · l_quantity). Group keys come from two
    * different dimensions (nation via supplier, year via orders) —
    * the aggregation can only run above the full join, which is the
    * Q9 stress: Catalyst must still broadcast all three dimension
    * sides and leave lineitem as the lone big probe. `year()` is
    * evaluated on the raw NTZ timestamp identically in both engines;
    * the profit SUM rides the DECIMAL(24,6) discipline.
    */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_name").startsWith("red "))
      .select("p_partkey", "p_retailprice")
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    Tables(spark, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(dsum(rev - lit(0.5) * col("p_retailprice") * col("l_quantity"))
        .as("profit"), count(lit(1)).as("n_items"))
  }

  // ---- Q12 shape: order-priority mix per return flag ----

  /** High- vs low-priority order counts per lineitem return flag for
    * one ship year (TPC-H Q12's conditional two-way aggregate; the
    * fixture has no l_shipmode/commitdate, so the group key is the
    * return flag and the date window is on l_shipdate). The year
    * window is pushed to the lineitem scan; the join carries only
    * (orderkey, priority); the CASE branches aggregate in ONE pass —
    * never two scans for the two counts.
    */
  def priorityMix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .select("l_orderkey", "l_returnflag")
    val ord = Tables(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count_if(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("high_line_count"),
        count_if(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("low_line_count"))
  }

  // ---- Q16 shape: supplier diversity per brand/type ----

  /** Distinct-supplier counts per (brand, type) for mid-size parts,
    * excluding delinquent suppliers (TPC-H Q16 shape: COUNT DISTINCT
    * above a NOT-IN exclusion; the fixture has no partsupp or
    * s_comment, so the bridge is the distinct (part, supplier) pairs
    * of the sales ledger and "complaints" is a negative account
    * balance). The exclusion list is a broadcast LEFT ANTI join — the
    * NOT IN subquery's safe form (no null-key hazards: keys are
    * non-null by construction). The distinct runs INSIDE the
    * aggregation (one shuffle carries dedup + count); the brand/size
    * filters reach the part scan.
    */
  def supplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_brand") =!= "Brand#5" &&
        col("p_size").isin(10, 20, 30, 40, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val delinquent = Tables(spark, dir, "supplier")
      .where(col("s_acctbal") < 0.0).select(col("s_suppkey").as("bad_sk"))
    Tables(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(delinquent), col("l_suppkey") === col("bad_sk"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  // ---- Q20 shape: suppliers with an excess share of a part line ----

  /** Suppliers who shipped MORE THAN HALF of some red part's total 1997
    * quantity (TPC-H Q20's nested-aggregate-threshold shape: the
    * original's `ps_availqty > 0.5 · sum(l_quantity)` correlated
    * subquery restated as a share-of-total test on the sales ledger).
    * Per-(part, supplier) 1997 quantities aggregate once; the part's
    * total is a window SUM over that aggregate (the [[cheapestSupplier]]
    * decorrelation); the half test is EXACT — quantities sum as
    * DECIMAL(24,6) and the comparison is `2·q > total`, never a float
    * fraction (the [[idleCustomers]] discipline). Qualifying pairs
    * collapse to distinct suppliers via the groupBy, then the supplier
    * and nation dims broadcast onto rows that number at most the
    * supplier count.
    */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
      .where(col("p_name").startsWith("red "))
      .select("p_partkey")
    val pairs = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(24,6)")).as("q"))
    val supp = Tables(spark, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    pairs
      .withColumn("tot", sum(col("q")).over(
        Window.partitionBy(col("l_partkey"))))
      .where(col("q") * lit(2).cast("decimal(2,0)") > col("tot"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominated_parts"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_dominated_parts"))
  }

  /** Rank depth for [[rankMovers]] — only the head of each quarter's
    * revenue ranking is compared, which is also what keeps the plan
    * scalable: the rank cut is WindowGroupLimit-eligible, so the
    * per-quarter ranking prunes to ≤ this per input partition instead
    * of ranking every customer.
    */
  val MoversTopK = 50L

  /** Quarter-over-quarter revenue-rank movers — the leaderboard-drift
    * dashboard: for each adjacent quarter pair, every customer in
    * either quarter's top-[[MoversTopK]] by discounted revenue, with
    * both ranks and the signed movement (absent side priced at
    * K + 1, the standard leaderboard convention, so entries and exits
    * carry a defined magnitude). First quarter has no predecessor and
    * is reported only as the `prev` side of its successor.
    *
    * Exactness: revenue sums ride DECIMAL(24,6) (order-insensitive),
    * ranks and deltas are integers. Shape: one fact aggregation, two
    * rank-cut windows over it, one aligned full-outer join on
    * (quarter, customer), and the quarter list broadcasts.
    */
  def rankMovers(spark: SparkSession, dir: String): DataFrame =
    rankMoversOf(
      Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate"),
      Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"))

  def rankMoversOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = orders
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy((year(col("o_orderdate")).cast("long") * 4
        + quarter(col("o_orderdate")).cast("long")).as("qid"),
        col("o_custkey").as("c_custkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,6)")).as("rev"))
    val ranked = rev
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("rev").desc, col("c_custkey"))).cast("long"))
      .where(col("rk") <= MoversTopK)
      .select(col("qid"), col("c_custkey"), col("rk"))
    val prev = ranked.select((col("qid") + 1).as("qid"),
      col("c_custkey"), col("rk").as("rank_prev"))
    val quarters = rev.select("qid").distinct()
    prev.join(ranked.select(col("qid"), col("c_custkey"),
        col("rk").as("rank_curr")), Seq("qid", "c_custkey"),
        "full_outer")
      .join(broadcast(quarters), "qid")
      .select(col("qid"), col("c_custkey"),
        col("rank_prev"), col("rank_curr"),
        (coalesce(col("rank_prev"), lit(MoversTopK + 1))
          - coalesce(col("rank_curr"), lit(MoversTopK + 1)))
          .as("moved_up"))
  }

  /** Skyline (Pareto frontier) of the part catalog — every part no
    * other part beats on BOTH axes at once (lower-or-equal retail
    * price AND greater-or-equal size, strictly better on at least
    * one): the multi-objective "best tradeoffs" operator (Börzsönyi's
    * SKYLINE OF, ICDE 2001) warehouses bolt on for supplier/product
    * selection. Equal-point ties all survive (neither dominates).
    * (p_partkey, price, size).
    *
    * Scale shape — the naive form is a quadratic NOT-EXISTS self-join,
    * and the textbook sort-scan form is a GLOBAL price-ordered running
    * max, i.e. one partition eating the catalog. Here the running max
    * decomposes exactly like [[graft.operators.Curation]]'s prefix
    * sums: collapse to per-price best size (one map-side-combined
    * aggregate — distinct prices, so the within-bucket window below
    * has no peer-row ambiguity), bucket prices by integer dollar
    * (floor, order-preserving: every price in a lower bucket is
    * strictly smaller), take the per-bucket max-size table — bounded
    * by the PRICE DOMAIN, never the row count — through one tiny
    * exclusive prefix-max window (the lone unpartitioned window,
    * pinned in WindowBoundSpec), and evaluate the strict-prefix test
    * per price under a PARTITIONED per-bucket window: a price is on
    * the frontier iff its best size beats both the in-bucket exclusive
    * running max and the broadcast lower-bucket max. Rows join back by
    * price to recover ties. Nothing catalog-scale ever crosses a
    * single-partition stage, and the frontier test stays exact
    * integer/double comparisons.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size")))

  def skylineOf(pts: DataFrame): DataFrame = {
    val best = pts.groupBy("price").agg(max(col("size")).as("psmax"))
      .withColumn("g", floor(col("price")).cast("long"))
    // ≤ |integer price domain| rows: exclusive prefix max over buckets
    val pref = best.groupBy("g").agg(max(col("psmax")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(
        Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)))
      .select("g", "pmax")
    val inb = Window.partitionBy("g").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best.join(broadcast(pref), "g")
      .withColumn("lt", greatest(
        coalesce(max(col("psmax")).over(inb), lit(Long.MinValue)),
        coalesce(col("pmax"), lit(Long.MinValue))))
      .where(col("psmax") > col("lt"))
      .select("price", "psmax")
    pts.join(frontier, "price")
      .where(col("size") === col("psmax"))
      .select(col("p_partkey"), col("price"), col("size"))
  }

  /** Benford reference shares log10(1 + 1/d), d = 1..9, computed once
    * and injected as LITERALS on both engines (Double.toString
    * round-trips exactly; the oracle re-parses the same text as
    * DOUBLE) — no transcendental ever evaluates inside a query, the
    * [[graft.operators.Sketch]] LcTable discipline.
    */
  val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** Benford first-digit audit of the lineitem ledger (Newcomb 1881,
    * Benford 1938; Nigrini's fraud-screening standard): the observed
    * first-significant-digit distribution of l_extendedprice against
    * the log10(1+1/d) reference, per digit — the data-quality screen
    * a warehouse runs over any organically-generated numeric column,
    * where fabricated or truncated feeds surface as digit-share spikes
    * (the fixture's synthetic price model itself shows a measurable
    * non-Benford shape, which is exactly what the audit is FOR).
    * (digit, n, share, benford_p, abs_dev).
    *
    * Scale shape: one row-local digit projection + one map-side
    * combined 9-group aggregate; the 1-row total broadcasts back
    * ([[topSupplier]]'s scalar pattern — no unpartitioned window).
    * Digits are exact string heads of exact floor() integers; the only
    * floats are one share division and one literal subtraction.
    */
  def benford(spark: SparkSession, dir: String): DataFrame =
    benfordOf(Tables(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("v")))

  def benfordOf(vals: DataFrame): DataFrame = {
    val digits = vals
      .select(substring(floor(col("v")).cast("bigint").cast("string"),
        1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    val p = BenfordP.foldRight(lit(0.0): Column) {
      case ((d, pd), acc) =>
        when(col("digit") === d.toLong, lit(pd)).otherwise(acc)
    }
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total").cast("double"))
          .as("share"), p.as("benford_p"))
      .withColumn("abs_dev", abs(col("share") - col("benford_p")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_benford" -> benford,
    "rel_skyline" -> skyline,
    "rel_rank_movers" -> rankMovers,
    "rel_cheapest_supplier" -> cheapestSupplier,
    "rel_product_profit" -> productProfit,
    "rel_priority_mix" -> priorityMix,
    "rel_supplier_cnt" -> supplierCnt,
    "rel_excess_suppliers" -> excessSuppliers,
    "rel_late_order_priority" -> lateOrderPriority,
    "rel_sole_late_supplier" -> soleLateSupplier,
    "rel_important_suppliers" -> importantSuppliers,
    "rel_local_supplier_volume" -> localSupplierVolume,
    "rel_nation_trade_volume" -> nationTradeVolume,
    "rel_forecast_revenue" -> forecastRevenue,
    "rel_market_share" -> marketShare,
    "rel_promo_revenue" -> promoRevenue,
    "rel_top_supplier" -> topSupplier,
    "rel_small_qty_revenue" -> smallQtyRevenue,
    "rel_disjunctive_revenue" -> disjunctiveRevenue,
    "rel_idle_customers" -> idleCustomers
  )

  val oracle: Map[String, String] = Map(
    // the same literal reference shares re-parsed as DOUBLE (e0 forces
    // double typing; bare decimals parse as DECIMAL in DuckDB)
    "rel_benford" -> {
      val cases = BenfordP.map { case (d, pd) =>
        s"WHEN $d THEN ${pd}e0" }.mkString(" ")
      s"""WITH dg AS (
         |  SELECT substr(floor(l_extendedprice)::BIGINT::VARCHAR,
         |    1, 1)::BIGINT AS digit
         |  FROM lineitem),
         |c AS (SELECT digit, count(*)::BIGINT AS n FROM dg GROUP BY 1),
         |t AS (SELECT sum(n)::BIGINT AS total FROM c)
         |SELECT digit, n, n::DOUBLE / total::DOUBLE AS share,
         |  (CASE digit $cases ELSE 0.0e0 END) AS benford_p,
         |  abs(n::DOUBLE / total::DOUBLE
         |    - (CASE digit $cases ELSE 0.0e0 END)) AS abs_dev
         |FROM c, t""".stripMargin
    },
    // the declarative dominance definition — quadratic in DuckDB, which
    // is exactly the point: the engine's bucketed prefix-max plan must
    // reproduce the textbook NOT EXISTS semantics bit-for-bit
    "rel_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice AS price,
        |  p.p_size::BIGINT AS size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part o
        |  WHERE o.p_retailprice <= p.p_retailprice
        |    AND o.p_size >= p.p_size
        |    AND (o.p_retailprice < p.p_retailprice
        |      OR o.p_size > p.p_size))""".stripMargin,
    "rel_rank_movers" ->
      s"""WITH rev AS (
         |  SELECT (year(o_orderdate) * 4
         |      + quarter(o_orderdate))::BIGINT AS qid,
         |    o_custkey AS c_custkey,
         |    SUM(CAST(l_extendedprice * (1.0e0 - l_discount)
         |      AS DECIMAL(24,6))) AS rev
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, c_custkey, rk FROM (
         |    SELECT qid, c_custkey, row_number() OVER (
         |      PARTITION BY qid ORDER BY rev DESC, c_custkey
         |    )::BIGINT AS rk FROM rev)
         |  WHERE rk <= $MoversTopK),
         |qs AS (SELECT DISTINCT qid FROM rev),
         |pv AS (SELECT qid + 1 AS qid, c_custkey, rk AS rank_prev
         |       FROM ranked),
         |cu AS (SELECT qid, c_custkey, rk AS rank_curr FROM ranked)
         |SELECT q.qid, coalesce(pv.c_custkey, cu.c_custkey)
         |    AS c_custkey,
         |  pv.rank_prev, cu.rank_curr,
         |  (coalesce(pv.rank_prev, ${MoversTopK + 1})
         |    - coalesce(cu.rank_curr, ${MoversTopK + 1}))::BIGINT
         |    AS moved_up
         |FROM pv FULL OUTER JOIN cu
         |  ON cu.qid = pv.qid AND cu.c_custkey = pv.c_custkey
         |JOIN qs q ON q.qid = coalesce(pv.qid, cu.qid)""".stripMargin,
    "rel_cheapest_supplier" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey, p_name,
        |    min(l_extendedprice / l_quantity) AS best_price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'SMALL' AND p_size <= 15
        |  GROUP BY l_partkey, l_suppkey, p_name),
        |winmin AS (
        |  SELECT *, min(best_price) OVER (PARTITION BY l_partkey)
        |    AS part_min FROM pairs)
        |SELECT l_partkey AS p_partkey, p_name, s_name, n_name, best_price
        |FROM winmin
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE best_price = part_min""".stripMargin,
    "rel_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    - 0.5 * p_retailprice * l_quantity
        |    AS DECIMAL(24,6))) AS DOUBLE) AS profit,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE 'red %'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "rel_priority_mix" ->
      """SELECT l_returnflag,
        |  count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS high_line_count,
        |  count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag""".stripMargin,
    "rel_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (10, 20, 30, 40, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "rel_excess_suppliers" ->
      """WITH pairs AS (
        |  SELECT l_partkey, l_suppkey,
        |    SUM(CAST(l_quantity AS DECIMAL(24,6))) AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red %'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l_partkey, l_suppkey),
        |dominated AS (
        |  SELECT l_suppkey, count(*) AS n_dominated_parts FROM (
        |    SELECT *, sum(q) OVER (PARTITION BY l_partkey) AS tot
        |    FROM pairs)
        |  WHERE q * 2 > tot
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, n_name, n_dominated_parts
        |FROM dominated
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "rel_late_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "rel_sole_late_supplier" ->
      """WITH f AS MATERIALIZED (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |         l_shipdate > o_orderdate + INTERVAL 75 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_suppkey, s_name, numwait
        |FROM (SELECT sk, count(*) AS numwait FROM f l1
        |      WHERE l1.late
        |        AND EXISTS (SELECT 1 FROM f l2
        |              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |        AND NOT EXISTS (SELECT 1 FROM f l3
        |              WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late)
        |      GROUP BY sk) w
        |JOIN supplier ON sk = s_suppkey""".stripMargin,
    "rel_important_suppliers" ->
      """WITH s AS MATERIALIZED (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(24,6))) AS DECIMAL(24,6)) AS rev
        |  FROM lineitem GROUP BY l_suppkey),
        |g AS MATERIALIZED (
        |  SELECT CAST(SUM(rev) AS DECIMAL(30,6)) AS tot FROM s)
        |SELECT s_suppkey, s_name,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM s CROSS JOIN g
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev * CAST(98 AS DECIMAL(3,0)) > tot""".stripMargin,
    "rel_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "rel_nation_trade_volume" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(SUM(CAST(volume AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |        year(l_shipdate) AS l_year,
         |        l_extendedprice * (1.0 - l_discount) AS volume
         |      FROM lineitem
         |      JOIN supplier ON l_suppkey = s_suppkey
         |      JOIN orders ON l_orderkey = o_orderkey
         |      JOIN customer ON o_custkey = c_custkey
         |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |      WHERE ((n1.n_name = '$TradeNationA'
         |              AND n2.n_name = '$TradeNationB')
         |          OR (n1.n_name = '$TradeNationB'
         |              AND n2.n_name = '$TradeNationA'))
         |        AND l_shipdate >= TIMESTAMP '1996-01-01'
         |        AND l_shipdate < TIMESTAMP '1998-01-01')
         |GROUP BY supp_nation, cust_nation, l_year""".stripMargin,
    "rel_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "rel_market_share" ->
      s"""SELECT o_year, nation_volume / total_volume AS mkt_share,
         |  nation_volume, total_volume, n_items
         |FROM (SELECT year(o_orderdate) AS o_year,
         |  CAST(SUM(CAST(CASE WHEN n2.n_name = '$TradeNationA'
         |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
         |    AS DECIMAL(24,6))) AS DOUBLE) AS nation_volume,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |    AS DECIMAL(24,6))) AS DOUBLE) AS total_volume,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY year(o_orderdate))""".stripMargin,
    "rel_promo_revenue" ->
      """SELECT 100.0 * promo_revenue / total_revenue AS promo_pct,
        |  promo_revenue, total_revenue, n_items
        |FROM (SELECT
        |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
        |    AS DECIMAL(24,6))) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(24,6))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01')""".stripMargin,
    "rel_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(24,6))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)""".stripMargin,
    "rel_small_qty_revenue" ->
      s"""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE)
         |    / 7.0 AS avg_yearly,
         |  count(*) AS n_small
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand = '$SmallQtyBrand' AND p_size <= $SmallQtyMaxSize
         |  AND CAST(l_quantity AS BIGINT) * 5 *
         |      (SELECT count(*) FROM lineitem i
         |       WHERE i.l_partkey = lineitem.l_partkey)
         |    < (SELECT SUM(CAST(i.l_quantity AS BIGINT)) FROM lineitem i
         |       WHERE i.l_partkey = lineitem.l_partkey)""".stripMargin,
    "rel_disjunctive_revenue" -> {
      val branches = DisjunctiveBranches.map { case (b, sz, lo, hi) =>
        s"""(p_brand = '$b' AND p_size BETWEEN 1 AND $sz
           |   AND l_quantity BETWEEN $lo AND $hi)""".stripMargin
      }.mkString("\n  OR ")
      s"""SELECT p_brand,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE $branches
         |GROUP BY p_brand""".stripMargin
    },
    "rel_idle_customers" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6))) AS DOUBLE) AS total_bal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(24,6)) *
        |      CAST((SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
        |        AS DECIMAL(14,0))
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(24,6))) FROM customer
        |       WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment""".stripMargin
  )
}
