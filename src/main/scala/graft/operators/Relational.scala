package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational capability demos over the star schema (SURVEY.md §2.7/§2.11).
  *
  * The reference has no sorts, limits, windows, outer joins, or set ops —
  * its only join shapes are broadcast lookup semi-joins (J1/J2). These
  * queries prove the full relational surface a user of the reference would
  * gain by switching, all with built-in operators Catalyst can optimize.
  *
  * Determinism discipline for the DuckDB oracle: every floating SUM goes
  * through DECIMAL so the result is order-independent (double summation is
  * not associative; a 1000-executor shuffle must not change the answer);
  * every rank/limit has a total-order tiebreaker.
  */
object Relational {

  /** Exact decimal sum of a double expression, surfaced back as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(24,6)")).cast("double")

  /** TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.
    * Exercises scan pushdown (date predicate reaches the Parquet reader)
    * and partial aggregation — the Spark restatement of the reference's
    * Job-1 wordcount shape (apriori_final.java:49-62) on numeric measures.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_quantity") < 50.0)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Shuffled 3-way join: customer ⋈ orders ⋈ nation, revenue per nation.
    * nation (25 rows) broadcasts; customer⋈orders shuffles on the key.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = Tables(spark, dir, "orders").select("o_custkey", "o_totalprice")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    ord
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** Top-3 orders per customer by total price — window row_number with a
    * total-order tiebreaker (o_orderkey) so ranking is deterministic.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
  }

  /** Global sort + limit: 10 priciest parts (tiebreak on p_partkey).
    * Spark's TakeOrderedAndProject avoids a full global sort.
    */
  def topParts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(10)

  /** Set operations over (brand, size) tuples: INTERSECT of the pricey and
    * cheap catalog corners, EXCEPT the largest sizes.
    */
  def brandSetOps(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
    def tuples(pred: Column) =
      part.where(pred).select("p_brand", "p_size").distinct()
    tuples(col("p_retailprice") >= 980.0)
      .intersect(tuples(col("p_retailprice") <= 920.0))
      .except(tuples(col("p_size") >= 40))
  }

  /** ROLLUP aggregation (grouping-set surface): quantity by returnflag /
    * linestatus with subtotals; NULL grouping keys coalesced to 'ALL' so
    * both engines render subtotal rows identically.
    */
  def rollupSales(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  /** CUBE aggregation: all four grouping sets over (returnflag,
    * linestatus) — completes the grouping-set surface next to
    * [[rollupSales]]' hierarchy.
    */
  def cubeSales(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_price"), col("n"))

  /** Anti join: customers with no high-value order (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_name")
    val ord = Tables(spark, dir, "orders")
      .where(col("o_totalprice") > 300000.0).select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
  }

  /** Semi join: order-priority histogram over orders having at least one
    * high-quantity lineitem (EXISTS) — the J1 lookup-join shape on the
    * standard shuffle path instead of broadcast.
    */
  def prioritySemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_orderpriority")
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_quantity") >= 45.0).select(col("l_orderkey"))
    ord.join(li, ord("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Exact distinct aggregation: distinct parts supplied per supplier. */
  def distinctPartsPerSupplier(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_lineitems"))

  /** Order timeline per customer: sequence number, gap to the previous
    * order, cumulative spend — row_number + lag + a running-frame SUM in
    * one pass over a single window partitioning (one shuffle on the
    * customer key serves all three). The running sum goes through
    * DECIMAL so every prefix is exact; timestamps compare as integer
    * microseconds on both engines.
    */
  def orderTimeline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ts_us"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        // NTZ → TZ is the identity instant under the UTC session zone,
        // matching DuckDB's epoch_us on the naive timestamp
        unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("cum_spend",
        sum(col("o_totalprice").cast("decimal(24,6)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select("o_custkey", "o_orderkey", "rn", "gap_us", "cum_spend")
  }

  /** The ranking-function suite in one window: rank / dense_rank /
    * percent_rank / ntile / cume_dist per order priority, top-100 rows
    * kept (the ntile and distribution values are computed over the FULL
    * partition before the filter — same evaluation order in both
    * engines). Ordering is total ((price desc, orderkey)), so every
    * function is deterministic; percent_rank and cume_dist are exact
    * int/int divisions in doubles, bit-equal across engines.
    */
  def rankFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cdist", cume_dist().over(w))
      .where(col("rnk") <= 100)
  }

  /** Explicit GROUPING SETS (the third grouping-set shape next to
    * [[rollupSales]] / [[cubeSales]]): by returnflag only and by
    * linestatus only — a set cube/rollup cannot express (no combined,
    * no grand total). Uses the Spark 4 `groupingSets` Dataset API.
    */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))

  /** Pivot: one row per returnflag, a quantity column per linestatus —
    * `pivot` with EXPLICIT values, which keeps the plan a single pass
    * (no distinct-values pre-query) and the output schema static, the
    * form that scales. The oracle is the equivalent conditional
    * aggregation.
    */
  def pivotSales(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .pivot("l_linestatus", Seq("O", "F"))
      .agg(dsum(col("l_quantity")))
      .withColumnRenamed("O", "qty_o")
      .withColumnRenamed("F", "qty_f")

  /** Exact discrete quantiles (percentile_disc): always an actual data
    * value — no interpolation arithmetic to diverge between engines, so
    * the result hash-matches bit-for-bit (percentile_cont's
    * `a + (b−a)·f` vs `(1−f)·a + f·b` formulations would not). The
    * ordered-set aggregate runs as a regular hash aggregation per group.
    */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)")
          .as("q25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
          .as("q50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)")
          .as("q90"),
        count(lit(1)).as("n"))

  /** TPC-H Q3-shape shipping priority: segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitem, revenue per open
    * order, top 10. The classic selective multi-join: both date
    * predicates and the segment predicate push to the parquet scans
    * (each side is filtered BEFORE its shuffle), and the final top-k is
    * TakeOrderedAndProject — per-partition heaps, no global sort. Dates
    * compare as integer epoch-microseconds on both engines, so there is
    * no timestamp-dialect risk.
    */
  val ShipCutUs = 899251200000000L // 1998-07-01T00:00:00Z

  /** [[ShipCutUs]] as a TIMESTAMP_NTZ literal matching the parquet
    * column type: comparing the RAW column against it (instead of
    * wrapping the column in unix_micros(cast(...))) is what lets the
    * date predicates reach the parquet scan as PushedFilters.
    */
  private val shipCut = lit(java.time.LocalDateTime
    .ofEpochSecond(ShipCutUs / 1000000L, 0, java.time.ZoneOffset.UTC))

  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables(spark, dir, "orders")
      .where(col("o_orderdate") < shipCut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"))
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") > shipCut)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("order_us"), col("o_orderpriority"))
      .agg(dsum(col("rev")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q10-shape returned-item reporting: revenue lost to returned
    * lineitems per customer, top 20. lineitem filters on the return flag
    * at the scan, shuffles once on the order key, once on the customer
    * key; nation (25 rows) broadcasts.
    */
  def returnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val nat = Tables(spark, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(dsum(col("rev")).as("revenue"),
        count(lit(1)).as("n_returned"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Correlated-scalar-subquery shape, decorrelated the way Catalyst
    * would: orders priced above 1.5× their customer's average order.
    * Implemented with ONE window shuffle (sum+count over the customer
    * partition) instead of the aggregate-then-self-join a literal
    * decorrelation produces — half the exchanges for identical
    * semantics. The predicate is exact DECIMAL·INT arithmetic
    * (2·price·n > 3·sum ⟺ price > 1.5·avg) so both engines evaluate the
    * same booleans — no floating-point average anywhere.
    */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        // both aggregates in ONE projection so they share a single
        // Window node (and its single exchange) instead of stacking two
        count(lit(1)).over(w).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(24,6)")).over(w).as("sum_dec"))
      .where(col("o_totalprice").cast("decimal(24,6)")
        * col("n_orders") * 2 > col("sum_dec") * 3)
      .select("o_orderkey", "o_custkey", "o_totalprice", "n_orders")
  }

  /** TPC-H Q13-shape customer order-count distribution: how many
    * customers placed 0, 1, 2 … orders. The outer-join-with-zeros
    * shape, written with the aggregation PUSHED BELOW the join: orders
    * pre-aggregate to one row per customer (map-side partials take the
    * shuffle from |orders| to |customers|), the left join then carries
    * customer-sized sides only, and the final histogram groupBy is
    * #distinct-counts rows. A literal left-join-then-count would
    * shuffle every order row through the join first.
    */
  def customerOrdersDist(spark: SparkSession, dir: String): DataFrame =
    customerOrdersDistOf(
      Tables(spark, dir, "customer").select("c_custkey"),
      Tables(spark, dir, "orders").select("o_custkey"))

  def customerOrdersDistOf(cust: DataFrame, orders: DataFrame): DataFrame = {
    val ordCnt = orders
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    cust.join(ordCnt, cust("c_custkey") === ordCnt("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy("n_orders").agg(count(lit(1)).as("n_custs"))
  }

  /** Summed-quantity threshold above which an order counts as "large"
    * (≈ the top 1% of fixture orders, mirroring TPC-H Q18's intent).
    */
  val BigOrderQty = 250

  /** TPC-H Q18-shape large-volume customers: orders whose summed
    * lineitem quantity clears [[BigOrderQty]], joined to their order and
    * customer rows, top 100 by price. The lineitem aggregation runs
    * BELOW the joins — one corpus-scale shuffle on l_orderkey with
    * map-side partials, emitting only the ~1% of orders that clear the
    * HAVING — so both joins carry filtered-order-sized sides (AQE is
    * free to broadcast them), and the quantity sum is reused from the
    * aggregate instead of recomputed from a second lineitem scan. The
    * final top-k is TakeOrderedAndProject (per-partition heaps, no
    * global sort).
    */
  def bigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > BigOrderQty)
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"))
    val cust = Tables(spark, dir, "customer").select("c_custkey", "c_name")
    big.join(ord, big("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("order_us"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** RANGE-frame window width: 7 days of microseconds. */
  val TrailingUs = 7L * 86400000000L

  /** Trailing 7-day spend per order: a VALUE-range window frame (RANGE
    * BETWEEN 7 days PRECEDING AND CURRENT ROW over epoch-micros), the
    * moving-aggregate shape row-count frames can't express when orders
    * are unevenly spaced. Peers (equal timestamps) are all included by
    * RANGE semantics in both engines; the sum goes through DECIMAL so
    * frame-internal addition order can't matter.
    */
  def trailingSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_us"))
      .rangeBetween(-TrailingUs, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("order_us"),
        col("o_totalprice"))
      // both aggregates in ONE projection → one Window node, the RANGE
      // frames are walked once
      .select(col("*"),
        sum(col("o_totalprice").cast("decimal(24,6)")).over(w)
          .cast("double").as("trailing_spend"),
        count(lit(1)).over(w).as("n_recent"))
  }

  /** The navigation-function suite ([[rankFunctions]]' complement):
    * first_value / last_value / nth_value over an EXPLICIT whole-
    * partition frame (the default running frame makes last_value the
    * current row — the classic window gotcha, avoided identically in
    * both engines) plus lead/lag offsets. Both window specs share one
    * partitioning, so a single exchange serves all five columns; the
    * ordering is total (price desc, orderkey).
    */
  def frameFunctions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val full = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("best_ok", first_value(col("o_orderkey")).over(full))
      .withColumn("worst_ok", last_value(col("o_orderkey")).over(full))
      .withColumn("third_ok", nth_value(col("o_orderkey"), 3).over(full))
      .withColumn("next_ok", lead(col("o_orderkey"), 1).over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_frame_functions" -> frameFunctions,
    "rel_big_orders" -> bigOrders,
    "rel_trailing_spend" -> trailingSpend,
    "rel_customer_orders_dist" -> customerOrdersDist,
    "rel_shipping_priority" -> shippingPriority,
    "rel_returned_customers" -> returnedCustomers,
    "rel_above_avg_orders" -> aboveAvgOrders,
    "rel_quantiles" -> quantiles,
    "rel_rank_functions" -> rankFunctions,
    "rel_grouping_sets" -> groupingSetsSales,
    "rel_pivot_sales" -> pivotSales,
    "rel_order_timeline" -> orderTimeline,
    "rel_pricing_summary" -> pricingSummary,
    "rel_revenue_by_nation" -> revenueByNation,
    "rel_topk_orders_per_customer" -> topOrdersPerCustomer,
    "rel_top_parts" -> topParts,
    "rel_brand_setops" -> brandSetOps,
    "rel_rollup_sales" -> rollupSales,
    "rel_cube_sales" -> cubeSales,
    "rel_customers_without_orders" -> customersWithoutOrders,
    "rel_priority_semijoin" -> prioritySemiJoin,
    "rel_distinct_parts_per_supplier" -> distinctPartsPerSupplier
  )

  val oracle: Map[String, String] = Map(
    "rel_frame_functions" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  first_value(o_orderkey) OVER wf AS best_ok,
        |  last_value(o_orderkey) OVER wf AS worst_ok,
        |  nth_value(o_orderkey, 3) OVER wf AS third_ok,
        |  lead(o_orderkey, 1) OVER w AS next_ok,
        |  lag(o_totalprice, 1) OVER w AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey),
        |  wf AS (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND UNBOUNDED FOLLOWING)""".stripMargin,
    "rel_big_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey,
         |  epoch_us(o_orderdate) AS order_us, o_totalprice, sum_qty
         |FROM (SELECT l_orderkey,
         |        CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE)
         |          AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(24,6)))
         |        AS DOUBLE) > $BigOrderQty)
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "rel_trailing_spend" ->
      s"""SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS order_us,
         |  o_totalprice,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) OVER w AS DOUBLE)
         |    AS trailing_spend,
         |  COUNT(*) OVER w AS n_recent
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey
         |  ORDER BY epoch_us(o_orderdate)
         |  RANGE BETWEEN $TrailingUs PRECEDING AND CURRENT ROW)"""
        .stripMargin,
    "rel_customer_orders_dist" ->
      """SELECT n_orders, count(*) AS n_custs
        |FROM (SELECT c_custkey, count(o_custkey)::BIGINT AS n_orders
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY n_orders""".stripMargin,
    "rel_shipping_priority" ->
      s"""SELECT l_orderkey, epoch_us(o_orderdate) AS order_us,
         |  o_orderpriority,
         |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND epoch_us(o_orderdate) < $ShipCutUs
         |  AND epoch_us(l_shipdate) > $ShipCutUs
         |GROUP BY l_orderkey, epoch_us(o_orderdate), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "rel_returned_customers" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_returned
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "rel_above_avg_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  (SELECT count(*) FROM orders i
        |   WHERE i.o_custkey = o.o_custkey) AS n_orders
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(24,6))
        |    * (SELECT count(*) FROM orders i
        |       WHERE i.o_custkey = o.o_custkey) * 2
        |  > (SELECT SUM(CAST(o_totalprice AS DECIMAL(24,6))) FROM orders i
        |     WHERE i.o_custkey = o.o_custkey) * 3""".stripMargin,
    "rel_order_timeline" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  epoch_us(o_orderdate) - lag(epoch_us(o_orderdate)) OVER w AS gap_us,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY epoch_us(o_orderdate), o_orderkey
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY epoch_us(o_orderdate), o_orderkey)""".stripMargin,
    "rel_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_quantity < 50.0
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "rel_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name""".stripMargin,
    "rel_topk_orders_per_customer" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "rel_top_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10""".stripMargin,
    "rel_brand_setops" ->
      """(SELECT DISTINCT p_brand, p_size FROM part WHERE p_retailprice >= 980.0
        | INTERSECT
        | SELECT DISTINCT p_brand, p_size FROM part WHERE p_retailprice <= 920.0)
        |EXCEPT
        |SELECT DISTINCT p_brand, p_size FROM part WHERE p_size >= 40""".stripMargin,
    "rel_quantiles" ->
      """SELECT l_returnflag AS returnflag,
        |  quantile_disc(l_quantity, 0.25) AS q25,
        |  quantile_disc(l_quantity, 0.5) AS q50,
        |  quantile_disc(l_quantity, 0.9) AS q90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "rel_rank_functions" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    percent_rank() OVER w AS pct_rank,
        |    ntile(4) OVER w AS quartile, cume_dist() OVER w AS cdist
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 100""".stripMargin,
    "rel_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "rel_pivot_sales" ->
      """SELECT l_returnflag AS returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_quantity AS DECIMAL(24,6)) END) AS DOUBLE) AS qty_o,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_quantity AS DECIMAL(24,6)) END) AS DOUBLE) AS qty_f
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "rel_rollup_sales" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "rel_cube_sales" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "rel_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin,
    "rel_priority_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45.0)
        |GROUP BY o_orderpriority""".stripMargin,
    "rel_distinct_parts_per_supplier" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_lineitems
        |FROM lineitem GROUP BY l_suppkey""".stripMargin
  )
}
