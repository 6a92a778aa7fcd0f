package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Apriori frequent-itemset mining + association rules, Spark-first.
  *
  * Capability parity with the reference's two pipelines
  * (`apriori/apriori_final.java`, `apriori/apriori_raw.java`):
  *
  *  - Job 1 — tokenize → (item,1) → combiner/reducer SUM → support filter
  *    (apriori_final.java:49-62, 160-193, 215-225) becomes
  *    `explode → groupBy.count → HAVING`; map-side partial aggregation is
  *    automatic in `HashAggregateExec` (no combiner to hand-wire).
  *  - The HBase point-`Get` per token (apriori_final.java:125-140) — a
  *    network RTT on the data path — becomes ONE broadcast of the frequent
  *    item set joined without any shuffle (J1 in SURVEY.md §2.3).
  *  - The recursive per-transaction subset generator
  *    (`CandidatesGenRecursion`, apriori_final.java:70-110) becomes a typed
  *    `flatMap` over `Seq.combinations` (G1) — distributed, no driver loop.
  *  - Job 3's rule confidence via HBase lookups of count(X) and count(X∪Y)
  *    (apriori_raw.java:196-297) becomes an equi-join on the canonical
  *    itemset key plus a ratio column (J2/M6); confidence =
  *    100·supp(Z)/supp(X) (apriori_raw.java:275-278).
  *
  * Deliberate deviation (SURVEY.md §2.5 "semantics trap"): itemsets are
  * canonicalized by sorting before keying, where the reference keys on raw
  * transaction order — textbook Apriori semantics, deterministic, and
  * expressible in the DuckDB oracle. Support is inclusive ≥ 5
  * (apriori_final.java:231).
  *
  * Scale notes (100 TB): the lineitem⋈part join strategy is left to
  * AQE/auto-broadcast (part is a dimension at fixture scale but a
  * multi-billion-row table at TPC-H 100 TB — a forced broadcast hint would
  * OOM there, a shuffled hash join is correct); the only shuffles are the
  * `groupBy.count`s, all with map-side partial aggregation; the frequent
  * item set crosses the cluster once as a broadcast, never per-row; subset
  * enumeration is bounded by [[MaxBasket]] to cap the 2^k blowup per basket.
  * [[itemsetSupports]] is computed once per (session, dir) and cached —
  * the three apriori queries share it instead of rebuilding the basket
  * join per invocation (the cached data is the aggregated itemset table,
  * orders of magnitude smaller than the input).
  */
object Apriori {
  /** Inclusive support threshold (apriori_final.java:231, 270). */
  val Support = 5

  /** Baskets are truncated to this many frequent items before subset
    * enumeration (2^k guard). No effect at fixture scale (max basket = 11
    * at sf0.01); a documented deviation for pathologically wide baskets.
    */
  val MaxBasket = 14

  case class Basket(l_orderkey: Long, fitems: Seq[String])

  /** G1 generator (pure): every subset (1 ≤ size ≤ n, input order
    * preserved — inputs are pre-sorted) of a basket's frequent items,
    * keyed by the space-joined canonical string. Spark-side use is a
    * typed flatMap; the reference's recursive equivalent is
    * `CandidatesGenRecursion` (apriori_final.java:70-110).
    *
    * DUPLICATE-INPUT SEMANTICS (pinned, r16 ADVICE): subsets are
    * enumerated by POSITION (index combinations), so an input with
    * value-equal elements emits value-equal subsets once per index
    * combination — `Seq("a","a")` yields "a", "a", "a a". This is the
    * [[graft.functions.SubsetsGenerator]] / DuckDB-mask-join semantic;
    * `Seq.combinations` (the pre-r17 form) DEDUPLICATES value-equal
    * combinations, which made the typed and SQL tiers silently
    * disagree on duplicate-bearing baskets. Every in-repo caller feeds
    * deduplicated arrays (`array_intersect`/`array_distinct`/
    * `collect_set` outputs), where the two semantics coincide.
    */
  def subsetKeys(items: Seq[String]): Iterator[(String, Int)] = {
    val v = items.toIndexedSeq
    (1 to v.length).iterator
      .flatMap(k => v.indices.combinations(k))
      .map(idx => (idx.map(v).mkString(" "), idx.length))
  }

  /** G3 generator (pure): (antecedent, consequent) for every non-empty
    * proper subset of a frequent itemset
    * (`AssociationRuleRecursion`, apriori_raw.java:196-297).
    */
  def antecedents(z: Seq[String]): Iterator[(String, String)] =
    (1 until z.length).iterator
      .flatMap(k => z.combinations(k))
      .map(x => (x.mkString(" "), z.diff(x).mkString(" ")))

  /** One transaction per order: the distinct, sorted set of part brands
    * (FIXTURES.md canonical mapping). The reference's transaction file is
    * one whitespace-joined line per basket (apriori_final.java:6).
    */
  def transactions(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_partkey")
    val part = Tables(spark, dir, "part").select("p_partkey", "p_brand")
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("p_brand"))).as("items"))
  }

  /** Transactions in TRANSACTION order, not canonical-sorted: each
    * basket's brands ordered by first appearance in the order's
    * lineitem sequence (min l_linenumber, ties lexical) — the
    * deterministic stand-in for "the order items appear on the
    * transaction line" that the reference's text files carry. Feeds
    * [[freqItemsetsTxOrder]], the opt-in replay of the reference's
    * order-sensitive keying.
    */
  def transactionsOrdered(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val part = Tables(spark, dir, "part").select("p_partkey", "p_brand")
    // ONE aggregation, not the former (l_orderkey, p_brand) min-ln agg
    // cascaded into a per-order collect (two differently-keyed
    // Exchanges): sorting the (ln, brand) pairs and keeping each
    // brand's FIRST occurrence (array_distinct preserves first-
    // appearance order) yields exactly the (min ln, ties lexical)
    // order — brand a precedes b iff its earliest struct (min_ln_a, a)
    // sorts before (min_ln_b, b), which is the documented key.
    li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("l_orderkey")
      .agg(array_distinct(transform(
        array_sort(collect_list(
          struct(col("l_linenumber").as("ln"), col("p_brand")))),
        s => s.getField("p_brand"))).as("items"))
  }

  // ---- DataFrame-parameterized API -------------------------------------
  // The fixture entry points below read the star schema, but the
  // pipeline itself composes with ANY transactions DataFrame
  // (`items: ARRAY<STRING>`, one row per basket) — e.g.
  // `graft.sources.TextSources.transactions` for the reference's own
  // basket files — and an arbitrary support threshold.

  /** Frequent 1-itemsets of a transactions DF: item → basket count. */
  def freqItemsOf(tx: DataFrame, support: Int = Support): DataFrame =
    tx.select(explode(col("items")).as("item"))
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= support)

  /** Subset supports of a transactions DF (frequent-filtered baskets,
    * sorted-canonical keys, truncated to [[MaxBasket]]).
    */
  /** Frequent-filtered, sorted-canonical baskets (`fitems` array) — the
    * prune-before-generate input shared by the typed-flatMap pipeline
    * and the SQL/LATERAL VIEW form.
    */
  private def frequentBasketsOf(tx0: DataFrame, support: Int): DataFrame = {
    val tx = tx0.localCheckpoint()
    val freqSet = freqItemsOf(tx, support)
      .agg(collect_set(col("item")).as("freqset"))
    tx.join(broadcast(freqSet))
      .select(array_sort(array_intersect(col("items"), col("freqset")))
        .as("fitems"))
  }

  def itemsetSupportsOf(tx0: DataFrame, support: Int = Support): DataFrame = {
    val spark = tx0.sparkSession
    val s = spark; import s.implicits._
    frequentBasketsOf(tx0, support)
      .select(lit(0L).as("l_orderkey"), $"fitems")
      .as[Basket]
      .flatMap(b => subsetKeys(b.fitems.take(MaxBasket)))
      .toDF("itemset", "k")
      .groupBy($"itemset", $"k")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Frequent k-itemsets through the SQL surface: the custom Catalyst
    * `Generator` [[graft.functions.SubsetsGenerator]] (`graft_subsets`)
    * replaces the typed flatMap in a plain LATERAL VIEW query — proving
    * the UDTF tier end-to-end against the same oracle as
    * [[freqItemsets]]. Identical plan shape: prune-before-generate, one
    * aggregation with map-side partials after the generator.
    */
  def freqItemsetsSql(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SubsetsGenerator.register(spark)
    // selectExpr rather than a temp view + spark.sql: no session-global
    // name to collide on; the LATERAL VIEW spelling is spec-covered
    frequentBaskets(spark, dir)
      .select(slice(col("fitems"), 1, MaxBasket).as("fitems"))
      .selectExpr("graft_subsets(fitems) AS (itemset, k)")
      .where(col("k") >= 2)
      .groupBy("itemset", "k")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= Support)
      .select("itemset", "cnt")
  }

  /** Frequent k-itemsets (k ≥ 2) of a transactions DF. */
  def freqItemsetsOf(tx: DataFrame, support: Int = Support): DataFrame =
    itemsetSupportsOf(tx, support)
      .where(col("k") >= 2 && col("cnt") >= support)
      .select("itemset", "cnt")

  /** Frequent k-itemsets under the reference's ORDER-SENSITIVE keying
    * (`apriori_final.java:82-94`): subset keys are space-joined in
    * TRANSACTION order, so the same item SET reached through two
    * basket orders counts as two different keys (e.g. baskets
    * `[b, a]` and `[a, b]` contribute to "b a" and "a b" separately,
    * each with its own support). The engine's default entries use
    * canonical sorted keys — a conscious redefinition documented in
    * SURVEY §2.5 — and this variant makes the reference's semantics an
    * OPT-IN, verified against a DuckDB replay rather than merely
    * claimed. Everything else matches the default pipeline:
    * prune-before-generate (the frequent filter PRESERVES basket
    * order), [[MaxBasket]] truncation, support gate, k ≥ 2.
    */
  def freqItemsetsTxOrder(spark: SparkSession, dir: String): DataFrame = {
    // rides the session basket-cache discipline like every other
    // fixture entry (one basket scan per session, enumeration per
    // call): before r16 this was the ONLY apriori entry rebuilding its
    // basket table per invocation — the lineitem⋈part join, the
    // frequent-item derivation, and a localCheckpoint every call
    // (~1.4 s of its 2.5 s at sf0.1). The `Of` form below stays
    // cache-free for arbitrary transaction DataFrames.
    val s = spark; import s.implicits._
    val baskets = basketsCache.getOrBuild(spark, dir + "#txorder") {
      val mat = graft.Materialize.session(spark)
      val tx = mat(transactionsOrdered(spark, dir))
      val freqSet = freqItemsOf(tx, Support)
        .agg(collect_set(col("item")).as("freqset"))
      val built = mat(tx.join(broadcast(freqSet))
        .select(filter(col("items"),
          i => array_contains(col("freqset"), i)).as("fitems")))
      if (!graft.Materialize.eager(mat)) built.count(): Unit
      graft.Materialize.release(tx)
      built
    }
    // codegen'd Generate instead of the typed flatMap (r17) — same
    // rationale and row-equality argument as candidatesRaw (the
    // order-preserving frequent filter keeps fitems duplicate-free:
    // `items` is array_distinct output)
    graft.functions.SubsetsGenerator.register(spark)
    baskets
      .select(slice(col("fitems"), 1, MaxBasket).as("fitems"))
      .selectExpr("graft_subsets(fitems) AS (itemset, k)")
      .groupBy($"itemset", $"k")
      .agg(count(lit(1)).as("cnt"))
      .where($"k" >= 2 && $"cnt" >= Support)
      .select("itemset", "cnt")
  }

  def freqItemsetsTxOrderOf(tx0: DataFrame,
                            support: Int = Support): DataFrame = {
    val spark = tx0.sparkSession
    val s = spark; import s.implicits._
    val tx = tx0.localCheckpoint()
    val freqSet = freqItemsOf(tx, support)
      .agg(collect_set(col("item")).as("freqset"))
    tx.join(broadcast(freqSet))
      .select(filter(col("items"),
        i => array_contains(col("freqset"), i)).as("fitems"))
      .select(lit(0L).as("l_orderkey"), $"fitems")
      .as[Basket]
      .flatMap(b => subsetKeys(b.fitems.take(MaxBasket)))
      .toDF("itemset", "k")
      .groupBy($"itemset", $"k")
      .agg(count(lit(1)).as("cnt"))
      .where(col("k") >= 2 && col("cnt") >= support)
      .select("itemset", "cnt")
  }

  /** Association rules of a transactions DF (see [[assocRules]]). */
  def assocRulesOf(tx: DataFrame, support: Int = Support): DataFrame = {
    val spark = tx.sparkSession
    val s = spark; import s.implicits._
    val supports = itemsetSupportsOf(tx, support)
      .where($"cnt" >= support).localCheckpoint()
    rulesFrom(spark, supports, support)
  }

  /** Frequent 1-itemsets: item → basket count, count ≥ [[Support]].
    * Reference Job 1 (A1/A2/P4 in SURVEY.md §2).
    *
    * Counted by exploding the session-cached frequent-basket table's
    * UNTRUNCATED `fitems` arrays: `fitems` holds every frequent item of
    * the basket (the [[MaxBasket]] cap applies only to the k ≥ 2 subset
    * enumeration), and since `items` is a set, #rows-containing-item is
    * exactly the basket incidence count. So singleton counts stay EXACT
    * at any basket width — a >MaxBasket basket truncates only the
    * documented k ≥ 2 deviation, never this entry — while still reusing
    * the cached basket build (no second lineitem⋈part join per
    * invocation). The count ≥ Support filter is a no-op by construction
    * (every item in `fitems` already passed the frequency gate) but
    * states the contract.
    */
  def freqItems(spark: SparkSession, dir: String): DataFrame =
    frequentBaskets(spark, dir)
      .select(explode(col("fitems")).as("item"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= Support)

  /** Session-lifetime cache: one persisted supports table per
    * (session, dir). The three apriori query entries are invoked
    * independently by Verify/Bench; without this each invocation rebuilds
    * the basket join (round 1 rebuilt it ~6× per bench run). The cached
    * plan holds only the aggregated itemset table — small relative to the
    * input — so keeping it for the session is the intended trade.
    *
    * LIFETIME: entries live until [[invalidateSupports]] (or process
    * exit) — the map retains its SparkSession keys and the persisted
    * blocks. That is the right trade for the Verify/Bench harness (one
    * session, immutable fixture dirs); a long-lived library consumer that
    * rewrites the parquet under a cached path, or cycles sessions, must
    * call [[invalidateSupports]] at the boundary or the cache serves
    * stale data / leaks the old session.
    */
  private val supportsCache =
    new graft.SessionCache[String, DataFrame](graft.Materialize.release)

  /** Session-lifetime frequent-basket cache: ONE eager checkpoint of the
    * frequent-filtered, sorted-canonical baskets per (session, dir).
    * Everything downstream of the basket build — the supports table, the
    * SQL/LATERAL VIEW entry, the level-wise loop, the raw candidate
    * stream, the rule metrics' transaction total — reads this table
    * instead of re-running the lineitem⋈part basket join per invocation
    * (round 4 measured 3.97 s vs 0.087 s for the same answer when the
    * SQL entry rebuilt it). Same lifetime contract as [[supportsCache]].
    */
  private val basketsCache =
    new graft.SessionCache[String, DataFrame](graft.Materialize.release)

  private def frequentBaskets(spark: SparkSession, dir: String): DataFrame =
    basketsCache.getOrBuild(spark, dir) {
      val mat = graft.Materialize.session(spark)
      val tx = mat(transactions(spark, dir))
      val freqSet = freqItemsOf(tx, Support)
        .agg(collect_set(col("item")).as("freqset"))
      val built = mat(tx.join(broadcast(freqSet))
        .select(array_sort(array_intersect(col("items"), col("freqset")))
          .as("fitems")))
      // a LAZY mat (Disk) defers built's materialization to the first
      // action — force it while tx is still persisted, or the release
      // below undoes the staged build (Materialize.eager note)
      if (!graft.Materialize.eager(mat)) built.count(): Unit
      // tx fed the frequent-item derivation and the built checkpoint —
      // release so the cache retains one basket-scale table, not two
      graft.Materialize.release(tx)
      built
    }

  /** Drop cached supports AND frequent baskets: the given (session, dir)
    * entry, all entries of a session (`dir = null`), or everything (no
    * args). Unpersists the cached blocks and releases the session
    * references.
    */
  def invalidateSupports(spark: SparkSession = null,
                         dir: String = null): Unit =
    // startsWith: the basket cache also keys the tx-order variant
    // under "<dir>#txorder" (r16)
    Seq(supportsCache, basketsCache).foreach(
      _.invalidate(spark, k => dir == null || k == dir ||
        k.startsWith(dir + "#")))

  /** Only frequent rows are cached: every downstream lookup is an
    * antecedent of a frequent itemset, and supp(X) ≥ supp(Z) ≥ Support
    * by monotonicity — infrequent subsets can never be probed, so
    * filtering before persist shrinks the cache and the join build side
    * for free.
    */
  def itemsetSupports(spark: SparkSession, dir: String): DataFrame =
    supportsCache.getOrBuild(spark, dir)(
      graft.Materialize.session(spark)(
        itemsetSupportsUncached(spark, dir)
          .where(col("cnt") >= Support)))
  // checkpointed row blocks, not persist(): the dominant consumers are
  // the rules entries' typed antecedent kernel (reads ROWS — scanning
  // the columnar SQL cache deserializes per consumer; the Dedup index
  // cache measured 2-4× slower on exactly this shape) and two broadcast
  // builds per rules invocation, which also read the table as rows.
  // Same session-lifetime contract as before; Materialize.release
  // reclaims either representation.

  /** Support of every subset (size ≥ 1, canonical sorted) of each basket's
    * frequent items: cnt(X) = #baskets ⊇ X. Monotonicity makes the per-item
    * frequency pre-filter a pure optimization — it never changes which
    * itemsets reach support (any X with supp(X) ≥ S has all items ≥ S).
    * Delegates to the DF-parameterized pipeline: one checkpointed basket
    * scan serves the frequent-item derivation and the enumeration, and
    * the frequent set rides a 1-row broadcast (the Spark analog of the
    * reference's per-token HBase Get, apriori_raw.java:160-171).
    */
  private def itemsetSupportsUncached(
      spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    // codegen'd Generate instead of the typed flatMap (r17) — same
    // rationale and row-equality argument as candidatesRaw
    graft.functions.SubsetsGenerator.register(spark)
    frequentBaskets(spark, dir)
      .select(slice(col("fitems"), 1, MaxBasket).as("fitems"))
      .selectExpr("graft_subsets(fitems) AS (itemset, k)")
      .groupBy($"itemset", $"k")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Frequent k-itemsets (k ≥ 2), support ≥ [[Support]] — reference Job 2
    * output with the final-variant support filter (apriori_final.java:215).
    */
  def freqItemsets(spark: SparkSession, dir: String): DataFrame =
    itemsetSupports(spark, dir)
      .where(col("k") >= 2 && col("cnt") >= Support)
      .select("itemset", "cnt")

  /** The reference Job-2 output SHAPE (apriori_final.java:147-155):
    * frequent 1-items re-emitted alongside the k ≥ 2 itemsets in one
    * stream (G2's singleton re-emit). [[freqItems]]/[[freqItemsets]]
    * split the same content by arity for composability; this entry is the
    * faithful combined form — the cached supports table already holds
    * every frequent subset with k ≥ 1, so it is one projection away.
    */
  def freqAll(spark: SparkSession, dir: String): DataFrame =
    itemsetSupports(spark, dir).select("itemset", "cnt")

  /** The drop-one subsets of each frequent k ≥ 2 itemset, with the
    * parent's support — the one-arity covering relation both
    * [[maximalItemsets]] and [[closedItemsets]] reduce to.
    */
  private def dropOneCovered(L: DataFrame): DataFrame = {
    val t = split(col("itemset"), " ")
    L.where(col("k") >= 2)
      .select(explode(transform(sequence(lit(0), size(t) - 1),
        i => array_join(filter(t, (_, j) => j =!= i), " "))).as("itemset"),
        col("cnt").as("pcnt"))
  }

  /** MAXIMAL frequent itemsets — frequent itemsets with no frequent
    * superset, the compressed representation mining pipelines report.
    * Monotonicity collapses the superset check to one arity: if any
    * frequent superset exists, one with exactly one more item does. So
    * "covered" = the drop-one subsets of every frequent k ≥ 2 itemset
    * (generated by an indexed-lambda filter, |X| strings per itemset),
    * and maximal = frequent ∖ covered in ONE anti-join — no quadratic
    * subset-containment join. Rides the session supports cache.
    */
  def maximalItemsets(spark: SparkSession, dir: String): DataFrame = {
    val L = itemsetSupports(spark, dir) // already filtered to frequent
    L.join(dropOneCovered(L).select("itemset").distinct(),
        Seq("itemset"), "left_anti")
      .select("itemset", "cnt")
  }

  /** CLOSED frequent itemsets — no superset with EQUAL support (the
    * lossless compressed representation: all supports reconstruct from
    * the closed sets). Same one-arity reduction as [[maximalItemsets]]:
    * support is antitone in ⊆, so a superset of equal support exists iff
    * a one-item-larger one does. X is closed iff max over parents'
    * supports < supp(X) (or no parent).
    */
  def closedItemsets(spark: SparkSession, dir: String): DataFrame = {
    val L = itemsetSupports(spark, dir)
    val covered = dropOneCovered(L)
      .groupBy("itemset").agg(max(col("pcnt")).as("maxp"))
    L.join(covered, Seq("itemset"), "left")
      .where(col("maxp").isNull || col("maxp") < col("cnt"))
      .select("itemset", "cnt")
  }

  /** Frequent k-itemsets, level-wise (classic Apriori iteration) — the
    * 100 TB path for the same answer as [[freqItemsets]]. The per-basket
    * variant enumerates all 2^n subsets of every basket in one pass; this
    * one iterates k = 2, 3, … and, before enumerating k-subsets, prunes
    * each basket to the items still ACTIVE at level k−1 (items appearing
    * in some frequent (k−1)-itemset, support monotonicity), stopping at
    * the first empty level. When the deepest frequent itemset is much
    * shallower than the widest basket — the realistic shape at scale —
    * the enumerated volume drops from 2^n to Σ_{k≤D+1} C(n', k) on
    * shrinking n'. Driver state per level is the active-item set (item
    * vocabulary scale, broadcast each level like SGD's θ) and the
    * per-level support tables stay distributed.
    *
    * DRIVER-MEMORY BUDGET: the active set is bounded by |frequent
    * 1-items| at every level — level 2 needs no prune (the cached
    * basket table's `fitems` arrays contain nothing else by
    * construction), and each later level's actives are items of
    * frequent k-itemsets, a subset of the previous level's actives by
    * support monotonicity (so the sequence is ⊆-monotone decreasing).
    * That is O(frequent vocabulary) — the same class as SGD's θ and
    * the standard level-wise broadcast pattern — NOT O(itemsets) (the
    * support tables those itemsets live in never leave the cluster)
    * and NOT O(corpus). Since r17 the set is never `collect()`ed at
    * all: it rides a 1-row `collect_set` broadcast built from the
    * previous level's checkpointed table (the same bound, through
    * Spark's broadcast machinery), and the per-level stop probe is a
    * 1-block `isEmpty` instead of a full second job over the level.
    * `AprioriSpec` pins the bound and the monotone shrinkage off the
    * output.
    */
  def freqItemsetsLevelwise(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    // per-level cuts honor the session conf (reliable on a cluster —
    // localCheckpoint has no lineage fallback, so an executor loss
    // mid-mining would fail the whole entry; sessionTruncating maps
    // disk→local per the Materialize plan-growth note)
    val cut = graft.Materialize.sessionTruncating(spark)
    // the session basket cache is the "one basket scan": the per-level
    // slice(MaxBasket) is row-local over its checkpointed rows, and
    // level 2 needs no prune at all (fitems contain exactly the
    // frequent items by construction)
    graft.functions.KSubsetsGenerator.register(spark)
    val baskets = frequentBaskets(spark, dir)
      .select(slice(col("fitems"), 1, MaxBasket).as("fitems"))
    val levels = scala.collection.mutable.ListBuffer[DataFrame]()
    var result: DataFrame = null
    var k = 2
    var go = true
    while (go && k <= MaxBasket) {
      // r17: the whole level is EXPRESSION-ONLY — active-item pruning
      // via a 1-row broadcast aset built from the PREVIOUS level's
      // checkpointed table (array_intersect preserves first-array
      // order, so canonical keys survive), enumeration through the
      // codegen'd graft_subsets_k Generate (C(n', k) per basket). The
      // pre-r17 loop collect()ed the active set to the driver per
      // level (a second full job over lk) and enumerated through a
      // typed flatMap (deserialize per basket per level); now the only
      // driver state is the loop counter — the active set rides
      // Spark's broadcast machinery with the same O(frequent
      // vocabulary) bound the old collect had (AprioriSpec pins the
      // bound off the output, unchanged).
      val pruned =
        if (levels.isEmpty) baskets
        else {
          val aset = levels.last
            .select(explode(split($"itemset", " ")).as("i"))
            .agg(collect_set($"i").as("aset"))
          baskets.crossJoin(broadcast(aset))
            .select(array_intersect($"fitems", $"aset").as("fitems"))
        }
      val lk = cut(pruned
        .where(size($"fitems") >= k)
        .selectExpr(s"graft_subsets_k(fitems, $k) AS itemset")
        .groupBy("itemset")
        .agg(count(lit(1)).as("cnt"))
        .where($"cnt" >= Support))
      levels += lk
      // stop probe on the CHECKPOINTED table: one 1-block head job,
      // replacing the old explode+distinct+collect per level
      if (lk.isEmpty) go = false
      else {
        result = if (result == null) lk else result.union(lk)
        k += 1
      }
    }
    // consolidate the union into ONE retained table and release the
    // per-level checkpoints: a call leaves behind one frequent-itemset-
    // sized table (the basket table belongs to the session cache)
    val out =
      if (result == null)
        spark.emptyDataset[(String, Long)].toDF("itemset", "cnt")
      else cut(result)
    levels.foreach(graft.Materialize.release)
    out
  }

  /** The RAW variant's unfiltered candidate stream — parity with
    * `CandidateGenReduce` (apriori_raw.java:428-461), which emits EVERY
    * k ≥ 2 candidate count into its out2 file and leaves the support
    * gate to the rule mapper (apriori_raw.java:367-383). Identical
    * pipeline to [[freqItemsets]] minus the HAVING: enumerate the cached
    * frequent baskets' subsets, count, emit. (The supports cache cannot
    * serve this — it deliberately persists only the gated rows — so the
    * enumeration re-runs over the checkpointed basket table, which is
    * the cache designed to absorb exactly that.)
    */
  def candidatesRaw(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    // enumeration through the codegen'd graft_subsets Generate (r17):
    // the typed-flatMap form paid a deserialize→Scala→serialize
    // round-trip per basket AND broke whole-stage codegen between the
    // scan and the aggregation; the CollectionGenerator fuses
    // enumerate→filter→partial-agg into one codegen stage. Same rows
    // by construction (fitems are distinct, where index- and
    // value-combinations coincide — see subsetKeys).
    graft.functions.SubsetsGenerator.register(spark)
    frequentBaskets(spark, dir)
      .select(slice(col("fitems"), 1, MaxBasket).as("fitems"))
      .selectExpr("graft_subsets(fitems) AS (itemset, k)")
      .where($"k" >= 2)
      .groupBy($"itemset")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Reference input-format parity: the [[freqItems]] answer computed
    * from the reference's ACTUAL input format — one whitespace-joined
    * basket line per transaction (apriori_final.java:6, TextInputFormat
    * at :259). The fixture baskets are written out as a deterministic
    * text file, read back through
    * [[graft.sources.TextSources.transactions]], and counted by
    * [[freqItemsOf]]; the oracle recomputes the same answer from the
    * parquet star schema, so the hash gate verifies the text round-trip
    * end-to-end (a tokenization or line-splitting bug would shift
    * counts and break the hash).
    */
  def freqItemsText(spark: SparkSession, dir: String): DataFrame = {
    val path =
      graft.sources.TextSources.scratchPath(spark, "baskets", dir)
    graft.sources.TextSources.writeOnce(path) {
      transactions(spark, dir)
        .select(concat_ws(" ", col("items")).as("value"))
        .write.mode("overwrite").text(path)
    }
    freqItemsOf(graft.sources.TextSources.transactions(spark, path))
  }

  /** Association rules X ⇒ Y from every frequent itemset Z = X ∪ Y with
    * X a non-empty proper subset; confidence = 100·supp(Z)/supp(X)
    * (apriori_raw.java:275-278). The reference emits all rules without a
    * min-confidence gate; so do we.
    */
  def assocRules(spark: SparkSession, dir: String): DataFrame =
    rulesFrom(spark, itemsetSupports(spark, dir), Support)

  /** Association rules with the full interest-metric suite: the
    * reference's confidence percentage (apriori_raw.java:203) plus lift
    * (confidence over the consequent's base rate — the "is this rule
    * better than chance" ratio) and leverage (the additive version).
    * The consequent's support resolves against the SAME session-cached
    * supports table — apriori monotonicity guarantees every consequent
    * of a frequent set is itself frequent, so the key always joins —
    * and the transaction total rides a 1-row broadcast. Every metric is
    * one double expression over exact BIGINT counts, evaluated as the
    * identical tree in both engines.
    */
  def assocRulesMetrics(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val supports = itemsetSupports(spark, dir)
    // rule expansion through the codegen'd graft_antecedents Generate
    // (r17) — the typed-flatMap rationale and row-equality argument of
    // candidatesRaw (canonical itemsets are distinct-element, where
    // positional and value complements coincide)
    graft.functions.AntecedentsGenerator.register(spark)
    val expanded = supports
      .where($"k" >= 2 && $"cnt" >= Support)
      .select(split($"itemset", " ").as("z"), $"cnt".as("zcnt"))
      .selectExpr("graft_antecedents(z) AS (antecedent, consequent)",
        "zcnt")
    // basket count == transaction count (the frequent-item filter keeps
    // every basket row, possibly with an empty fitems array) — one 1-row
    // aggregate over the cached table, no second basket-join build
    val nTx = frequentBaskets(spark, dir).agg(count(lit(1)).as("n_tx"))
    expanded
      .join(supports.select($"itemset".as("xkey"), $"cnt".as("xcnt")),
        col("antecedent") === col("xkey"))
      .join(supports.select($"itemset".as("ykey"), $"cnt".as("ycnt")),
        col("consequent") === col("ykey"))
      .crossJoin(broadcast(nTx))
      .select(
        col("antecedent"), col("consequent"),
        (col("zcnt") * lit(100.0) / col("xcnt")).as("confidence"),
        ((col("zcnt").cast("double") * col("n_tx").cast("double"))
          / (col("xcnt").cast("double") * col("ycnt").cast("double")))
          .as("lift"),
        (col("zcnt").cast("double") / col("n_tx").cast("double")
          - (col("xcnt").cast("double") / col("n_tx").cast("double"))
            * (col("ycnt").cast("double") / col("n_tx").cast("double")))
          .as("leverage"))
  }

  /** Rule expansion + confidence join over a supports table (shared by
    * the fixture path and [[assocRulesOf]]).
    */
  private def rulesFrom(spark: SparkSession, supports: DataFrame,
      support: Int): DataFrame = {
    val s = spark; import s.implicits._
    // codegen'd Generate — see assocRulesMetrics
    graft.functions.AntecedentsGenerator.register(spark)
    val expanded = supports
      .where($"k" >= 2 && $"cnt" >= support)
      .select(split($"itemset", " ").as("z"), $"cnt".as("zcnt"))
      .selectExpr("graft_antecedents(z) AS (antecedent, consequent)",
        "zcnt")
    // supports is tiny relative to the data (aggregated itemsets); AQE /
    // auto-broadcast picks BHJ at fixture scale, SMJ beyond thresholds.
    expanded
      .join(supports.select($"itemset", $"cnt".as("xcnt")),
        expanded("antecedent") === col("itemset"))
      .select(
        $"antecedent",
        $"consequent",
        ($"zcnt" * lit(100.0) / $"xcnt").as("confidence"))
  }

  /** Minimum 1-sequence (item) support for [[seqPairs]]. */
  val SeqMinSupport = 40L

  /** Sequential pairs reported. */
  val SeqTopK = 20

  /** Sequential-pattern mining — the GSP step the reference's Apriori
    * family leads to (Srikant & Agrawal, EDBT '96): frequent "A then
    * B" purchase sequences across each customer's order HISTORY, where
    * A's first purchase strictly precedes B's. The apriori pruning
    * applies on the time axis: only items frequent as 1-sequences
    * (first-purchased by ≥ [[SeqMinSupport]] customers) can appear in
    * a frequent 2-sequence, so the pair generation runs over the
    * pruned per-customer history — basket-local double-explode (the
    * [[graft.operators.Graph.edgesOf]] discipline), bounded by the
    * frequent-item count, never a customer-history self-join. Support
    * counts customers, exact integers; top-k is a
    * TakeOrderedAndProject. Same-day first purchases are NOT a
    * sequence (strict <), matching GSP's element semantics.
    */
  def seqPairs(spark: SparkSession, dir: String): DataFrame =
    seqPairsOf(
      Tables(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate"),
      Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey"))

  def seqPairsOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val cp = orders
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .agg(min(col("o_orderdate")).as("d"))
    val freq = cp.groupBy("p").agg(count(lit(1)).as("s1"))
      .where(col("s1") >= SeqMinSupport)
    val fp = cp.join(broadcast(freq.select("p")), "p")
    // pair generation as a history SELF-JOIN on the customer key (the
    // oracle's own shape), not collect_list + double explode (r17):
    // collect_list is a TypedImperativeAggregate, so the per-customer
    // history build ran as an interpreted ObjectHashAggregate — the
    // one non-codegen operator in the pipeline, and at sf1 the entry
    // was CPU-bound (util 0.84) exactly there. The self-join keeps
    // everything in whole-stage codegen (SMJ → filter → partial agg),
    // reuses one exchange for both sides (identical subtree), and the
    // strict a.d < b.d predicate prunes pairs inside the join instead
    // of after materializing |h|² struct copies. Same pair multiset by
    // construction: cp has one row per (c, p), so each unordered
    // history pair contributes exactly the date-ordered row.
    fp.as("a").join(fp.as("b"),
        col("a.c") === col("b.c") && col("a.d") < col("b.d"))
      .groupBy(col("a.p").as("p_first"), col("b.p").as("p_then"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("p_first"), col("p_then"))
      .limit(SeqTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "apriori_seq_pairs" -> seqPairs,
    "apriori_freq_items" -> freqItems,
    "apriori_freq_itemsets" -> freqItemsets,
    "apriori_freq_itemsets_sql" -> freqItemsetsSql,
    "apriori_freq_itemsets_lw" -> freqItemsetsLevelwise,
    "apriori_freq_all" -> freqAll,
    "apriori_maximal" -> maximalItemsets,
    "apriori_closed" -> closedItemsets,
    "apriori_assoc_rules" -> assocRules,
    "apriori_rules_metrics" -> assocRulesMetrics,
    "apriori_candidates_raw" -> candidatesRaw,
    "apriori_freq_items_text" -> freqItemsText,
    "apriori_freq_itemsets_txorder" -> freqItemsetsTxOrder
  )

  // DuckDB oracle: subsets enumerated with a bitmask join (the fixture's
  // max basket is 11 frequent items, well under the 1<<14 mask range).
  private val txSql =
    """tx AS (
      |  SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS items
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY l_orderkey
      |)""".stripMargin

  // Mirrors the Spark side exactly: per-basket items are intersected with
  // the frequent-item set, sorted, and truncated to MaxBasket BEFORE the
  // subset mask join — so Spark and oracle agree even on baskets wider
  // than MaxBasket (no effect at fixture scale, max basket = 11).
  private val subSql =
    s"""$txSql,
       |freq AS (
       |  SELECT item FROM (SELECT l_orderkey, unnest(items) AS item FROM tx)
       |  GROUP BY item HAVING count(*) >= ${Support}
       |),
       |freqlist AS (SELECT list(item) AS fl FROM freq),
       |ftx AS (
       |  SELECT l_orderkey,
       |    list_slice(list_sort(list_intersect(items, fl)),
       |               1, ${MaxBasket}) AS items
       |  FROM tx, freqlist
       |),
       |masks AS (SELECT unnest(range(1, 1 << ${MaxBasket})) AS mask),
       |sub AS (
       |  SELECT l_orderkey,
       |    list_transform(
       |      list_filter(range(1, len(items) + 1),
       |                  i -> ((mask >> (i - 1)::INT) & 1) = 1),
       |      i -> items[i]) AS subset
       |  FROM ftx JOIN masks ON mask < (1 << len(items))
       |),
       |supports AS (
       |  SELECT list_aggregate(subset, 'string_agg', ' ') AS itemset,
       |         len(subset) AS k, count(*) AS cnt
       |  FROM sub GROUP BY 1, 2
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "apriori_seq_pairs" ->
      s"""WITH cp AS (
         |  SELECT o_custkey AS c, l_partkey AS p,
         |    min(o_orderdate) AS d
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |sup AS (SELECT p FROM cp GROUP BY p
         |        HAVING count(*) >= $SeqMinSupport),
         |fp AS (SELECT cp.* FROM cp JOIN sup USING (p))
         |SELECT a.p AS p_first, b.p AS p_then,
         |  count(*)::BIGINT AS support
         |FROM fp a JOIN fp b ON b.c = a.c AND a.d < b.d
         |GROUP BY 1, 2
         |ORDER BY support DESC, p_first, p_then
         |LIMIT $SeqTopK""".stripMargin,
    "apriori_freq_items" ->
      s"""WITH $txSql
         |SELECT item, count(*) AS cnt
         |FROM (SELECT l_orderkey, unnest(items) AS item FROM tx)
         |GROUP BY item HAVING count(*) >= ${Support}""".stripMargin,
    // same answer, computed on the Spark side from the text-file basket
    // round-trip — the oracle recomputes from parquet, so the hash gate
    // verifies the reference-format adapter end-to-end
    "apriori_freq_items_text" ->
      s"""WITH $txSql
         |SELECT item, count(*) AS cnt
         |FROM (SELECT l_orderkey, unnest(items) AS item FROM tx)
         |GROUP BY item HAVING count(*) >= ${Support}""".stripMargin,
    // raw-variant parity: every k >= 2 candidate count, NO support gate
    "apriori_candidates_raw" ->
      s"""WITH $subSql
         |SELECT itemset, cnt FROM supports
         |WHERE k >= 2""".stripMargin,
    "apriori_freq_itemsets" ->
      s"""WITH $subSql
         |SELECT itemset, cnt FROM supports
         |WHERE k >= 2 AND cnt >= ${Support}""".stripMargin,
    // the LATERAL VIEW / custom-Generator form must produce the exact
    // same table as the typed-flatMap pipeline
    "apriori_freq_itemsets_sql" ->
      s"""WITH $subSql
         |SELECT itemset, cnt FROM supports
         |WHERE k >= 2 AND cnt >= ${Support}""".stripMargin,
    // maximal = frequent minus the drop-one subsets of frequent k>=2
    // itemsets (monotonicity: a frequent superset implies one of k+1)
    "apriori_maximal" ->
      s"""WITH $subSql,
         |L AS (SELECT itemset, k, cnt FROM supports WHERE cnt >= ${Support}),
         |covered AS (
         |  SELECT DISTINCT array_to_string(
         |    list_filter(string_split(itemset, ' '), (x, j) -> j != i),
         |    ' ') AS itemset
         |  FROM L, (SELECT unnest(range(1, ${MaxBasket + 1})) AS i) ii
         |  WHERE k >= 2 AND i <= k
         |)
         |SELECT itemset, cnt FROM L
         |WHERE itemset NOT IN (SELECT itemset FROM covered)""".stripMargin,
    // closed = keep X unless some one-larger frequent superset has the
    // SAME support (supports are antitone in subset order)
    "apriori_closed" ->
      s"""WITH $subSql,
         |L AS (SELECT itemset, k, cnt FROM supports WHERE cnt >= ${Support}),
         |covered AS (
         |  SELECT array_to_string(
         |    list_filter(string_split(itemset, ' '), (x, j) -> j != i),
         |    ' ') AS itemset, max(cnt) AS maxp
         |  FROM L, (SELECT unnest(range(1, ${MaxBasket + 1})) AS i) ii
         |  WHERE k >= 2 AND i <= k
         |  GROUP BY 1
         |)
         |SELECT L.itemset, cnt FROM L LEFT JOIN covered USING (itemset)
         |WHERE maxp IS NULL OR maxp < cnt""".stripMargin,
    // reference Job-2 combined stream: singletons + k-itemsets together
    "apriori_freq_all" ->
      s"""WITH $subSql
         |SELECT itemset, cnt FROM supports
         |WHERE cnt >= ${Support}""".stripMargin,
    // level-wise variant: same answer by construction, same oracle
    "apriori_freq_itemsets_lw" ->
      s"""WITH $subSql
         |SELECT itemset, cnt FROM supports
         |WHERE k >= 2 AND cnt >= ${Support}""".stripMargin,
    // order-sensitive keying (apriori_final.java:82-94 semantics):
    // transaction order = first-appearance lineitem order; the
    // frequent filter is list_filter (order-preserving — the sorted
    // entries use list_sort(list_intersect(...)) because DuckDB's
    // list_intersect does NOT preserve order), and the mask-join
    // subset generator already emits subsets in list order
    "apriori_freq_itemsets_txorder" ->
      s"""WITH txo AS (
         |  SELECT l_orderkey, list(p_brand ORDER BY ln, p_brand) AS items
         |  FROM (
         |    SELECT l.l_orderkey, p.p_brand,
         |      min(l.l_linenumber) AS ln
         |    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |    GROUP BY 1, 2)
         |  GROUP BY 1
         |),
         |freq AS (
         |  SELECT item
         |  FROM (SELECT l_orderkey, unnest(items) AS item FROM txo)
         |  GROUP BY item HAVING count(*) >= ${Support}
         |),
         |freqlist AS (SELECT list(item) AS fl FROM freq),
         |ftx AS (
         |  SELECT l_orderkey,
         |    list_slice(list_filter(items, x -> list_contains(fl, x)),
         |               1, ${MaxBasket}) AS items
         |  FROM txo, freqlist
         |),
         |masks AS (SELECT unnest(range(1, 1 << ${MaxBasket})) AS mask),
         |sub AS (
         |  SELECT l_orderkey,
         |    list_transform(
         |      list_filter(range(1, len(items) + 1),
         |                  i -> ((mask >> (i - 1)::INT) & 1) = 1),
         |      i -> items[i]) AS subset
         |  FROM ftx JOIN masks ON mask < (1 << len(items))
         |)
         |SELECT list_aggregate(subset, 'string_agg', ' ') AS itemset,
         |       count(*) AS cnt
         |FROM sub
         |WHERE len(subset) >= 2
         |GROUP BY 1 HAVING count(*) >= ${Support}""".stripMargin,
    "apriori_assoc_rules" ->
      s"""WITH $subSql,
         |freqsets AS (
         |  SELECT subset, count(*) AS zcnt FROM sub
         |  WHERE len(subset) >= 2 GROUP BY 1 HAVING count(*) >= ${Support}
         |),
         |ante AS (
         |  SELECT
         |    list_aggregate(list_transform(
         |      list_filter(range(1, len(f.subset) + 1),
         |                  i -> ((m.mask >> (i - 1)::INT) & 1) = 1),
         |      i -> f.subset[i]), 'string_agg', ' ') AS antecedent,
         |    list_aggregate(list_transform(
         |      list_filter(range(1, len(f.subset) + 1),
         |                  i -> ((m.mask >> (i - 1)::INT) & 1) = 0),
         |      i -> f.subset[i]), 'string_agg', ' ') AS consequent,
         |    f.zcnt
         |  FROM freqsets f
         |  JOIN masks m ON m.mask >= 1 AND m.mask < (1 << len(f.subset)) - 1
         |)
         |SELECT a.antecedent, a.consequent,
         |       a.zcnt * 100.0 / s.cnt AS confidence
         |FROM ante a JOIN supports s ON a.antecedent = s.itemset""".stripMargin,
    "apriori_rules_metrics" ->
      s"""WITH $subSql,
         |freqsets AS (
         |  SELECT subset, count(*) AS zcnt FROM sub
         |  WHERE len(subset) >= 2 GROUP BY 1 HAVING count(*) >= ${Support}
         |),
         |ante AS (
         |  SELECT
         |    list_aggregate(list_transform(
         |      list_filter(range(1, len(f.subset) + 1),
         |                  i -> ((m.mask >> (i - 1)::INT) & 1) = 1),
         |      i -> f.subset[i]), 'string_agg', ' ') AS antecedent,
         |    list_aggregate(list_transform(
         |      list_filter(range(1, len(f.subset) + 1),
         |                  i -> ((m.mask >> (i - 1)::INT) & 1) = 0),
         |      i -> f.subset[i]), 'string_agg', ' ') AS consequent,
         |    f.zcnt
         |  FROM freqsets f
         |  JOIN masks m ON m.mask >= 1 AND m.mask < (1 << len(f.subset)) - 1
         |),
         |n AS (SELECT count(*)::BIGINT AS n_tx FROM tx)
         |SELECT a.antecedent, a.consequent,
         |  a.zcnt * 100.0 / x.cnt AS confidence,
         |  (a.zcnt::DOUBLE * n.n_tx::DOUBLE)
         |    / (x.cnt::DOUBLE * y.cnt::DOUBLE) AS lift,
         |  a.zcnt::DOUBLE / n.n_tx::DOUBLE
         |    - (x.cnt::DOUBLE / n.n_tx::DOUBLE)
         |      * (y.cnt::DOUBLE / n.n_tx::DOUBLE) AS leverage
         |FROM ante a
         |JOIN supports x ON a.antecedent = x.itemset
         |JOIN supports y ON a.consequent = y.itemset
         |CROSS JOIN n""".stripMargin
  )
}
