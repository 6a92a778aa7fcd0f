package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-size frequency sketching — the companion to
  * [[Contamination]]'s Bloom path on the COUNT side of the ledger
  * (additive §2.11; the reference's only counting op is the exact
  * wordcount reduce, apriori/apriori_final.java:49-62).
  *
  * At 100 TB the exact token-frequency table is itself big data: the
  * `word_count` groupBy exchanges one row per distinct token (billions
  * for web corpora, with a heavy tail that never matters downstream). A
  * Count-Min sketch caps the exchange at depth × width CELLS regardless
  * of corpus or vocabulary size: each occurrence increments
  * [[CmsDepth]] hashed cells, the map-side combiner collapses every
  * partition to ≤ depth·width partial cells, and the estimate for any
  * token is the MIN over its cells — an overestimate by construction
  * (collisions only ever ADD), never an undercount. That one-sided
  * error is the property the differential entry pins, exactly like the
  * Bloom filter's no-false-negative guarantee.
  *
  * Determinism: cell positions are md5 hex windows (the
  * [[graft.functions.Md5Uniform]] / Bloom recipe — engine-reproducible,
  * no seeds), counts are exact integers, and MIN over four integers is
  * order-free — so the whole estimate is bit-identical in DuckDB and
  * sits behind the hash gate.
  *
  * Scale shape: the sketch build is ONE scan — the ×[[CmsDepth]] row
  * amplification is a row-local generator above the scan, and the only
  * exchange is the (d, p) groupBy whose partial aggregation bounds
  * every map output at depth·width rows. The probe side broadcasts the
  * ≤ depth·width-row sketch; the exact top-k (the audit's baseline) is
  * the already-benched `llm_vocab_top` TakeOrderedAndProject shape.
  */
object Sketch {

  /** Sketch geometry. Width 8192 against the fixture's ~25k-token
    * vocabulary gives per-cell expected load ≈ 3 tokens, so the top-20
    * probe sees real-but-small collision overcounts (the behavior the
    * entry exists to audit); depth 4 takes the min over four
    * independent row hashes. A production run sizes width ≈ e/ε for a
    * target additive error ε·N the same way.
    */
  val CmsDepth = 4
  val CmsWidth = 8192L

  /** How many exact top-frequency tokens the audit probes. */
  val ProbeTopK = 20

  /** Cell position of `w` in sketch row `d`: disjoint 8-hex-digit md5
    * windows (offsets 1, 9, 17, 25), mod width — the
    * [[Contamination]] Bloom recipe, one row per depth.
    */
  private def cmsPos(w: Column, d: Int): Column =
    conv(substring(md5(w), 1 + 8 * d, 8), 16, 10).cast("long") % CmsWidth

  private def sqlPos(t: String, d: Int): String =
    s"('0x' || substr(md5($t), ${1 + 8 * d}, 8))::BIGINT % $CmsWidth"

  /** The sketch table: (d, p, c) with c = occurrences hashing to cell
    * (d, p). ≤ [[CmsDepth]]·[[CmsWidth]] rows total, whatever the
    * corpus size.
    */
  def cmsOf(corpus: DataFrame): DataFrame =
    corpus
      .select(explode(split(col("text"), " ")).as("word"))
      .select(posexplode(array(
        (0 until CmsDepth).map(d => cmsPos(col("word"), d)): _*))
        .as(Seq("d", "p")))
      .groupBy("d", "p")
      .agg(count(lit(1)).as("c"))

  /** Probe `words` (any DataFrame with `word`) against a sketch:
    * adds `cnt_est` = min over the word's [[CmsDepth]] cells.
    */
  def cmsEstimate(words: DataFrame, sketch: DataFrame): DataFrame =
    words
      .select(words.columns.map(col) :+
        posexplode(array((0 until CmsDepth)
          .map(d => cmsPos(col("word"), d)): _*)).as(Seq("d", "p")): _*)
      .join(broadcast(sketch), Seq("d", "p"))
      .groupBy(words.columns.map(col): _*)
      .agg(min(col("c")).as("cnt_est"))

  /** The differential audit entry: the exact top-[[ProbeTopK]] tokens
    * with their sketch estimates and the (≥ 0 by construction)
    * overcount. This is the number a pipeline owner reads before
    * trusting sketch counts for gating decisions — the same
    * exact-vs-approx framing as `llm_sim_recall`.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables(spark, dir, "documents"))

  def heavyHittersOf(corpus: DataFrame): DataFrame = {
    val exact = TextOps.wordCountOf(corpus)
      .orderBy(col("cnt").desc, col("word")).limit(ProbeTopK)
    cmsEstimate(exact, cmsOf(corpus))
      .select(col("word"), col("cnt"), col("cnt_est"),
        (col("cnt_est") - col("cnt")).as("overcount"))
  }

  // ---- mergeable quantile sketch (deterministic uniform sample) ----

  /** Sample size and probed quantiles for [[quantileSketch]]. */
  val QSketchK = 512
  val QSketchQs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** Quantile estimation from a bounded MERGEABLE sample — the numeric
    * companion to the Count-Min audit: keep the [[QSketchK]] rows with
    * the smallest md5-derived uniforms (a seedless, engine-reproducible
    * uniform sample — the KMV trick applied to sampling), estimate
    * quantiles from the sample, and report them against the exact
    * `percentile_disc` per probed q with the absolute error. At 100 TB
    * the exact side is the audit baseline only; the sketch is the scale
    * path — `orderBy(u).limit(k)` compiles to TakeOrderedAndProject
    * (per-partition bounded heaps, k-row exchange), so the shuffle is k
    * rows whatever the table size, and two sketches merge by union +
    * re-limit (the property a shard-parallel profiler needs).
    *
    * Determinism: u is the library md5 uniform over the row's unique
    * (orderkey, linenumber) key, ordering ties break on (v, key), and
    * percentile_disc picks actual values — both engines agree bit-wise.
    */
  /** Bucket count for [[exactQuantilesOf]]'s histogram pass. */
  val QSelBuckets = 4096

  /** EXACT q-quantiles of `values`' column `v` by distributed
    * bucket-histogram selection, as a (q, exact_v) table — the
    * scale-correct replacement for a global buffered `percentile_disc`
    * (which serializes every value through ONE aggregation buffer: the
    * single worst bench entry at sf0.1, and a guaranteed OOM at
    * 100 TB). Three bounded passes instead: (1) a 1-row (n, min, max)
    * aggregate broadcasts back; (2) each value buckets row-locally
    * into ≤ [[QSelBuckets]] range buckets whose histogram + prefix sum
    * is a ≤ 4096-row exchange (the tiny-window discipline of the
    * recursed shard packing); (3) only the few buckets actually
    * holding a probed rank are re-scanned and sorted — per-bucket
    * row_number over ~n/4096 rows — and the value at the rank's
    * in-bucket offset is picked. Same answers as `percentile_disc`
    * (value at rank ⌈q·n⌉ ascending — ties interchangeable), so the
    * DuckDB oracle keeps its native spelling. Degenerate constant
    * column → everything in bucket 0, still correct (one sorted
    * group).
    */
  def exactQuantilesOf(values: DataFrame, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = values.agg(count(lit(1)).as("n"),
      min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    val bucketed = values.select(col("v")).crossJoin(broadcast(stats))
      .select(col("v"),
        when(col("vmax") === col("vmin"), lit(0))
          .otherwise(least(lit(QSelBuckets - 1),
            floor((col("v") - col("vmin")) / (col("vmax") - col("vmin"))
              * QSelBuckets).cast("int"))).as("b"))
    val cum = bucketed.groupBy("b").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy("b")))
    val ranks = stats.select(explode(array(qs.map(q =>
      struct(lit(q.toString).as("q"),
        ceil(lit(q) * col("n")).cast("long").as("r"))): _*)).as("t"))
      .select(col("t.q").as("q"), col("t.r").as("r"))
    val target = ranks
      .join(broadcast(cum), col("cum") >= col("r"))
      .groupBy("q", "r").agg(min(col("b")).as("tb"))
      .join(broadcast(cum), col("b") === col("tb"))
      .select(col("q"), col("tb"),
        (col("r") - (col("cum") - col("c"))).as("local_r"))
    bucketed
      .join(broadcast(target.select(col("tb"), col("local_r"), col("q"))),
        col("b") === col("tb"))
      // two probed ranks can share a bucket, duplicating its rows in
      // the join — rank within (bucket, q) so each probe counts its
      // own copy exactly once
      .withColumn("lr", row_number().over(
        Window.partitionBy("b", "q").orderBy("v")).cast("long"))
      .where(col("lr") === col("local_r"))
      .select(col("q"), col("v").as("exact_v"))
  }

  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select(
      col("l_extendedprice").as("v"),
      concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("key"))
      .select(col("v"), col("key"),
        graft.functions.Md5Uniform.uniform(col("key")).as("u"))
    val sample = li.orderBy(col("u"), col("v"), col("key"))
      .limit(QSketchK)
    // the 512-row sample side stays a buffered percentile_disc — tiny
    // by construction; the exact side is the distributed selection
    val est = sample.agg(
      expr(s"percentile_disc(${QSketchQs.head}) WITHIN GROUP (ORDER BY v)")
        .as("s0"),
      QSketchQs.tail.zipWithIndex.map { case (q, i) =>
        expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)")
          .as("s" + (i + 1))
      }: _*)
    val estLong = est.select(explode(array(QSketchQs.zipWithIndex.map {
      case (q, i) => struct(lit(q.toString).as("q"),
        col("s" + i).as("est_v"))
    }: _*)).as("t")).select(col("t.q").as("q"), col("t.est_v").as("est_v"))
    exactQuantilesOf(li, QSketchQs)
      .join(estLong, Seq("q"))
      .select(col("q"), col("exact_v"), col("est_v"),
        abs(col("est_v") - col("exact_v")).as("abs_err"))
  }

  // ---- HyperLogLog distinct sketch (mergeable registers) ----

  /** HLL geometry: 2^9 = 512 registers addressed by the low 9 bits of a
    * 48-bit md5 hash; the remaining [[HllW]] = 39 bits feed the
    * leading-zero rank, so ranks span 1..40.
    */
  val HllP = 9
  val HllM: Long = 1L << HllP
  val HllW: Int = 48 - HllP

  /** α_m·m²·2^(W+1) — the whole estimator numerator as ONE double
    * constant, so both engines evaluate the identical literal and the
    * estimate is a single exactly-rounded division A/S.
    */
  val HllA: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM *
      java.lang.Math.pow(2.0, HllW + 1)

  /** Per-scope HLL registers of a (scope, word) stream: (scope, j, M)
    * with M = max rank over words hashing to register j — ≤ [[HllM]]
    * rows per scope whatever the stream size (the same bounded-exchange
    * contract as [[cmsOf]], on the DISTINCT side of the ledger). Rank =
    * leading zeros of the 39-bit hash suffix + 1 = 40 − bitlength(v),
    * via the minimal-width `bin()` string both engines share.
    */
  def hllRegisters(words: DataFrame): DataFrame =
    words
      .select(col("scope"), hllJ(col("word")).as("j"),
        hllRank(col("word")).as("rank"))
      .groupBy("scope", "j")
      .agg(max(col("rank")).as("M"))

  /** 48-bit md5 hash of `w` (row-local building block, also used by
    * the streaming windowed form in [[graft.streaming.Streams]]).
    */
  private def hllH(w: Column): Column =
    conv(substring(md5(w), 1, 12), 16, 10).cast("long")

  /** Register index: the low [[HllP]] bits. */
  def hllJ(w: Column): Column = hllH(w) % HllM

  /** Leading-zero rank of the remaining [[HllW]] bits (+1). */
  def hllRank(w: Column): Column = {
    val v = shiftright(hllH(w), HllP)
    when(v === 0L, lit(HllW + 1))
      .otherwise(lit(HllW + 1) - length(bin(v)))
  }

  /** Linear-counting table: LcTable(V) = m·ln(m/V) for V = 1..m empty
    * registers, precomputed ONCE in Scala and baked into both plans as
    * the identical double literals — the small-range correction without
    * any runtime `ln`, whose last-ulp behavior differs across engines.
    * (V has only m possible values, so the whole correction is a
    * lookup; `Double.toString` round-trips exactly, so the SQL literal
    * parses to the same bits `lit` carries.)
    */
  val LcTable: IndexedSeq[Double] =
    (1 to HllM.toInt).map(v => HllM * math.log(HllM.toDouble / v))

  /** The raw-vs-linear-counting switch threshold, 2.5·m. */
  val LcCut: Double = 2.5 * HllM

  /** [[LcTable]] as a DuckDB list literal of DOUBLE (`e0`-suffixed —
    * bare decimal literals parse as DECIMAL and list unification can
    * shift the last ulp). Shared with the windowed form in
    * [[graft.streaming.Streams]].
    */
  def lcSqlList: String =
    LcTable.map(_.toString + "e0").mkString("[", ", ", "]")

  /** Estimates from a register table: (scope, n_est). The harmonic sum
    * is EXACT — Σ 2^(W+1−M) over present registers plus 2^(W+1) per
    * empty register is a BIGINT (≤ 512·2^40 ≪ 2^63) — so the only
    * runtime float op is the final A/S division; below [[LcCut]] with
    * empty registers present, the estimate is the [[LcTable]] lookup
    * (the standard HLL small-range correction, here with the log table
    * a plan literal).
    */
  def hllEstimates(regs: DataFrame): DataFrame =
    regs
      .groupBy("scope")
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllW + 1} - M)")) +
        (lit(HllM) - count(lit(1))) * lit(1L << (HllW + 1))).as("S"),
        (lit(HllM) - count(lit(1))).as("V"))
      .select(col("scope"), col("V"), (lit(HllA) / col("S")).as("raw"))
      .select(col("scope"),
        when(col("raw") <= LcCut && col("V") > 0L,
          element_at(lit(LcTable.toArray), col("V").cast("int")))
          .otherwise(col("raw")).as("n_est"))

  /** The distinct-count audit: exact distinct counts against their HLL
    * estimates (512 registers, expected relative error ≈ 1.04/√512 ≈
    * 4.6%) over one stream that exercises BOTH estimator regimes — the
    * corpus's per-source token vocabularies (31 words: deep in the
    * linear-counting branch, where raw HLL would read 11× high) and
    * the order ledger's distinct order keys per return flag (~15k:
    * the raw harmonic-mean branch with real register collisions). The
    * whole-stream sketch is NOT rebuilt from the rows — it is the
    * per-scope sketches MERGED (max per register), exercising the
    * property that makes HLL the 100 TB answer: shard sketches combine
    * by a 512-row max-aggregate, so per-scope profiling and the global
    * number cost one scan total. The exact side is the audit baseline
    * only.
    */
  def distinctHll(spark: SparkSession, dir: String): DataFrame =
    distinctHllOf(Tables(spark, dir, "documents")
      .select(col("source").as("scope"),
        explode(split(col("text"), " ")).as("word"))
      .unionByName(Tables(spark, dir, "lineitem")
        .select(concat(lit("rf:"), col("l_returnflag")).as("scope"),
          col("l_orderkey").cast("string").as("word"))))

  def distinctHllOf(words: DataFrame): DataFrame = {
    // dedupe (scope, word) ONCE and feed every consumer: HLL registers
    // are max-aggregates of a per-word hash (duplicate-insensitive), and
    // both exact sides are count-distincts — so the four corpus-token
    // passes collapse to one partial-aggregated distinct exchange plus
    // three vocabulary-scale aggregates (dedupe-early; at scale the
    // only form whose downstream shuffles are bounded by vocabulary,
    // not corpus tokens). Values are bit-identical by construction.
    val dw = words.distinct()
    val perSrc = hllRegisters(dw)
    val merged = perSrc.groupBy("j").agg(max(col("M")).as("M"))
      .select(lit("ALL").as("scope"), col("j"), col("M"))
    val est = hllEstimates(perSrc.unionByName(merged))
    val exact = dw.groupBy("scope")
      .agg(count(lit(1)).as("n_exact"))
      .unionByName(dw.select("word").distinct()
        .agg(count(lit(1)).as("n_exact"))
        .select(lit("ALL").as("scope"), col("n_exact")))
    exact.join(est, Seq("scope"))
      .select(col("scope"), col("n_exact"), col("n_est"),
        ((col("n_est") - col("n_exact")) / col("n_exact")).as("rel_err"))
  }

  // ---- per-group quantile sample (bounded heaps per group) ----

  /** Per-group sample size and probed quantiles. */
  val GQK = 64
  val GQQs = Seq(0.5, 0.9)

  /** Per-source document-length quantiles from a bounded PER-GROUP
    * sample — the grouped companion to [[quantileSketch]]: keep the
    * [[GQK]] rows with the smallest md5 uniforms WITHIN EACH SOURCE
    * (the `rk ≤ k` rank filter compiles to WindowGroupLimit, so every
    * partition prunes to k rows per group map-side before the one
    * window shuffle), estimate each probed quantile from the sample,
    * and report it against the exact per-group `percentile_disc` with
    * the absolute error. At 100 TB the exact side is the audit
    * baseline; the sample side's exchange is ≤ k·|groups| rows
    * whatever the corpus, and two per-group samples merge by union +
    * re-rank — the shard-parallel profiling shape, now per stratum.
    * Determinism: the [[graft.functions.Md5Uniform]] ordering with
    * (v, doc_id) tie-breaks, integer-valued lengths, and
    * percentile_disc picking actual values — bit-identical in DuckDB.
    */
  def groupQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables(spark, dir, "documents").select(col("source"),
      col("n_chars").cast("double").as("v"), col("doc_id"),
      graft.functions.Md5Uniform.uniform(col("doc_id").cast("string"))
        .as("u"))
    val sample = base
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("u"), col("v"), col("doc_id"))))
      .where(col("rk") <= GQK)
    def discs(src: DataFrame, prefix: String) =
      src.groupBy("source").agg(
        expr(s"percentile_disc(${GQQs.head}) WITHIN GROUP (ORDER BY v)")
          .as(prefix + "0"),
        GQQs.tail.zipWithIndex.map { case (q, i) =>
          expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)")
            .as(prefix + (i + 1))
        }: _*)
    val stackArgs = GQQs.zipWithIndex
      .map { case (q, i) => s"'$q', e$i, s$i" }.mkString(", ")
    discs(base, "e").join(discs(sample, "s"), Seq("source"))
      .select(col("source"), expr(
        s"stack(${GQQs.size}, $stackArgs) AS (q, exact_v, est_v)"))
      .select(col("source"), col("q"), col("exact_v"), col("est_v"),
        abs(col("est_v") - col("exact_v")).as("abs_err"))
  }

  // ---- robust statistics (winsorize, KS drift) ----

  /** Winsorization bounds (the classic 1%/99% clip). */
  val WinsLoQ = 0.01
  val WinsHiQ = 0.99

  /** Per-source robust length statistics after winsorizing at the
    * GLOBAL p01/p99 — the outlier-clipped profile a pipeline owner
    * reads instead of a raw mean that one pathological document can
    * drag (robust-statistics cleaning, Tukey lineage). The clip bounds
    * come from [[exactQuantilesOf]]'s distributed bucket-histogram
    * selection (never a global buffered percentile), broadcast back as
    * 1 row; clipping is row-local; the per-source aggregate is one
    * map-side-combined groupBy. (source, n, n_lo, n_hi, lo, hi, min_w,
    * max_w, mean_w) — everything integer except the final mean
    * division.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame =
    winsorizeOf(Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").cast("long").as("v")))

  def winsorizeOf(docs: DataFrame): DataFrame = {
    val qs = exactQuantilesOf(docs.select(col("v")),
      Seq(WinsLoQ, WinsHiQ))
    val bounds = qs.agg(
      min(when(col("q") === WinsLoQ.toString, col("exact_v"))).as("lo"),
      min(when(col("q") === WinsHiQ.toString, col("exact_v"))).as("hi"))
    val w = greatest(least(col("v"), col("hi")), col("lo"))
    docs.crossJoin(broadcast(bounds))
      .groupBy(col("source"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        min(w).as("min_w"), max(w).as("max_w"),
        sum(w).as("sum_w"))
      .select(col("source"), col("n"), col("n_lo"), col("n_hi"),
        col("lo"), col("hi"), col("min_w"), col("max_w"),
        (col("sum_w").cast("double") / col("n").cast("double"))
          .as("mean_w"))
  }

  /** Two-sample Kolmogorov–Smirnov drift per source against the
    * baseline (smallest source name): D = max |F_s(x) − F_0(x)| over
    * the pooled support — the DISTRIBUTION-level drift monitor next to
    * `llm_quality_drift`'s mean-level signals (a source can keep its
    * mean while its shape walks away; KS sees it). (source, n, n0,
    * d_stat) for every non-baseline source.
    *
    * Scale shape: one (source, value) count aggregate (map-side
    * partial), then everything rides the bounded |support|·|sources|
    * grid — per-source prefix-sum windows, a broadcast of the
    * baseline's |support|-row CDF, and a max aggregate. The corpus is
    * scanned once; no row-level join ever happens.
    *
    * Determinism: step CDFs are exact integer prefix sums over the
    * SHARED global support (a superset of any pair's union support —
    * evaluating extra points never changes the max of step-function
    * differences), each CDF value is one exactly-rounded division, and
    * D is a max over |difference| doubles both engines compute
    * identically.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
    ksDriftOf(Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars").cast("long").as("v")))

  def ksDriftOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("c"))
    val support = counts.select("v").distinct()
    val sources = counts.select("source").distinct()
    val totals = counts.groupBy("source").agg(sum(col("c")).as("n"))
    val cdf = sources.crossJoin(support)
      .join(counts, Seq("source", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("source").orderBy("v")))
      .join(totals, "source")
      .select(col("source"), col("v"), col("n"),
        (col("cum").cast("double") / col("n").cast("double")).as("cdf"))
    val b0 = sources.agg(min(col("source")).as("bsrc"))
    val cdf0 = cdf.crossJoin(broadcast(b0))
      .where(col("source") === col("bsrc"))
      .select(col("v"), col("cdf").as("cdf0"), col("n").as("n0"))
    cdf.crossJoin(broadcast(b0))
      .where(col("source") =!= col("bsrc"))
      .join(broadcast(cdf0), "v")
      .groupBy(col("source"), col("n"), col("n0"))
      .agg(max(abs(col("cdf") - col("cdf0"))).as("d_stat"))
      .select(col("source"), col("n"), col("n0"), col("d_stat"))
  }

  /** Subsample replicas for [[subsampleCi]]. */
  val CiReplicas = 20

  /** Subsample-stability audit of a profiling statistic — the "how
    * trustworthy is this dashboard number" readout: [[CiReplicas]]
    * deterministic half-subsamples of the corpus (a salted md5 coin
    * per (replica, doc) — seedless, engine-replayable), each reporting
    * its mean document length next to the full-corpus row
    * (replica −1). The replica-to-replica spread IS the sampling
    * variability estimate (the m-out-of-n subsampling bootstrap,
    * Politis–Romano lineage — Poisson/with-replacement resampling
    * needs an RNG the determinism contract forbids).
    * (replica, n, mean_len).
    *
    * Scale shape: the replica explosion is row-local fan-out into ONE
    * map-side-combined aggregate — the corpus is scanned once and
    * 21 rows come out; nothing shuffles but partial aggregates.
    */
  def subsampleCi(spark: SparkSession, dir: String): DataFrame =
    subsampleCiOf(Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("v")))

  def subsampleCiOf(docs: DataFrame): DataFrame = {
    val coin = graft.functions.Md5Uniform.uniform(
      concat(lit("ci:"), col("replica").cast("string"), lit(":"),
        col("doc_id").cast("string"))) < 0.5
    val reps = docs
      .select(col("doc_id"), col("v"),
        explode(sequence(lit(0), lit(CiReplicas - 1))).as("replica"))
      .where(coin)
      .select(col("replica").cast("long").as("replica"), col("v"))
    val all = docs.select(lit(-1L).as("replica"), col("v"))
    reps.unionByName(all)
      .groupBy("replica")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("replica"), col("n"),
        (col("s").cast("double") / col("n").cast("double"))
          .as("mean_len"))
  }

  // ---- KMV set operations (audience overlap) ----

  /** KMV sketch size for [[audienceKmv]]. 64 against the fixture's
    * per-type audiences (150 distinct users at sf0.01, 15 at sf0.001)
    * puts sf0.01+ pairs in the ESTIMATE regime (union > k) while
    * sf0.001 lands in the exact small-set regime — both branches
    * exercised and hash-gated, the [[distinctHll]] dual-regime
    * discipline. Expected relative error ≈ 1/√64 ≈ 12%; production
    * sizes k for the error it needs.
    */
  val KmvAudK = 64

  /** Audience-overlap estimation via KMV θ-sketch SET OPERATIONS —
    * the capability that picks KMV over HLL: HLL registers union but
    * never intersect, while two KMV sketches merge (union = k smallest
    * of either) AND intersect (Beyer et al., SIGMOD 2007: ρ = the
    * fraction of the merged sketch present in both sides, and
    * |A ∩ B| ≈ ρ · |A ∪ B|_est). For every event-type pair:
    * (type_a, type_b, n_a, n_b, inter_exact, union_exact, union_est,
    * inter_est) — exact sides are the audit baseline, the sketches are
    * the scale path.
    *
    * Scale shape: ONE distinct projection of events (map-side partial
    * dedup), one per-type rank window bounded to ≤ k rows per type
    * (WindowGroupLimit — the [[graft.operators.TextOps.distinctKmvOf]]
    * shape), then everything downstream touches only |types|·k sketch
    * rows: the pair merge, the re-rank, and the 10-row estimate table.
    * At 100 TB the sketches are what ships between shards — k doubles
    * per audience, mergeable by union + re-limit.
    *
    * Determinism: hashes are the exact [[graft.functions.Md5Uniform]]
    * doubles (x/2³² — exact in IEEE), counts are integers, θ is a max,
    * and the estimators are fixed trees of exactly-rounded divisions —
    * bit-identical in DuckDB, so the approximation itself sits behind
    * the hash gate.
    */
  def audienceKmv(spark: SparkSession, dir: String): DataFrame =
    audienceKmvOf(Tables(spark, dir, "events")
      .select(col("event_type").as("t"), col("user_id")))

  def audienceKmvOf(members: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val du = members.select(col("t"), col("user_id")).distinct()
    val h = du.withColumn("u",
      graft.functions.Md5Uniform.uniform(col("user_id")))
    val sk = h
      .withColumn("rk", row_number().over(
        Window.partitionBy("t").orderBy(col("u"), col("user_id"))))
      .where(col("rk") <= KmvAudK)
      .select(col("t"), col("u"))
    val ty = du.select("t").distinct()
    val pr = ty.select(col("t").as("ta"))
      .crossJoin(ty.select(col("t").as("tb")))
      .where(col("ta") < col("tb"))
    // merged sketch per pair: distinct hashes of either side with
    // membership flags, re-ranked to the k smallest
    val m = pr.join(sk, sk("t") === col("ta") || sk("t") === col("tb"))
      .groupBy("ta", "tb", "u")
      .agg(max(when(col("t") === col("ta"), 1).otherwise(0)).as("ina"),
        max(when(col("t") === col("tb"), 1).otherwise(0)).as("inb"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("ta", "tb").orderBy("u")))
      .where(col("rk") <= KmvAudK)
    val agg = m.groupBy("ta", "tb")
      .agg(count(lit(1)).as("nm"), max(col("u")).as("theta"),
        sum(col("ina") * col("inb")).as("c"))
    val na = du.groupBy(col("t").as("ta")).agg(count(lit(1)).as("n_a"))
    val nb = du.groupBy(col("t").as("tb")).agg(count(lit(1)).as("n_b"))
    val xi = du.select(col("t").as("ta"), col("user_id"))
      .join(du.select(col("t").as("tb"), col("user_id")), "user_id")
      .where(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("inter_exact"))
    val unionEst = when(col("nm") < KmvAudK, col("nm").cast("double"))
      .otherwise(lit((KmvAudK - 1).toDouble) / col("theta"))
    val interEst = when(col("nm") < KmvAudK, col("c").cast("double"))
      .otherwise((col("c").cast("double") / lit(KmvAudK.toDouble))
        * (lit((KmvAudK - 1).toDouble) / col("theta")))
    agg.join(na, "ta").join(nb, "tb")
      .join(xi, Seq("ta", "tb"), "left")
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"),
        coalesce(col("inter_exact"), lit(0L)).as("inter_exact"),
        (col("n_a") + col("n_b")
          - coalesce(col("inter_exact"), lit(0L))).as("union_exact"),
        unionEst.as("union_est"), interEst.as("inter_est"))
  }

  /** Algebraic rollup-state reuse — incremental view maintenance for
    * plain aggregates, the EXACT counterpart of this module's sketch
    * merges (HLL registers max-merge, KMV unions re-limit; count/sum/
    * min/max merge by sum/sum/min/max). Weekly stats computed two ways
    * in one plan: DIRECT from the raw event stream, and MERGED from the
    * per-day partial-state table — side by side per week, so the hash
    * gate proves merged == direct column for column.
    *
    * Why it matters at 100 TB: the daily-partials table is O(days)
    * rows; re-aggregating a month/quarter/year reads THAT, not the raw
    * corpus — the rollup never rescans history, and a late-arriving day
    * patches one partial row. This is the contract that makes daily
    * ingestion + arbitrary-window reporting affordable; it holds
    * precisely because the states are associative-commutative monoids
    * (count/sum/min/max — and the DECIMAL sum keeps the merge EXACT,
    * where a double sum would make merge order observable).
    */
  def rollupMerge(spark: SparkSession, dir: String): DataFrame =
    rollupMergeOf(graft.streaming.Streams
      .withEventTime(Tables(spark, dir, "events"))
      .select(expr(s"ts_us div ${graft.streaming.Streams.DayUs}")
        .as("day"), col("value")))

  /** `points`: (day, value). One row per week: direct-from-raw vs
    * merged-from-daily-partials stats.
    */
  def rollupMergeOf(points: DataFrame): DataFrame = {
    val daily = points.groupBy("day").agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(24,6)")).as("s"),
      min("value").as("mn"), max("value").as("mx"))
    val merged = daily.groupBy(expr("day div 7").as("week")).agg(
      sum(col("n")).as("n_merged"),
      sum(col("s")).cast("double").as("sum_merged"),
      min("mn").as("min_merged"), max("mx").as("max_merged"))
    val direct = points.groupBy(expr("day div 7").as("week")).agg(
      count(lit(1)).as("n_direct"),
      sum(col("value").cast("decimal(24,6)")).cast("double")
        .as("sum_direct"),
      min("value").as("min_direct"), max("value").as("max_direct"))
    direct.join(merged, "week")
      .select(col("week"), col("n_direct"), col("n_merged"),
        col("sum_direct"), col("sum_merged"),
        col("min_direct"), col("min_merged"),
        col("max_direct"), col("max_merged"))
  }

  /** AMS estimator count. 32 sign rows average the single-estimator
    * variance 2F2² down to 2F2²/32 (Alon-Matias-Szegedy's analysis) —
    * ≈ 25% expected relative error, the honest budget the audit row
    * prices against the exact value.
    */
  val AmsEstimators = 32

  /** AMS F2 (second frequency moment) sketch audit (Alon, Matias &
    * Szegedy, STOC '96 — the Gödel-Prize result every join-size
    * estimator descends from): F2 = Σ_t f_t² of the token frequency
    * vector IS the self-join size on token, the number a planner needs
    * before picking a join strategy. Each of [[AmsEstimators]] rows
    * keeps one counter S_j = Σ occurrences sign_j(t) (±1 from a salted
    * md5 parity — deterministic, no RNG state), E[S_j²] = F2 exactly;
    * the estimate is the mean of squares, priced against the exact F2
    * in the same output row. Counters are trivially MERGEABLE (sums),
    * the property that lets shards sketch independently.
    * (k, sum_s2, f2_est, f2_exact, rel_err).
    *
    * Scale shape: ONE pass over the token stream exploded ×k with
    * map-side combine down to k counter rows; the exact side is the
    * usual frequency aggregate. Counters are exact BIGINTs; squares
    * ride DECIMAL(38,0)/HUGEINT; the estimate's single division and
    * the error ratio are the only doubles (fixed order both engines).
    */
  def f2Ams(spark: SparkSession, dir: String): DataFrame =
    f2AmsOf(graft.Tables(spark, dir, "documents")
      .select("doc_id", "text"))

  def f2AmsOf(corpus: DataFrame): DataFrame = {
    val d19 = "decimal(19,0)"
    val tok = corpus.select(explode(split(col("text"), " ")).as("t"))
    val sgn = lit(1L) - lit(2L) *
      (conv(substring(md5(concat(lit("ams:"),
        col("j").cast("string"), lit(":"), col("t"))), 1, 8), 16, 10)
        .cast("long") % 2L)
    val sj = tok
      .select(col("t"), explode(sequence(lit(0L),
        lit(AmsEstimators - 1L))).as("j"))
      .select(col("j"), sgn.as("sg"))
      .groupBy("j").agg(sum(col("sg")).as("sj"))
    val s2 = sj.agg(count(lit(1)).as("k"),
      sum((col("sj").cast(d19) * col("sj").cast(d19))
        .cast("decimal(38,0)")).as("s2"))
    val ex = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .agg(sum((col("c").cast(d19) * col("c").cast(d19))
        .cast("decimal(38,0)")).as("f2"))
    val est = col("s2").cast("double") / col("k").cast("double")
    s2.crossJoin(ex)
      .select(col("k"), col("s2").cast("long").as("sum_s2"),
        est.as("f2_est"), col("f2").cast("long").as("f2_exact"),
        (abs(est - col("f2").cast("double"))
          / col("f2").cast("double")).as("rel_err"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_f2_ams" -> f2Ams,
    "llm_rollup_merge" -> rollupMerge,
    "llm_heavy_hitters" -> heavyHitters,
    "llm_quantile_sketch" -> quantileSketch,
    "llm_distinct_hll" -> distinctHll,
    "llm_group_quantiles" -> groupQuantiles,
    "llm_audience_kmv" -> audienceKmv,
    "llm_winsorize" -> winsorize,
    "llm_ks_drift" -> ksDrift,
    "llm_subsample_ci" -> subsampleCi
  )

  val oracle: Map[String, String] = Map(
    // one token pass exploded ×k, ±1 from the identical salted md5
    // parity, squares through HUGEINT mirroring DECIMAL(38,0)
    "llm_f2_ams" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |sj AS (
         |  SELECT r.j,
         |    sum(1 - 2 * (('0x' || substr(md5('ams:' || r.j::VARCHAR
         |      || ':' || t), 1, 8))::BIGINT % 2))::BIGINT AS sj
         |  FROM tok, range(0, $AmsEstimators) AS r(j)
         |  GROUP BY r.j),
         |s2 AS (
         |  SELECT count(*)::BIGINT AS k,
         |    sum(sj::HUGEINT * sj::HUGEINT) AS s2
         |  FROM sj),
         |ex AS (
         |  SELECT sum(c::HUGEINT * c::HUGEINT) AS f2
         |  FROM (SELECT count(*)::BIGINT AS c FROM tok GROUP BY t))
         |SELECT k, s2::BIGINT AS sum_s2,
         |  s2::DOUBLE / k::DOUBLE AS f2_est,
         |  f2::BIGINT AS f2_exact,
         |  abs(s2::DOUBLE / k::DOUBLE - f2::DOUBLE) / f2::DOUBLE
         |    AS rel_err
         |FROM s2, ex""".stripMargin,
    "llm_rollup_merge" ->
      s"""WITH pts AS (
         |  SELECT epoch_us(ts) // ${graft.streaming.Streams.DayUs}
         |    AS day, value
         |  FROM events),
         |daily AS (
         |  SELECT day, count(*)::BIGINT AS n,
         |    SUM(CAST(value AS DECIMAL(24,6))) AS s,
         |    min(value) AS mn, max(value) AS mx
         |  FROM pts GROUP BY day),
         |merged AS (
         |  SELECT day // 7 AS week, sum(n)::BIGINT AS n_merged,
         |    CAST(sum(s) AS DOUBLE) AS sum_merged,
         |    min(mn) AS min_merged, max(mx) AS max_merged
         |  FROM daily GROUP BY 1),
         |direct AS (
         |  SELECT day // 7 AS week, count(*)::BIGINT AS n_direct,
         |    CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
         |      AS sum_direct,
         |    min(value) AS min_direct, max(value) AS max_direct
         |  FROM pts GROUP BY 1)
         |SELECT d.week, n_direct, n_merged, sum_direct, sum_merged,
         |  min_direct, min_merged, max_direct, max_merged
         |FROM direct d JOIN merged m ON d.week = m.week""".stripMargin,
    "llm_subsample_ci" ->
      s"""WITH reps AS (
         |  SELECT b.replica::BIGINT AS replica, d.n_chars::BIGINT AS v
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(0, $CiReplicas)) AS replica)
         |    b
         |  WHERE ${graft.functions.Md5Uniform.sql(
             "'ci:' || b.replica::VARCHAR || ':' || d.doc_id::VARCHAR")}
         |    < 0.5e0
         |  UNION ALL
         |  SELECT -1::BIGINT, n_chars::BIGINT FROM documents)
         |SELECT replica, count(*)::BIGINT AS n,
         |  sum(v)::BIGINT::DOUBLE / count(*)::BIGINT::DOUBLE
         |    AS mean_len
         |FROM reps GROUP BY replica""".stripMargin,
    "llm_winsorize" ->
      s"""WITH v AS (
         |  SELECT source, n_chars::BIGINT AS v FROM documents),
         |b AS (
         |  SELECT
         |    percentile_disc($WinsLoQ) WITHIN GROUP (ORDER BY v)
         |      ::BIGINT AS lo,
         |    percentile_disc($WinsHiQ) WITHIN GROUP (ORDER BY v)
         |      ::BIGINT AS hi
         |  FROM v)
         |SELECT source, count(*)::BIGINT AS n,
         |  sum(CASE WHEN v.v < lo THEN 1 ELSE 0 END)::BIGINT AS n_lo,
         |  sum(CASE WHEN v.v > hi THEN 1 ELSE 0 END)::BIGINT AS n_hi,
         |  lo, hi,
         |  min(greatest(least(v.v, hi), lo))::BIGINT AS min_w,
         |  max(greatest(least(v.v, hi), lo))::BIGINT AS max_w,
         |  sum(greatest(least(v.v, hi), lo))::BIGINT::DOUBLE
         |    / count(*)::BIGINT::DOUBLE AS mean_w
         |FROM v, b
         |GROUP BY source, lo, hi""".stripMargin,
    "llm_ks_drift" ->
      """WITH c AS (
        |  SELECT source, n_chars::BIGINT AS v, count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2),
        |sup AS (SELECT DISTINCT v FROM c),
        |src AS (SELECT DISTINCT source FROM c),
        |tot AS (SELECT source, sum(c)::BIGINT AS n FROM c GROUP BY 1),
        |grid AS (
        |  SELECT s.source, sup.v, coalesce(c.c, 0)::BIGINT AS c
        |  FROM src s CROSS JOIN sup
        |  LEFT JOIN c ON c.source = s.source AND c.v = sup.v),
        |cdf AS (
        |  SELECT g.source, g.v, t.n,
        |    (sum(g.c) OVER (PARTITION BY g.source ORDER BY g.v))
        |      ::BIGINT::DOUBLE / t.n::DOUBLE AS cdf
        |  FROM grid g JOIN tot t ON t.source = g.source),
        |b0 AS (SELECT min(source) AS bsrc FROM c),
        |c0 AS (
        |  SELECT v, cdf AS cdf0, n AS n0 FROM cdf, b0
        |  WHERE cdf.source = b0.bsrc)
        |SELECT cdf.source, cdf.n, c0.n0,
        |  max(abs(cdf.cdf - c0.cdf0)) AS d_stat
        |FROM cdf
        |CROSS JOIN b0
        |JOIN c0 ON c0.v = cdf.v
        |WHERE cdf.source != b0.bsrc
        |GROUP BY 1, 2, 3""".stripMargin,
    "llm_audience_kmv" -> {
      val u = graft.functions.Md5Uniform.sql("user_id::VARCHAR")
      s"""WITH du AS (
         |  SELECT DISTINCT event_type AS t, user_id FROM events),
         |h AS (SELECT t, user_id, $u AS u FROM du),
         |sk AS (SELECT t, u FROM (
         |  SELECT t, u, row_number() OVER (PARTITION BY t
         |    ORDER BY u, user_id) AS rk FROM h)
         |  WHERE rk <= $KmvAudK),
         |ty AS (SELECT DISTINCT t FROM du),
         |pr AS (SELECT a.t AS ta, b.t AS tb
         |       FROM ty a JOIN ty b ON a.t < b.t),
         |m0 AS (
         |  SELECT pr.ta, pr.tb, sk.u,
         |    max(CASE WHEN sk.t = pr.ta THEN 1 ELSE 0 END) AS ina,
         |    max(CASE WHEN sk.t = pr.tb THEN 1 ELSE 0 END) AS inb
         |  FROM pr JOIN sk ON sk.t = pr.ta OR sk.t = pr.tb
         |  GROUP BY 1, 2, 3),
         |m AS (SELECT * FROM (
         |  SELECT m0.*, row_number() OVER (PARTITION BY ta, tb
         |    ORDER BY u) AS rk FROM m0)
         |  WHERE rk <= $KmvAudK),
         |agg AS (
         |  SELECT ta, tb, count(*)::BIGINT AS nm, max(u) AS theta,
         |    sum(ina * inb)::BIGINT AS c
         |  FROM m GROUP BY 1, 2),
         |na AS (SELECT t AS ta, count(*)::BIGINT AS n_a
         |       FROM du GROUP BY 1),
         |nb AS (SELECT t AS tb, count(*)::BIGINT AS n_b
         |       FROM du GROUP BY 1),
         |xi AS (
         |  SELECT a.t AS ta, b.t AS tb, count(*)::BIGINT AS inter_exact
         |  FROM du a JOIN du b
         |    ON a.user_id = b.user_id AND a.t < b.t
         |  GROUP BY 1, 2)
         |SELECT agg.ta AS type_a, agg.tb AS type_b, n_a, n_b,
         |  coalesce(inter_exact, 0)::BIGINT AS inter_exact,
         |  (n_a + n_b - coalesce(inter_exact, 0))::BIGINT AS union_exact,
         |  CASE WHEN nm < $KmvAudK THEN nm::DOUBLE
         |       ELSE ${(KmvAudK - 1).toDouble}e0 / theta END AS union_est,
         |  CASE WHEN nm < $KmvAudK THEN c::DOUBLE
         |       ELSE (c::DOUBLE / ${KmvAudK.toDouble}e0)
         |         * (${(KmvAudK - 1).toDouble}e0 / theta) END AS inter_est
         |FROM agg
         |JOIN na ON na.ta = agg.ta
         |JOIN nb ON nb.tb = agg.tb
         |LEFT JOIN xi ON xi.ta = agg.ta AND xi.tb = agg.tb""".stripMargin
    },
    "llm_group_quantiles" -> {
      val u = graft.functions.Md5Uniform.sql("doc_id::VARCHAR")
      def discs(prefix: String) = GQQs.zipWithIndex
        .map { case (q, i) => s"quantile_disc(v, $q) AS $prefix$i" }
        .mkString(", ")
      val unioned = GQQs.zipWithIndex.map { case (q, i) =>
        s"""SELECT source, '$q' AS q, e$i AS exact_v, s$i AS est_v
           |FROM exact JOIN est USING (source)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT source, n_chars::DOUBLE AS v, doc_id, $u AS u
         |  FROM documents),
         |sample AS (
         |  SELECT source, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY source
         |      ORDER BY u, v, doc_id) AS rk FROM base)
         |  WHERE rk <= $GQK),
         |exact AS (SELECT source, ${discs("e")} FROM base GROUP BY source),
         |est AS (SELECT source, ${discs("s")} FROM sample GROUP BY source)
         |SELECT source, q, exact_v, est_v,
         |  abs(est_v - exact_v) AS abs_err
         |FROM ($unioned)""".stripMargin
    },
    "llm_distinct_hll" -> {
      val w1 = HllW + 1
      s"""WITH words AS (
         |  SELECT source AS scope, unnest(string_split(text, ' ')) AS word
         |  FROM documents
         |  UNION ALL
         |  SELECT 'rf:' || l_returnflag AS scope,
         |    l_orderkey::VARCHAR AS word
         |  FROM lineitem),
         |hashed AS (
         |  SELECT scope,
         |    ('0x' || substr(md5(word), 1, 12))::BIGINT % $HllM AS j,
         |    ('0x' || substr(md5(word), 1, 12))::BIGINT // $HllM AS v
         |  FROM words),
         |per_src AS (
         |  SELECT scope, j,
         |    max(CASE WHEN v = 0 THEN $w1
         |        ELSE $w1 - length(bin(v)) END) AS M
         |  FROM hashed GROUP BY scope, j),
         |regs AS (
         |  SELECT * FROM per_src
         |  UNION ALL
         |  SELECT 'ALL' AS scope, j, max(M) AS M FROM per_src GROUP BY j),
         |sums AS (
         |  SELECT scope,
         |    (sum(1::BIGINT << ($w1 - M))
         |      + ($HllM - count(*)) * (1::BIGINT << $w1))::BIGINT AS S,
         |    ($HllM - count(*))::BIGINT AS V
         |  FROM regs GROUP BY scope),
         |est AS (
         |  SELECT scope,
         |    CASE WHEN $HllA / S <= $LcCut AND V > 0
         |      THEN $lcSqlList[V::INT]
         |      ELSE $HllA / S END AS n_est
         |  FROM sums),
         |exact AS (
         |  SELECT scope, count(DISTINCT word)::BIGINT AS n_exact
         |  FROM words GROUP BY scope
         |  UNION ALL
         |  SELECT 'ALL', count(DISTINCT word)::BIGINT FROM words)
         |SELECT scope, n_exact, n_est,
         |  (n_est - n_exact) / n_exact AS rel_err
         |FROM exact JOIN est USING (scope)""".stripMargin
    },
    "llm_heavy_hitters" -> {
      val posList = (0 until CmsDepth)
        .map(d => sqlPos("word", d)).mkString("[", ", ", "]")
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
         |           FROM documents),
         |exact AS (SELECT word, count(*)::BIGINT AS cnt FROM w
         |          GROUP BY word ORDER BY cnt DESC, word
         |          LIMIT $ProbeTopK),
         |cells AS (SELECT d, p, count(*)::BIGINT AS c FROM (
         |            SELECT generate_subscripts(ps, 1) - 1 AS d,
         |                   unnest(ps) AS p
         |            FROM (SELECT $posList AS ps FROM w))
         |          GROUP BY d, p),
         |probe AS (SELECT word, cnt,
         |            generate_subscripts(ps, 1) - 1 AS d, unnest(ps) AS p
         |          FROM (SELECT word, cnt, $posList AS ps FROM exact))
         |SELECT word, cnt, min(c)::BIGINT AS cnt_est,
         |  (min(c) - cnt)::BIGINT AS overcount
         |FROM probe JOIN cells USING (d, p)
         |GROUP BY word, cnt""".stripMargin
    },
    "llm_quantile_sketch" -> {
      val u = graft.functions.Md5Uniform.sql(
        "l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR")
      def discs(src: String, prefix: String) = QSketchQs.zipWithIndex
        .map { case (q, i) =>
          s"quantile_disc(v, $q) AS $prefix$i"
        }.mkString(", ")
      val unioned = QSketchQs.zipWithIndex.map { case (q, i) =>
        s"""SELECT '$q' AS q, e$i AS exact_v, s$i AS est_v,
           |  abs(s$i - e$i) AS abs_err FROM exact, est""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |  SELECT l_extendedprice AS v,
         |    l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR AS key,
         |    $u AS u
         |  FROM lineitem),
         |sample AS (SELECT v FROM base ORDER BY u, v, key
         |           LIMIT $QSketchK),
         |exact AS (SELECT ${discs("base", "e")} FROM base),
         |est AS (SELECT ${discs("sample", "s")} FROM sample)
         |$unioned""".stripMargin
    }
  )
}
