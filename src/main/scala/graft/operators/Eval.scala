package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-scale model-output evaluation — the BLEU/ROUGE side of a
  * training pipeline: once a model produces text, the eval harness
  * scores millions of (hypothesis, reference) pairs per checkpoint, and
  * that scoring is itself a corpus-scale data job (clipped n-gram
  * multiset intersection per pair, reduced to per-order corpus counts —
  * Papineni et al., "BLEU: a Method for Automatic Evaluation of Machine
  * Translation", ACL '02; Lin, "ROUGE: A Package for Automatic
  * Evaluation of Summaries", ACL '04 workshop). The reference engine has
  * no analogue; this extends the driver-mandated text-analysis scope
  * (SURVEY §2.11) with the eval-side counterpart of the curation ops.
  *
  * The fixture has no model outputs, so the hypothesis side is a
  * DETERMINISTIC degradation of each document (every [[DropEvery]]-th
  * token removed — a "model" with systematic deletions) and the
  * reference side is the document itself: real multiset-clipping
  * arithmetic on pairs that genuinely differ, with the pair source
  * swappable through [[evalNgramOverlapOf]] for a real (hyp, ref) table.
  *
  * Exactness: every count is integer (clipped matches, token totals);
  * the per-order precision/recall doubles are one deterministic
  * cast+divide each — no float accumulation, so the report hashes
  * bit-identically across engines. Brevity-penalty exponentials are
  * deliberately NOT folded in (IEEE `exp` is not pinned across
  * engines); hyp/ref totals are in the report, so any BP convention is
  * one driver-side scalar away.
  *
  * Scale shape: n-gram generation is row-local (one generator
  * expression per row, no corpus re-scan per order); the only shuffle
  * is the (doc_id, n, gram) count aggregation feeding an equi-join of
  * the two sides (hash-partitioned, never all-pairs), and everything
  * collapses to ≤ [[MaxN]] rows. Totals come straight from document
  * lengths — they never touch the gram tables.
  */
object Eval {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Highest n-gram order scored (BLEU-4 convention). */
  val MaxN = 4

  /** The synthetic "model" drops every 7th token (1-based positions). */
  val DropEvery = 7

  /** All 1..[[MaxN]] word n-grams of token array `t`, tagged with their
    * order: array of (n, gram) structs, built row-locally. Positions are
    * 0-based; a position is valid for order n iff pos + n ≤ len.
    */
  private def gramsCol(t: Column): Column =
    flatten(transform(array((1 to MaxN).map(n => lit(n)): _*),
      n => transform(
        filter(transform(t, (_, i) => i), i => i + n <= size(t)),
        i => struct(n.cast("long").as("n"),
          array_join(slice(t, i + 1, n), " ").as("gram")))))

  private def gramCounts(pairs: DataFrame, side: String): DataFrame =
    pairs.select(col("doc_id"), explode(gramsCol(col(side))).as("g"))
      .groupBy(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
      .agg(count(lit(1)).as(side + "c"))

  /** (doc_id, h tokens, r tokens) for the fixture's synthetic pairs. */
  private def hypRef(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), split(col("text"), " ").as("r"))
      .withColumn("h",
        filter(col("r"), (_, i) => (i + 1) % DropEvery =!= 0))

  def evalNgramOverlap(spark: SparkSession, dir: String): DataFrame =
    evalNgramOverlapOf(hypRef(docs(spark, dir)))

  /** `pairs`: (doc_id, h array<string>, r array<string>). Returns one
    * row per order n: (n, n_match, hyp_total, ref_total, prec, recall)
    * where n_match = Σ_docs Σ_g min(count_h(g), count_r(g)) — corpus
    * BLEU-n precision numerators and ROUGE-n recall in one table.
    */
  def evalNgramOverlapOf(pairs: DataFrame): DataFrame = {
    val hc = gramCounts(pairs, "h")
    val rc = gramCounts(pairs, "r")
    val matches = hc.join(rc, Seq("doc_id", "n", "gram"))
      .groupBy("n")
      .agg(sum(least(col("hc"), col("rc"))).as("n_match"))
    val totals = pairs
      .select(size(col("h")).cast("long").as("hl"),
        size(col("r")).cast("long").as("rl"))
      .select(explode(array((1 to MaxN).map(n => lit(n.toLong)): _*))
        .as("n"), col("hl"), col("rl"))
      .groupBy("n")
      .agg(sum(greatest(lit(0L), col("hl") - col("n") + 1L))
          .as("hyp_total"),
        sum(greatest(lit(0L), col("rl") - col("n") + 1L))
          .as("ref_total"))
    totals.join(matches, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        col("hyp_total"), col("ref_total"),
        (coalesce(col("n_match"), lit(0L)).cast("double")
          / col("hyp_total").cast("double")).as("prec"),
        (coalesce(col("n_match"), lit(0L)).cast("double")
          / col("ref_total").cast("double")).as("recall"))
  }

  private def overlapOracleSql: String =
    s"""WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS r FROM documents),
hr AS (
  SELECT doc_id, r,
    list_select(r, list_filter(range(1, len(r) + 1),
      i -> i % $DropEvery != 0)) AS h
  FROM tok),
ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
hc AS (
  SELECT doc_id, n, gram, count(*) AS hc FROM (
    SELECT doc_id, n, unnest(list_transform(range(1, len(h) - n + 2),
      i -> array_to_string(list_slice(h, i, i + n - 1), ' '))) AS gram
    FROM hr, ns) GROUP BY ALL),
rc AS (
  SELECT doc_id, n, gram, count(*) AS rc FROM (
    SELECT doc_id, n, unnest(list_transform(range(1, len(r) - n + 2),
      i -> array_to_string(list_slice(r, i, i + n - 1), ' '))) AS gram
    FROM hr, ns) GROUP BY ALL),
mt AS (
  SELECT n, sum(least(hc, rc))::BIGINT AS n_match
  FROM hc JOIN rc USING (doc_id, n, gram) GROUP BY n),
tot AS (
  SELECT n, sum(greatest(0, len(h) - n + 1))::BIGINT AS hyp_total,
    sum(greatest(0, len(r) - n + 1))::BIGINT AS ref_total
  FROM hr, ns GROUP BY n)
SELECT n::BIGINT AS n, coalesce(n_match, 0)::BIGINT AS n_match,
  hyp_total, ref_total,
  coalesce(n_match, 0)::DOUBLE / hyp_total::DOUBLE AS prec,
  coalesce(n_match, 0)::DOUBLE / ref_total::DOUBLE AS recall
FROM tot LEFT JOIN mt USING (n)"""

  /** Character cap for [[evalEditDistance]] — Levenshtein is O(a·b)
    * per pair, so production eval scoring bounds the operand length
    * (the burst-cap discipline); 200 chars keeps the row-local cost
    * constant whatever the document length.
    */
  val EditCap = 200

  /** Edit-distance histogram buckets (normalized distance deciles). */
  val EditBuckets = 10

  /** Character-level eval metric beside the n-gram table: per-pair
    * Levenshtein distance on the first [[EditCap]] chars, normalized by
    * the longer operand, bucketed into [[EditBuckets]] deciles —
    * (bucket, n_docs, sum_lev). The corpus-level view of how FAR model
    * outputs drift from references, robust to tokenization (the chrF
    * family's motivation) where n-gram overlap is not. Row-local
    * integer distances + one bounded groupBy; the double normalization
    * is one divide per row with a both-empty guard (bucket 0).
    */
  def evalEditDistance(spark: SparkSession, dir: String): DataFrame =
    evalEditDistanceOf(hypRef(docs(spark, dir)))

  /** Token slice bound for [[evalEditDistanceOf]]'s operands: the first
    * [[EditCap]] CHARS of either joined string draw on at most this many
    * leading tokens. Proof: k joined tokens span ≥ k − 1 chars
    * (separators alone, even for empty tokens), so 201 r-tokens always
    * cover the reference cap; the hypothesis keeps ≥ k − ⌊k/7⌋ of the
    * first k positions, so 235 r-tokens give ≥ 202 h-tokens ≥ 201
    * chars. 256 covers both with margin; a shorter document slices to
    * itself. Slicing BEFORE the join/cap makes the row-local prep
    * O(cap), not O(document).
    */
  private val EditSliceTokens = 256

  def evalEditDistanceOf(pairs: DataFrame): DataFrame = {
    val hs = substring(
      array_join(slice(col("h"), 1, EditSliceTokens), " "), 1, EditCap)
    val rs = substring(
      array_join(slice(col("r"), 1, EditSliceTokens), " "), 1, EditCap)
    // The capped operands are ≤ 2·EditCap chars/row while the DP is
    // O(EditCap²) char-ops/row — compute-bound at ANY scale (guide
    // §2.5 input-parallelism skew / §8 "move heavy compute behind a
    // cheap shuffle of light rows"): a single-row-group input runs the
    // whole corpus's DP in one scan task otherwise (r16 measured the
    // fixture scan at exactly 1 task, 1.74 s single-threaded).
    // Explicit numPartitions — exempt from AQE byte-based coalescing,
    // which cannot see compute-per-row (the jaccardVerify precedent).
    val n = pairs.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val capped = pairs.select(hs.as("hs"), rs.as("rs")).repartition(n)
    val lev = levenshtein(col("hs"), col("rs"))
    val mx = greatest(length(col("hs")), length(col("rs")))
    val norm = when(mx === 0, lit(0.0))
      .otherwise(lev.cast("double") / mx.cast("double"))
    capped
      .select(lev.cast("long").as("lev"),
        least(lit(EditBuckets.toLong - 1),
          floor(norm * EditBuckets).cast("long")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("lev")).as("sum_lev"))
  }

  private def editOracleSql: String =
    s"""WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS r FROM documents),
hr AS (
  SELECT doc_id,
    substr(array_to_string(list_select(r,
      list_filter(range(1, len(r) + 1), i -> i % $DropEvery != 0)),
      ' '), 1, $EditCap) AS hs,
    substr(array_to_string(r, ' '), 1, $EditCap) AS rs
  FROM tok),
d AS (
  SELECT levenshtein(hs, rs)::BIGINT AS lev,
    greatest(len(hs), len(rs)) AS mx
  FROM hr)
SELECT bucket, count(*)::BIGINT AS n_docs, sum(lev)::BIGINT AS sum_lev
FROM (
  SELECT lev,
    least(${EditBuckets - 1},
      floor((CASE WHEN mx = 0 THEN 0.0e0
             ELSE lev::DOUBLE / mx::DOUBLE END) * $EditBuckets)::BIGINT)
      AS bucket
  FROM d)
GROUP BY bucket"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_eval_ngram_overlap" -> evalNgramOverlap,
    "llm_eval_edit_distance" -> evalEditDistance)

  val oracle: Map[String, String] = Map(
    "llm_eval_ngram_overlap" -> overlapOracleSql,
    "llm_eval_edit_distance" -> editOracleSql)
}
