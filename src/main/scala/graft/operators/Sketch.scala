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
  def quantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select(
      col("l_extendedprice").as("v"),
      concat_ws(":", col("l_orderkey"), col("l_linenumber")).as("key"))
      .select(col("v"), col("key"),
        graft.functions.Md5Uniform.uniform(col("key")).as("u"))
    val sample = li.orderBy(col("u"), col("v"), col("key"))
      .limit(QSketchK)
    def discs(src: DataFrame, prefix: String) = src.agg(
      expr(s"percentile_disc(${QSketchQs.head}) WITHIN GROUP (ORDER BY v)")
        .as(prefix + "0"),
      QSketchQs.tail.zipWithIndex.map { case (q, i) =>
        expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)")
          .as(prefix + (i + 1))
      }: _*)
    val exact = discs(li, "e")
    val est = discs(sample, "s")
    val stackArgs = QSketchQs.zipWithIndex
      .map { case (q, i) => s"'$q', e$i, s$i" }.mkString(", ")
    exact.crossJoin(est)
      .select(expr(
        s"stack(${QSketchQs.size}, $stackArgs) AS (q, exact_v, est_v)"))
      .select(col("q"), col("exact_v"), col("est_v"),
        abs(col("est_v") - col("exact_v")).as("abs_err"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_heavy_hitters" -> heavyHitters,
    "llm_quantile_sketch" -> quantileSketch
  )

  val oracle: Map[String, String] = Map(
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
