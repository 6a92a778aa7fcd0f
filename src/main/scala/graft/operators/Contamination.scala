package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Benchmark-decontamination check (SURVEY.md §2.11 extension): flag
  * training documents that share any word n-gram with a held-out
  * evaluation set — the standard "did the benchmark leak into the
  * pretraining corpus?" gate an LLM-data pipeline runs before training
  * (n-gram-overlap decontamination as popularized by the GPT-3 and PaLM
  * dataset reports; the reference engine has no analogue — this extends
  * its text modality, reusing the tokenize-and-shingle shape of
  * `apriori/apriori_final.java:50-51`'s whitespace tokenizer).
  *
  * Scale shape: the eval side is a BENCHMARK — bounded and small by
  * construction (thousands of docs, not billions) — so its distinct
  * shingle set is broadcast and the 100 TB train side streams through a
  * broadcast semi-join with zero shuffle; the only exchange is the final
  * per-doc hit count over the (rare) matching rows. The train corpus is
  * never repartitioned and never self-joined.
  */
object Contamination {

  /** Overlap n-gram width. Real pipelines use 8–13-gram exact overlap;
    * 5 keeps the check meaningful on the fixture's short docs (min 10
    * tokens) while staying well above single-word noise.
    */
  val NgramWidth = 5

  /** Deterministic pseudo-benchmark split of the fixture corpus: every
    * 37th doc_id acts as the eval set, the rest as the train side.
    */
  val EvalMod = 37L

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text")

  /** Distinct word n-gram shingles — the [[Shingles]] convention shared
    * with [[Dedup]]'s indexes.
    */
  private def shingles(n: Int): Column = Shingles.shingles(n)

  /** Per-train-doc contamination report against an eval corpus: how many
    * of the doc's distinct [[NgramWidth]]-grams appear anywhere in the
    * eval set, and the boolean gate. Emits EVERY train doc (zero-hit docs
    * included) so the output is a complete audit table, not just the
    * contaminated tail.
    */
  def decontaminateOf(train: DataFrame, eval: DataFrame): DataFrame = {
    val evalGrams = eval.select(explode(shingles(NgramWidth)).as("g"))
      .distinct()
    val trainGrams = train
      .select(col("doc_id"), explode(shingles(NgramWidth)).as("g"))
    // both sides are distinct on (doc_id, g) / (g), so the join emits one
    // row per contaminated shingle occurrence — count(*) is the hit count
    val hits = trainGrams.join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_ngrams"))
    // hits only contains docs that actually overlap the benchmark — rare
    // by construction (the same bounded-benchmark assumption that lets
    // evalGrams broadcast) — so the audit left-join broadcasts it too;
    // without the hint the post-aggregate's static size estimate would
    // pick a sort-merge join and shuffle the full train corpus
    train.select("doc_id")
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_ngrams"), lit(0L)).as("n_hit_ngrams"))
      .withColumn("contaminated", col("n_hit_ngrams") > 0)
  }

  /** Fixture entry: eval = doc_id ≡ 0 (mod [[EvalMod]]), train = rest. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    decontaminateOf(
      d.where(col("doc_id") % EvalMod =!= 0),
      d.where(col("doc_id") % EvalMod === 0))
  }

  /** Shingle widths the sensitivity sweep prices. */
  val SweepWidths: Seq[Int] = Seq(3, 5, 8)

  /** Decontamination sensitivity sweep — the tuning curve behind the
    * [[NgramWidth]] = 5 choice: the same train-vs-eval overlap audit at
    * 3-, 5- and 8-gram shingles, each width one (n, contaminated-docs,
    * hit-shingles) row. Short shingles over-flag (natural phrase reuse
    * collides); long ones under-flag (one changed word breaks the
    * window) — the sweep shows where THIS corpus sits on that trade,
    * the same measure-don't-assert framing as `llm_sim_recall` /
    * `llm_dedup_recall` / `llm_vocab_coverage`. Per width the eval
    * shingle set broadcasts and the train side never shuffles — three
    * passes of the production plan, nothing new at scale.
    */
  def contamSweep(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val train = d.where(col("doc_id") % EvalMod =!= 0)
    val eval = d.where(col("doc_id") % EvalMod === 0)
    SweepWidths.map { n =>
      val evalGrams = eval.select(explode(shingles(n)).as("g")).distinct()
      val hits = train
        .select(col("doc_id"), explode(shingles(n)).as("g"))
        .join(broadcast(evalGrams), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("h"))
      hits.agg(count(lit(1)).as("n_contaminated"),
          coalesce(sum(col("h")), lit(0L)).as("n_hit_ngrams"))
        .select(lit(n.toLong).as("ngram_n"), col("n_contaminated"),
          col("n_hit_ngrams"))
    }.reduce(_.unionByName(_))
  }

  /** Heavy-contamination flag threshold for [[contamFracOf]]: a doc
    * whose eval-overlapping shingles exceed this fraction of its own
    * distinct shingles is flagged. Any-overlap (the [[decontaminateOf]]
    * gate) is the conservative pre-training drop; the FRACTION is what
    * distinguishes a doc that quotes one benchmark sentence from a doc
    * that IS the benchmark — the graded report the GPT-3/PaLM appendix
    * methodology actually computes before choosing a drop rule.
    */
  val FracThreshold = 0.05

  /** Per-train-doc overlap FRACTION against the eval corpus: the doc's
    * distinct [[NgramWidth]]-gram count, how many of those appear in the
    * eval set, their ratio, and the heavy-contamination flag.
    *
    * Determinism: both counts are exact integers (the shingle set is
    * distinct by construction, so the row-local `size` and the
    * post-join `count(*)` agree with DuckDB exactly) and the fraction is
    * ONE IEEE division — bit-stable across engines. A doc too short to
    * have any shingle reports NaN, not an ANSI divide error.
    *
    * Scale shape: identical to [[decontaminateOf]] — the doc's own
    * shingle count is row-local arithmetic in the scan projection (no
    * extra aggregation over the exploded grams), the eval set broadcasts,
    * and the only exchange is the per-doc hit count over the rare
    * matching rows.
    */
  def contamFracOf(train: DataFrame, eval: DataFrame): DataFrame = {
    val evalGrams = eval.select(explode(shingles(NgramWidth)).as("g"))
      .distinct()
    val withN = train.select(col("doc_id"),
      shingles(NgramWidth).as("s"))
      .select(col("doc_id"), col("s"),
        size(col("s")).cast("long").as("n_grams"))
    val hits = withN
      .select(col("doc_id"), explode(col("s")).as("g"))
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_ngrams"))
    val frac = coalesce(
      try_divide(col("n_hit_ngrams").cast("double"),
        col("n_grams").cast("double")),
      lit(Double.NaN))
    withN.select("doc_id", "n_grams")
      .join(broadcast(hits), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit_ngrams"), lit(0L)).as("n_hit_ngrams"))
      .select(col("doc_id"), col("n_grams"), col("n_hit_ngrams"),
        frac.as("overlap_frac"),
        (frac >= FracThreshold).as("heavy"))
  }

  /** Fixture entry: same train/eval split as [[decontaminate]]. */
  def contamFrac(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    contamFracOf(
      d.where(col("doc_id") % EvalMod =!= 0),
      d.where(col("doc_id") % EvalMod === 0))
  }

  // ---- Bloom-filter decontamination: the compact at-scale path ----

  /** Filter size in bits and the word width the bitset is sharded into.
    * Sizing is the visible design decision: at 4096 bits the fixture's
    * ~60-gram docs saturate (measured: 448/486 docs flagged vs 3 truly
    * contaminated — a per-gram FP of ~5% ORs to ~95% per doc), because
    * the DOC-level flag amplifies the per-gram rate by the gram count.
    * 131072 bits puts the per-gram FP near 6e-5: measured 5 flagged vs
    * 3 exact at sf0.001 and 3 vs 1 at sf0.01 — false positives real
    * and visible, but rare, with the no-false-negative guarantee
    * spec-pinned. A production run sizes m the same way
    * (m ≈ −n·ln p / ln²2 against the per-DOC budget p/grams-per-doc).
    * 32-bit words keep every mask a small positive BIGINT — no sign
    * games in either engine.
    */
  val BloomBits = 131072
  val BloomWordBits = 32

  /** k = 2 positions per gram from disjoint md5 hex windows — the
    * [[graft.functions.Md5Uniform]] recipe, engine-reproducible.
    */
  private def bloomPos(g: Column, hexOff: Int): Column =
    conv(substring(md5(g), hexOff, 8), 16, 10).cast("long") % BloomBits

  /** Bloom-filter decontamination — what the any-overlap gate
    * ([[decontaminateOf]]) becomes when the eval set is too large to
    * broadcast as raw shingles: the eval grams fold into a fixed
    * [[BloomBits]]-bit filter (4096 (word, bits) rows ≈ 32 KB — vs
    * megabytes-to-gigabytes of shingle strings), and every train gram
    * probes the filter. One-sided by construction: a Bloom filter has NO false
    * negatives, so `n_bloom_hits >= ` the exact `n_hit_ngrams` per doc
    * and every truly contaminated doc is flagged; the overcount is the
    * tunable FP price (spec-pinned against the exact entry).
    *
    * Scale shape: the filter build reduces eval grams to ≤ m/32 rows
    * via one map-side-combined `bit_or`; the probe side is row-local
    * hash arithmetic plus two broadcast joins of the ≤ 128-row filter;
    * the per-doc report is ONE aggregation of the exploded grams
    * (n_grams rides the group key — no audit re-join of the corpus,
    * which even the exact entry needs). The train corpus is never
    * shuffled, never re-scanned.
    */
  def decontamBloomOf(train: DataFrame, eval: DataFrame): DataFrame = {
    val pos = eval.select(explode(shingles(NgramWidth)).as("g"))
      .distinct()
      .select(explode(array(bloomPos(col("g"), 1),
        bloomPos(col("g"), 9))).as("p"))
    val bloom = pos
      .select(expr(s"p div $BloomWordBits").as("word"),
        expr(s"shiftleft(1L, cast(p % $BloomWordBits as int))").as("m"))
      .groupBy("word").agg(bit_or(col("m")).as("bits"))
    val grams = train
      .select(col("doc_id"), shingles(NgramWidth).as("s"))
      .select(col("doc_id"), size(col("s")).cast("long").as("n_grams"),
        explode(col("s")).as("g"))
      .select(col("doc_id"), col("n_grams"),
        bloomPos(col("g"), 1).as("p1"), bloomPos(col("g"), 9).as("p2"))
    val b1 = bloom.select(col("word").as("w1"), col("bits").as("bits1"))
    val b2 = bloom.select(col("word").as("w2"), col("bits").as("bits2"))
    def bitSet(bits: Column, pName: String): Column =
      (bits.bitwiseAND(expr(
        s"shiftleft(1L, cast($pName % $BloomWordBits as int))"))
        =!= 0L)
    grams
      .join(broadcast(b1),
        expr(s"p1 div $BloomWordBits") === col("w1"), "left")
      .join(broadcast(b2),
        expr(s"p2 div $BloomWordBits") === col("w2"), "left")
      .select(col("doc_id"), col("n_grams"),
        when(bitSet(coalesce(col("bits1"), lit(0L)), "p1")
          && bitSet(coalesce(col("bits2"), lit(0L)), "p2"), 1L)
          .otherwise(0L).as("hit"))
      .groupBy("doc_id", "n_grams")
      .agg(sum(col("hit")).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_bloom_hits"),
        (col("n_bloom_hits") > 0L).as("contaminated_bloom"))
  }

  /** The eval set's filter materialized to its dense form: one
    * [[BloomBits]]/[[BloomWordBits]]-element Long array (32 KB — the
    * whole point of the Bloom path is that THIS is what ships, not the
    * shingles). The build is the same map-side-combined bit_or as
    * [[decontamBloomOf]]'s distributed form; the collect is bounded at
    * m/32 rows by construction.
    */
  def bloomFilterOf(eval: DataFrame): Array[Long] = {
    val words = eval.select(explode(shingles(NgramWidth)).as("g"))
      .distinct()
      .select(explode(array(bloomPos(col("g"), 1),
        bloomPos(col("g"), 9))).as("p"))
      .select(expr(s"p div $BloomWordBits").as("word"),
        expr(s"shiftleft(1L, cast(p % $BloomWordBits as int))").as("m"))
      .groupBy("word").agg(bit_or(col("m")).as("bits"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1)))
    val dense = new Array[Long]((BloomBits / BloomWordBits).toInt)
    words.foreach { case (w, b) => dense(w) = b }
    dense
  }

  /** Probe `train` against a materialized filter — the filter rides the
    * plan as ONE array literal, so the whole probe is row-local
    * expressions (two element_at bit tests per gram) + the per-doc
    * aggregation: no joins at all, which is [[decontamBloomOf]]'s two
    * broadcast joins removed. This is the shape a production run uses —
    * the filter is built once per eval-set release ([[bloomFilterOf]]),
    * then every ingest batch probes it as a constant.
    */
  def decontamBloomWith(train: DataFrame, filter: Array[Long]): DataFrame = {
    val bits = typedLit(filter.toSeq)
    def hit(pName: String): Column =
      (element_at(bits, (expr(s"$pName div $BloomWordBits") + 1)
        .cast("int"))
        .bitwiseAND(expr(
          s"shiftleft(1L, cast($pName % $BloomWordBits as int))"))
        =!= 0L)
    def posFromHash(hexOff: Int): Column =
      conv(substring(col("h"), hexOff, 8), 16, 10).cast("long") % BloomBits
    train
      .select(col("doc_id"), shingles(NgramWidth).as("s"))
      .select(col("doc_id"), size(col("s")).cast("long").as("n_grams"),
        explode(col("s")).as("g"))
      // hash ONCE per gram, slice both windows from the shared hex —
      // the md5 is the probe's dominant cost and relying on codegen
      // subexpression elimination across projections is not a contract
      .select(col("doc_id"), col("n_grams"), md5(col("g")).as("h"))
      .select(col("doc_id"), col("n_grams"),
        posFromHash(1).as("p1"), posFromHash(9).as("p2"))
      .select(col("doc_id"), col("n_grams"),
        when(hit("p1") && hit("p2"), 1L).otherwise(0L).as("hit"))
      .groupBy("doc_id", "n_grams")
      .agg(sum(col("hit")).as("n_bloom_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_bloom_hits"),
        (col("n_bloom_hits") > 0L).as("contaminated_bloom"))
  }

  /** Session-lifetime materialized filter per (session, dir) — the
    * [[graft.operators.Similarity]] centroid-cache contract: the eval
    * set is a fixture table, so its 32 KB filter is built once and
    * every entry invocation (and bench rep) probes the literal.
    */
  private val bloomCache =
    new graft.SessionCache[String, Array[Long]](_ => ())

  private def cachedBloom(spark: SparkSession, dir: String): Array[Long] =
    bloomCache.getOrBuild(spark, dir)(bloomFilterOf(
      docs(spark, dir).where(col("doc_id") % EvalMod === 0)))

  def invalidateBloom(spark: SparkSession = null, dir: String = null)
      : Unit =
    bloomCache.invalidate(spark, k => dir == null || k == dir)

  /** Fixture entry: same train/eval split as [[decontaminate]], the
    * probe riding the session-cached literal filter.
    */
  def decontamBloom(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    decontamBloomWith(
      d.where(col("doc_id") % EvalMod =!= 0),
      cachedBloom(spark, dir))
  }

  // ---- semantic (embedding-space) decontamination ----

  /** Synthetic eval-benchmark size and the copy stride / flag cut for
    * [[contamSemantic]]. Threshold 0.9 sits far above the fixture's
    * max natural pair cosine (≈ 0.48) and far below a verbatim copy's
    * 1.0 — the audit separates cleanly by construction.
    */
  val SemEvalN = 40
  val SemCopyStride = 7L
  val SemThreshold = 0.9

  /** SEMANTIC decontamination — the embedding-space companion to the
    * lexical n-gram overlap gates above (the check that catches a
    * paraphrased or re-tokenized benchmark leak an exact-shingle match
    * misses): for every eval item, its nearest train vector by cosine
    * and the threshold flag. Eval benchmarks are bounded by
    * construction, so the eval side BROADCASTS into one partition-
    * parallel scan of the train corpus ([[Similarity]]'s brute-force
    * kernel discipline — the train side never shuffles for scoring;
    * only |eval|·|train-partition| scored rows enter the per-eval
    * ranking window, and the rank-1 cut is WindowGroupLimit-prunable).
    *
    * Fixture eval set (injected, the PII-scrub synthetic rule): eval
    * item i is a VERBATIM COPY of train vector i·[[SemCopyStride]] when
    * i is even (a true leak → max_cos 1.0 at that train id) and the
    * REVERSED train vector when i is odd (deterministically clean —
    * reversal decorrelates, landing in the natural-pair cosine range).
    * The oracle replays injection + exact ranking, so the kernel, the
    * argmax tie-break (cos DESC, train id ASC) and the flag are all
    * hash-verified. (eval_id, top_train_id, max_cos, contaminated).
    */
  def contamSemantic(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val eval = emb.where(col("vec_id") % SemCopyStride === 0
        && col("vec_id") < SemEvalN * SemCopyStride)
      .select((col("vec_id") / SemCopyStride).cast("long").as("eval_id"),
        when((col("vec_id") / SemCopyStride).cast("long") % 2 === 0,
          col("e")).otherwise(reverse(col("e"))).as("e"))
    contamSemanticOf(emb, eval)
  }

  /** Any bounded eval (eval_id, e) against any train (vec_id, e). */
  def contamSemanticOf(train: DataFrame, eval: DataFrame): DataFrame = {
    val spark = train.sparkSession
    val s = spark; import s.implicits._
    val qs = eval.as[(Long, Array[Double])].collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(qs)
    val scored = train.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val q = bc.value
        it.flatMap { case (tid, te) =>
          q.iterator.map { case (qid, qe) =>
            (qid, tid, Hashing.cosineSeq(qe, te))
          }
        }
      }
      .toDF("eval_id", "top_train_id", "max_cos")
    scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("eval_id")
          .orderBy(col("max_cos").desc, col("top_train_id"))))
      .where(col("rk") === 1)
      .select(col("eval_id"), col("top_train_id"), col("max_cos"),
        (col("max_cos") >= SemThreshold).as("contaminated"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_decontaminate" -> decontaminate,
    "llm_contam_sweep" -> contamSweep,
    "llm_contam_frac" -> contamFrac,
    "llm_contam_semantic" -> contamSemantic,
    "llm_decontam_bloom" -> decontamBloom
  )

  val oracle: Map[String, String] = Map(
    // injection replay: even eval ids are verbatim copies of train
    // vector eval_id*stride, odd ids the reversed vector; then the
    // exact cosine argmax with the same (cos DESC, id ASC) tie-break
    "llm_contam_semantic" ->
      s"""WITH ev AS (
         |  SELECT (vec_id // $SemCopyStride)::BIGINT AS eval_id,
         |    CASE WHEN (vec_id // $SemCopyStride) % 2 = 0 THEN embedding
         |         ELSE list_reverse(embedding) END AS qe
         |  FROM embeddings
         |  WHERE vec_id % $SemCopyStride = 0
         |    AND vec_id < ${SemEvalN * SemCopyStride}),
         |s AS (
         |  SELECT ev.eval_id, t.vec_id AS top_train_id,
         |    ${Hashing.cosineSql("ev.qe", "t.embedding", 64)} AS max_cos
         |  FROM ev, embeddings t),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY eval_id
         |    ORDER BY max_cos DESC, top_train_id) AS rk
         |  FROM s)
         |SELECT eval_id, top_train_id, max_cos,
         |  max_cos >= $SemThreshold AS contaminated
         |FROM r WHERE rk = 1""".stripMargin,
    // three widths of the same audit; per width the eval set is the
    // distinct shingles of the mod-37 docs, hits one row per
    // (train doc, overlapping shingle)
    "llm_contam_sweep" -> {
      def one(n: Int) =
        s"""e$n AS (SELECT doc_id, unnest(s) AS g FROM s${n}sh),
           |ev$n AS (SELECT DISTINCT g FROM e$n WHERE doc_id % $EvalMod = 0),
           |h$n AS (
           |  SELECT doc_id, count(*)::BIGINT AS h
           |  FROM e$n JOIN ev$n USING (g)
           |  WHERE doc_id % $EvalMod != 0
           |  GROUP BY doc_id),
           |a$n AS (
           |  SELECT $n::BIGINT AS ngram_n,
           |    count(*)::BIGINT AS n_contaminated,
           |    coalesce(sum(h), 0)::BIGINT AS n_hit_ngrams
           |  FROM h$n)""".stripMargin
      s"""WITH ${SweepWidths.map(n =>
            Shingles.shSql(n, "documents", s"s$n")).mkString(",\n")},
         |${SweepWidths.map(one).mkString(",\n")}
         |${SweepWidths.map(n => s"SELECT * FROM a$n")
            .mkString("\nUNION ALL\n")}""".stripMargin
    },
    "llm_decontaminate" ->
      s"""WITH ${Shingles.shSql(NgramWidth)},
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % $EvalMod = 0),
         |hit AS (
         |  SELECT doc_id, count(*)::BIGINT AS n
         |  FROM ex JOIN ev USING (g)
         |  WHERE doc_id % $EvalMod != 0
         |  GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  coalesce(n, 0::BIGINT) AS n_hit_ngrams,
         |  coalesce(n, 0::BIGINT) > 0 AS contaminated
         |FROM documents d LEFT JOIN hit USING (doc_id)
         |WHERE d.doc_id % $EvalMod != 0""".stripMargin,
    // NaN via CASE (not a bare division): Spark's try_divide(0,0)→NULL→
    // NaN coalesce must line up with an explicit 'NaN' literal here, and
    // a NaN fraction must not satisfy the `heavy` comparison in either
    // engine — hence the n_grams = 0 guard on BOTH columns
    "llm_contam_frac" ->
      s"""WITH ${Shingles.shSql(NgramWidth)},
         |tr AS (SELECT doc_id, len(s)::BIGINT AS n_grams, s FROM sh
         |       WHERE doc_id % $EvalMod != 0),
         |ev AS (SELECT DISTINCT g FROM (
         |         SELECT unnest(s) AS g FROM sh
         |         WHERE doc_id % $EvalMod = 0)),
         |hit AS (
         |  SELECT doc_id, count(*)::BIGINT AS n
         |  FROM (SELECT doc_id, unnest(s) AS g FROM tr) x
         |  JOIN ev USING (g)
         |  GROUP BY doc_id
         |)
         |SELECT tr.doc_id, tr.n_grams,
         |  coalesce(n, 0::BIGINT) AS n_hit_ngrams,
         |  CASE WHEN tr.n_grams = 0 THEN 'NaN'::DOUBLE
         |       ELSE coalesce(n, 0::BIGINT)::DOUBLE / tr.n_grams::DOUBLE
         |  END AS overlap_frac,
         |  CASE WHEN tr.n_grams = 0 THEN false
         |       ELSE coalesce(n, 0::BIGINT)::DOUBLE / tr.n_grams::DOUBLE
         |            >= $FracThreshold
         |  END AS heavy
         |FROM tr LEFT JOIN hit USING (doc_id)""".stripMargin,
    // the same md5 hex windows, word split, and bit_or fold — the probe
    // joins the ≤ m/32-row filter and requires BOTH bits
    "llm_decontam_bloom" ->
      s"""WITH ${Shingles.shSql(NgramWidth)},
         |ev AS (SELECT DISTINCT g FROM (
         |         SELECT unnest(s) AS g FROM sh
         |         WHERE doc_id % $EvalMod = 0)),
         |pos AS (
         |  SELECT ('0x' || substr(md5(g), 1, 8))::BIGINT % $BloomBits AS p
         |  FROM ev
         |  UNION ALL
         |  SELECT ('0x' || substr(md5(g), 9, 8))::BIGINT % $BloomBits
         |  FROM ev),
         |bloom AS (
         |  SELECT p // $BloomWordBits AS word,
         |    bit_or(1::BIGINT << (p % $BloomWordBits)::INT) AS bits
         |  FROM pos GROUP BY 1),
         |grams AS (
         |  SELECT doc_id, len(s)::BIGINT AS n_grams, unnest(s) AS g
         |  FROM sh WHERE doc_id % $EvalMod != 0),
         |probed AS (
         |  SELECT doc_id, n_grams,
         |    ('0x' || substr(md5(g), 1, 8))::BIGINT % $BloomBits AS p1,
         |    ('0x' || substr(md5(g), 9, 8))::BIGINT % $BloomBits AS p2
         |  FROM grams)
         |SELECT doc_id, n_grams,
         |  sum(CASE WHEN
         |      (coalesce(b1.bits, 0::BIGINT)
         |        & (1::BIGINT << (p1 % $BloomWordBits)::INT)) != 0
         |      AND
         |      (coalesce(b2.bits, 0::BIGINT)
         |        & (1::BIGINT << (p2 % $BloomWordBits)::INT)) != 0
         |    THEN 1 ELSE 0 END)::BIGINT AS n_bloom_hits,
         |  sum(CASE WHEN
         |      (coalesce(b1.bits, 0::BIGINT)
         |        & (1::BIGINT << (p1 % $BloomWordBits)::INT)) != 0
         |      AND
         |      (coalesce(b2.bits, 0::BIGINT)
         |        & (1::BIGINT << (p2 % $BloomWordBits)::INT)) != 0
         |    THEN 1 ELSE 0 END) > 0 AS contaminated_bloom
         |FROM probed
         |LEFT JOIN bloom b1 ON p1 // $BloomWordBits = b1.word
         |LEFT JOIN bloom b2 ON p2 // $BloomWordBits = b2.word
         |GROUP BY doc_id, n_grams""".stripMargin
  )
}
