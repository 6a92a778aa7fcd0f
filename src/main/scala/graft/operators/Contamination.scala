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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_decontaminate" -> decontaminate
  )

  val oracle: Map[String, String] = Map(
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
         |WHERE d.doc_id % $EvalMod != 0""".stripMargin
  )
}
