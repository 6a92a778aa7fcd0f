package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Lexical retrieval over the document corpus: the inverted index and
  * BM25 ranking (additive §2.11 — the inverted index is THE canonical
  * MapReduce workload the reference's wordcount mapper is one half of,
  * apriori/apriori_final.java:49-62; BM25 is Robertson & Walker's
  * Okapi weighting, public SIGIR '94 lineage).
  *
  * Spark-first shape: the term-frequency table (doc_id, word, tf) is
  * ONE explode + ONE map-side-combined groupBy of the corpus scan —
  * the same shape as `llm_word_count` keyed by (doc, word) instead of
  * word. Everything downstream is bounded: posting heads are one row
  * per vocabulary term, query-term selection ranks the ≤ |V|-row
  * vocabulary, and the 1-row corpus stats and the ≤ [[BmQueryN]]-row
  * query list ride broadcast joins. No corpus-scale sort anywhere: the
  * per-term top-k is a partitioned window over the posting lists of
  * the probed terms only.
  *
  * Determinism (the DuckDB hash gate): counts are exact integers; the
  * BM25 score is a fixed tree of exactly-rounded IEEE ops (+ × ÷) on
  * values < 2^53 with NO transcendentals — the classic `ln` idf is
  * replaced by its rational argument (N − df + ½)/(df + ½), a strictly
  * monotone surrogate, so per-term rankings are the textbook ones and
  * both engines land on bit-identical doubles (the [[Dsir]] rationale;
  * ties break on doc_id).
  */
object Retrieval {

  /** BM25 shape parameters (the textbook defaults): k1 saturates tf,
    * b dials length normalization. Spelled as the exact doubles the
    * oracle SQL literals parse to.
    */
  val BmK1 = 1.2
  val BmB = 0.75

  /** Query terms = vocabulary frequency ranks [[BmRankLo]]..[[BmRankHi]]
    * (by corpus count desc, term asc): mid-head terms, chosen FROM the
    * corpus itself so the entry is self-contained and scale-free.
    */
  val BmRankLo = 5L
  val BmRankHi = 9L

  /** Query count (for doc-comments and specs). */
  val BmQueryN: Long = BmRankHi - BmRankLo + 1

  /** Documents returned per query term. */
  val BmTopK = 5

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text")

  /** (doc_id, word, tf): the posting-list table. */
  def tfOf(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))

  /** Inverted-index posting heads: one row per term with its document
    * frequency, corpus frequency, and the strongest posting (max tf,
    * ties to the smaller doc_id). Output is |V| rows whatever the
    * corpus size; the window partitions by term, never globally.
    */
  def postings(spark: SparkSession, dir: String): DataFrame =
    postingsOf(docs(spark, dir))

  def postingsOf(corpus: DataFrame): DataFrame = {
    val w = Window.partitionBy("word")
    tfOf(corpus)
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("cf", sum(col("tf")).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("tf").desc, col("doc_id"))))
      .where(col("rk") === 1)
      .select(col("word"), col("df"), col("cf"),
        col("doc_id").as("top_doc_id"), col("tf").as("top_tf"))
  }

  /** BM25 top-[[BmTopK]] per query term:
    * (word, doc_id, tf, dl, df, score, rk).
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopKOf(docs(spark, dir))

  def bm25TopKOf(corpus: DataFrame): DataFrame = {
    val tf = tfOf(corpus)
    val dl = corpus.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl").cast("double")
        / col("n_docs").cast("double")).as("avgdl"))
    val queryTerms = tf.groupBy("word")
      .agg(sum(col("tf")).as("cnt"), count(lit(1)).as("df"))
      .withColumn("vrk", row_number().over(
        Window.orderBy(col("cnt").desc, col("word"))))
      .where(col("vrk") >= BmRankLo && col("vrk") <= BmRankHi)
      .select(col("word"), col("df"))
    val idf = (col("n_docs") - col("df") + lit(0.5))
      ./(col("df") + lit(0.5))
    val sat = (col("tf") * lit(BmK1 + 1.0))
      ./(col("tf") + lit(BmK1)
        * (lit(1.0 - BmB) + lit(BmB) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(queryTerms), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("word"), col("doc_id"), col("tf"), col("dl"),
        col("df"), (idf * sat).as("score"))
      .withColumn("rk", row_number().over(Window.partitionBy("word")
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .where(col("rk") <= BmTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_postings" -> postings,
    "llm_bm25_topk" -> bm25TopK
  )

  /** Double literal in forced-DOUBLE form: a bare decimal parses as
    * DECIMAL in DuckDB (skill gotcha — DECIMAL math would diverge from
    * Spark's doubles), and `Double.toString` + exponent suffix
    * round-trips to the bit-identical constant `lit()` holds.
    */
  private def dlit(x: Double): String =
    if (x.toString.contains("E")) x.toString else x.toString + "e0"

  private val tfCte: String =
    """tf AS (
      |  SELECT doc_id, word, count(*)::BIGINT AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |        FROM documents)
      |  GROUP BY 1, 2)""".stripMargin

  val oracle: Map[String, String] = Map(
    "llm_postings" ->
      s"""WITH $tfCte
         |SELECT word, df, cf, doc_id AS top_doc_id, tf AS top_tf
         |FROM (
         |  SELECT word, doc_id, tf,
         |    count(*) OVER (PARTITION BY word)::BIGINT AS df,
         |    sum(tf) OVER (PARTITION BY word)::BIGINT AS cf,
         |    row_number() OVER (PARTITION BY word
         |      ORDER BY tf DESC, doc_id) AS rk
         |  FROM tf)
         |WHERE rk = 1""".stripMargin,
    "llm_bm25_topk" ->
      s"""WITH $tfCte,
         |dl AS (
         |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
         |  FROM documents),
         |stats AS (
         |  SELECT count(*)::BIGINT AS n_docs,
         |    sum(dl)::BIGINT::DOUBLE / count(*)::BIGINT::DOUBLE AS avgdl
         |  FROM dl),
         |qt AS (
         |  SELECT word, df FROM (
         |    SELECT word, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cnt,
         |      row_number() OVER (ORDER BY sum(tf) DESC, word) AS vrk
         |    FROM tf GROUP BY word)
         |  WHERE vrk BETWEEN $BmRankLo AND $BmRankHi)
         |SELECT word, doc_id, tf, dl, df, score, rk FROM (
         |  SELECT tf.word, tf.doc_id, tf.tf, dl.dl, qt.df,
         |    ((n_docs - df + ${dlit(0.5)}) / (df + ${dlit(0.5)}))
         |      * ((tf * ${dlit(BmK1 + 1.0)}) / (tf + ${dlit(BmK1)}
         |        * (${dlit(1.0 - BmB)} + ${dlit(BmB)} * (dl / avgdl))))
         |      AS score,
         |    row_number() OVER (PARTITION BY tf.word
         |      ORDER BY ((n_docs - df + ${dlit(0.5)}) / (df + ${dlit(0.5)}))
         |        * ((tf * ${dlit(BmK1 + 1.0)}) / (tf + ${dlit(BmK1)}
         |          * (${dlit(1.0 - BmB)} + ${dlit(BmB)} * (dl / avgdl))))
         |        DESC, tf.doc_id)::BIGINT AS rk
         |  FROM tf
         |  JOIN qt ON qt.word = tf.word
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN stats)
         |WHERE rk <= $BmTopK""".stripMargin
  )
}
