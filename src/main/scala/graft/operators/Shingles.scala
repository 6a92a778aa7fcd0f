package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling shared by [[Dedup]] (minhash / ngram / simhash
  * indexes) and [[Contamination]] (train-vs-eval overlap), in both its
  * Column and oracle-SQL spellings — one convention, one place: DISTINCT
  * n-grams of the single-space token stream, with the whole text as the
  * lone shingle for degenerate docs shorter than n tokens (so no doc
  * silently disappears from a dedup/contamination index).
  */
private[operators] object Shingles {

  private val toks: Column = split(col("text"), " ")

  /** Distinct word n-gram shingles of `text` — the codegen'd
    * [[graft.functions.ShinglesExpr]] kernel. Value-identical to the
    * declarative `array_distinct(transform(sequence(...), i ->
    * concat_ws(' ', slice(toks, i, n))))` form it replaced, but ~10×
    * cheaper: higher-order-function lambdas evaluate interpreted per
    * element, and shingling is the hottest stage of every dedup /
    * decontamination operator (the oracle SQL below is unchanged —
    * same values, hash gate agrees).
    */
  def shingles(n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ShinglesExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(col("text")),
        org.apache.spark.sql.catalyst.expressions.Literal(n)))

  /** The identical shingling as DuckDB CTEs (`{tag}tok`,
    * `{tag}sh(doc_id, s)`) over any (doc_id, text) relation — `src`
    * defaults to `documents`; a non-empty `tag` lets two shingle chains
    * (e.g. an ingest batch vs the corpus, `llm_pipeline_incremental`)
    * coexist in one statement.
    */
  def shSql(n: Int, src: String = "documents", tag: String = ""): String =
    s"""${tag}tok AS (SELECT doc_id, text, string_split(text, ' ') AS t
       |            FROM $src),
       |${tag}sh AS (
       |  SELECT doc_id, CASE WHEN len(t) >= $n THEN
       |    list_distinct(list_transform(range(1, len(t) - ${n - 2}),
       |      i -> array_to_string(list_slice(t, i, i + ${n - 1}), ' ')))
       |  ELSE [text] END AS s FROM ${tag}tok
       |)""".stripMargin
}
