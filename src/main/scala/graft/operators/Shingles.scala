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

  /** Distinct word n-gram shingles of `text`. */
  def shingles(n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array(col("text")))

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
