package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.streaming.Streams

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is a named entry in [[queries]]; each
  * SQL-expressible one has matching ANSI SQL in [[oracleSql]] for the
  * driver's DuckDB hash-compare (columns aliased identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Apriori.queries ++ Relational.queries ++ Sgd.queries ++
      TextOps.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Streams.queries ++ Curation.queries ++
      Contamination.queries ++ Warehouse.queries ++ Quality.queries ++
      Sketch.queries ++ Dsir.queries ++ Graph.queries ++
      Retrieval.queries ++ Bitext.queries ++ Eval.queries ++
      Layout.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Apriori.oracle ++ Relational.oracle ++ Sgd.oracle ++
      TextOps.oracle ++ Dedup.oracle ++ Similarity.oracle ++
      Multimodal.oracle ++ Streams.oracle ++ Curation.oracle ++
      Contamination.oracle ++ Warehouse.oracle ++ Quality.oracle ++
      Sketch.oracle ++ Dsir.oracle ++ Graph.oracle ++
      Retrieval.oracle ++ Bitext.oracle ++ Eval.oracle ++
      Layout.oracle
}
