package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate-nearest-neighbor similarity search over
  * `embeddings.embedding` (SURVEY.md §2.11).
  *
  * Two plans for the same task shape (a query set scanned against a
  * corpus, top-k by cosine):
  *
  *  - [[bruteForceTopK]] — the exact baseline: broadcast the (small)
  *    query set, scan the corpus partition-parallel, window top-k. The
  *    corpus is never shuffled for scoring; only the scored
  *    (query, neighbor) pairs move, and at 100 TB the refinement is a
  *    bounded-heap partial aggregate (TypedImperativeAggregate) so each
  *    partition forwards at most k rows per query instead of its whole
  *    score list.
  *  - [[lshTopK]] — the scale path: signed-random-projection buckets
  *    (16 tables × 8 bits, md5-derived planes shared with the oracle via
  *    [[Hashing]]); only bucket-colliding pairs are scored. Approximate
  *    by design — and the DuckDB oracle replays the identical bucketing,
  *    so the approximation itself is verified, not hand-waved.
  *
  * Cosines are sequential-order IEEE doubles (see [[Hashing.cosine]]),
  * bit-equal to the oracle; ranking ties break on neighbor_id so the
  * row_number is deterministic in both engines.
  */
object Similarity {

  /** Fixture query set: the first [[NumQueries]] vec_ids. */
  val NumQueries = 50
  val TopK = 5
  val LshTables = 16
  val LshBits = 8

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  private val rankWindow =
    Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)

  /** Exact top-k: the (small, bounded) query set rides a broadcast to a
    * typed kernel that scans the corpus partition-parallel — the corpus
    * is never shuffled for scoring, only the scored pairs move into the
    * ranking window. Cosines come from [[Hashing.cosineSeq]], bit-equal
    * to the oracle's sequential list arithmetic.
    */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val corpus = emb(spark, dir).as[(Long, Array[Double])]
    val queries = corpus.filter(_._1 < NumQueries).collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(queries)
    corpus
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (nid, e) =>
          qs.iterator.filter(_._1 != nid).map { case (qid, qe) =>
            (qid, nid, Hashing.cosineSeq(qe, e))
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cos_sim")
      .withColumn("rank", row_number().over(rankWindow))
      .where(col("rank") <= TopK)
  }

  /** LSH-bucketed top-k: score only bucket-colliding (query, neighbor)
    * pairs. Queries with no collision simply produce no rows — that is
    * the ANN recall trade, and the oracle prices it identically.
    */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val buckets =
      Hashing.srpBuckets(spark, emb(spark, dir), LshTables, LshBits)
        .localCheckpoint() // both sides of the bucket self-join
    val cand = buckets.as("q")
      .where(col("q.vec_id") < NumQueries)
      .join(buckets.as("n"),
        col("q.t") === col("n.t") && col("q.bkt") === col("n.bkt")
          && col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("qid"), col("n.vec_id").as("nid"))
      .distinct()
    cand
      .join(emb(spark, dir).as("A"), col("qid") === col("A.vec_id"))
      .join(emb(spark, dir).as("B"), col("nid") === col("B.vec_id"))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        Hashing.cosineNative(spark, col("A.e"), col("B.e")).as("cos_sim"))
      .withColumn("rank", row_number().over(rankWindow))
      .where(col("rank") <= TopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_sim_topk" -> bruteForceTopK,
    "llm_sim_lsh_topk" -> lshTopK
  )

  val oracle: Map[String, String] = Map(
    "llm_sim_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding e FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    ${Hashing.cosineSql("q.e", "n.e", 64)} AS cos_sim
         |  FROM v q JOIN v n ON q.vec_id < $NumQueries
         |    AND q.vec_id != n.vec_id
         |)
         |SELECT * FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM scored
         |) WHERE rank <= $TopK""".stripMargin,
    "llm_sim_lsh_topk" ->
      s"""WITH ${Hashing.planesSqlCte(LshTables, LshBits, 64)},
         |proj AS (
         |  SELECT vec_id, t, p,
         |    list_reduce(list_transform(range(1, 65),
         |      i -> embedding[i]::DOUBLE * w[i]), (a, b) -> a + b) AS pr
         |  FROM embeddings, planes
         |),
         |buckets AS (
         |  SELECT vec_id, t,
         |    sum(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bkt
         |  FROM proj GROUP BY vec_id, t
         |),
         |cand AS (
         |  SELECT DISTINCT q.vec_id qid, n.vec_id nid
         |  FROM buckets q JOIN buckets n
         |    ON q.t = n.t AND q.bkt = n.bkt
         |    AND q.vec_id < $NumQueries AND q.vec_id != n.vec_id
         |),
         |v AS (SELECT vec_id, embedding e FROM embeddings),
         |scored AS (
         |  SELECT qid AS query_id, nid AS neighbor_id,
         |    ${Hashing.cosineSql("a.e", "b.e", 64)} AS cos_sim
         |  FROM cand JOIN v a ON qid = a.vec_id JOIN v b ON nid = b.vec_id
         |)
         |SELECT * FROM (
         |  SELECT query_id, neighbor_id, cos_sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
         |  FROM scored
         |) WHERE rank <= $TopK""".stripMargin
  )
}
