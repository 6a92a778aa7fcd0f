package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Margin-based bitext mining (SURVEY.md §2.11 extension) — the
  * parallel-corpus miner a multilingual training pipeline runs over a
  * crawl: candidate translation pairs scored by the MARGIN criterion
  * (cosine normalized by both sides' local neighborhood density,
  * Artetxe & Schwenk, "Margin-based Parallel Corpus Mining with
  * Multilingual Sentence Embeddings", ACL '19), which suppresses "hub"
  * vectors that are near everything and is the standard ratio behind
  * CCMatrix-style mined corpora. The reference engine has no analogue;
  * this extends its text modality with the ops inventory's
  * embedding-similarity family.
  *
  * margin(x, y) = cos(x, y) / ((mx + my) / 2), where mx is the mean
  * cosine of x to its k nearest TARGET-side vectors and my the mean of
  * y to its k nearest SOURCE-side vectors.
  *
  * Scale shape (the [[Similarity]] brute-force discipline end-to-end):
  * the query set is bounded (the serving shape — a mining batch) and
  * broadcasts into ONE partition-parallel scan of the target side; the
  * candidate set that scan yields is ≤ queries·k rows, pulled to the
  * driver like FAISS training state and broadcast into ONE scan of the
  * source side for the reverse-kNN means. Neither corpus ever shuffles
  * for scoring; both ranking windows are partitioned with rank cuts.
  * Means fold the k cosines IN RANK ORDER (array_sort → sequential
  * aggregate), so the oracle's `list_reduce(list(c ORDER BY rk))`
  * reproduces them bit-for-bit and the margins sit behind the hash
  * gate, not a tolerance.
  */
object Bitext {

  /** Mining batch size (bounded query set: the [[BitextQ]] smallest
    * source-side doc ids), kNN depth for the margin normalizer, and the
    * fixture's language pair.
    */
  val BitextQ = 20
  val BitextK = 4
  val SrcLang = "de"
  val TgtLang = "en"

  /** One language's (id, e) side: documents filtered by lang, joined to
    * their aligned embeddings (vec_id = doc_id, TESTDATA.md).
    */
  private def side(spark: SparkSession, dir: String,
                   lang: String): DataFrame =
    Tables(spark, dir, "documents").select(col("doc_id"), col("lang"))
      .where(col("lang") === lang)
      .join(Tables(spark, dir, "embeddings"),
        col("vec_id") === col("doc_id"))
      .select(col("doc_id").as("id"),
        col("embedding").cast("array<double>").as("e"))

  def bitextMine(spark: SparkSession, dir: String): DataFrame =
    bitextMineOf(side(spark, dir, SrcLang), side(spark, dir, TgtLang))

  /** Any (id, e: ARRAY<DOUBLE>) source/target sides. */
  def bitextMineOf(src: DataFrame, tgt: DataFrame, q: Int = BitextQ,
                   k: Int = BitextK): DataFrame = {
    val spark = src.sparkSession
    val s = spark; import s.implicits._

    /** Broadcast-kernel scan: every probe against every corpus row. */
    def scan(corpus: DataFrame, probes: Array[(Long, Array[Double])],
             pCol: String, cCol: String): DataFrame = {
      val bc = spark.sparkContext.broadcast(probes)
      corpus.as[(Long, Array[Double])]
        .mapPartitions { it =>
          val ps = bc.value
          it.flatMap { case (cid, ce) =>
            ps.iterator.map { case (pid, pe) =>
              (pid, cid, Hashing.cosineSeq(pe, ce))
            }
          }
        }
        .toDF(pCol, cCol, "cos_sim")
    }

    /** Rank-ordered mean of each probe's top cosines — the fold order
      * is pinned by array_sort over (rk, cos) structs so the oracle's
      * ORDER BY rk list fold matches bitwise.
      */
    def knnMean(ranked: DataFrame, key: String, out: String): DataFrame =
      ranked.groupBy(key)
        .agg(collect_list(struct(col("rk"), col("cos_sim"))).as("cs"))
        .select(col(key),
          (aggregate(transform(array_sort(col("cs")),
            c => c.getField("cos_sim")), lit(0.0), (a, x) => a + x)
            / size(col("cs"))).as(out))

    // bounded mining batch: the q smallest source ids (TakeOrdered —
    // a distributed bounded pull, never a corpus collect)
    val queries = src.orderBy("id").limit(q)
      .as[(Long, Array[Double])].collect()
    val fwd = graft.Materialize.Local(
      scan(tgt, queries, "src_id", "tgt_id")
        .withColumn("rk", row_number().over(Window.partitionBy("src_id")
          .orderBy(col("cos_sim").desc, col("tgt_id"))).cast("long"))
        .where(col("rk") <= k))
    val mx = knnMean(fwd, "src_id", "mx")
    // candidate targets (≤ q·k vectors): driver-bounded like centroids
    val ys = tgt.join(broadcast(fwd.select("tgt_id").distinct()),
        col("id") === col("tgt_id"))
      .select(col("id"), col("e"))
      .as[(Long, Array[Double])].collect()
    val my = knnMean(
      scan(src, ys, "tgt_id", "sid")
        .withColumn("rk", row_number().over(Window.partitionBy("tgt_id")
          .orderBy(col("cos_sim").desc, col("sid"))).cast("long"))
        .where(col("rk") <= k),
      "tgt_id", "my")
    val out = fwd
      .join(broadcast(mx), "src_id")
      .join(broadcast(my), "tgt_id")
      .select(col("src_id"), col("tgt_id"), col("cos_sim"),
        (col("cos_sim") / ((col("mx") + col("my")) / lit(2.0)))
          .as("margin"))
      .withColumn("rk", row_number().over(Window.partitionBy("src_id")
        .orderBy(col("margin").desc, col("tgt_id"))).cast("long"))
      .localCheckpoint()
    graft.Materialize.release(fwd)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_bitext_mine" -> bitextMine
  )

  private def sideSql(lang: String): String =
    s"""SELECT d.doc_id AS id, e.embedding AS e
       |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
       |  WHERE d.lang = '$lang'""".stripMargin

  val oracle: Map[String, String] = Map(
    "llm_bitext_mine" ->
      s"""WITH de AS (${sideSql(SrcLang)}),
         |en AS (${sideSql(TgtLang)}),
         |q AS (SELECT * FROM de ORDER BY id LIMIT $BitextQ),
         |r1 AS (
         |  SELECT *, row_number() OVER (PARTITION BY src_id
         |    ORDER BY cos_sim DESC, tgt_id)::BIGINT AS rk
         |  FROM (
         |    SELECT q.id AS src_id, t.id AS tgt_id,
         |      ${Hashing.cosineSql("q.e", "t.e", 64)} AS cos_sim
         |    FROM q, en t)),
         |c1 AS (SELECT * FROM r1 WHERE rk <= $BitextK),
         |mx AS (
         |  SELECT src_id,
         |    list_reduce(list(cos_sim ORDER BY rk), (x, y) -> x + y)
         |      / count(*) AS mx
         |  FROM c1 GROUP BY src_id),
         |ys AS (SELECT DISTINCT tgt_id FROM c1),
         |r2 AS (
         |  SELECT *, row_number() OVER (PARTITION BY tgt_id
         |    ORDER BY cos_sim DESC, sid)::BIGINT AS rk
         |  FROM (
         |    SELECT y.tgt_id, s.id AS sid,
         |      ${Hashing.cosineSql("t.e", "s.e", 64)} AS cos_sim
         |    FROM ys y JOIN en t ON t.id = y.tgt_id, de s)),
         |my AS (
         |  SELECT tgt_id,
         |    list_reduce(list(cos_sim ORDER BY rk), (x, y) -> x + y)
         |      / count(*) AS my
         |  FROM r2 WHERE rk <= $BitextK GROUP BY tgt_id),
         |joined AS (
         |  SELECT c1.src_id, c1.tgt_id, c1.cos_sim,
         |    c1.cos_sim / ((mx.mx + my.my) / 2e0) AS margin
         |  FROM c1 JOIN mx USING (src_id) JOIN my USING (tgt_id))
         |SELECT src_id, tgt_id, cos_sim, margin,
         |  row_number() OVER (PARTITION BY src_id
         |    ORDER BY margin DESC, tgt_id)::BIGINT AS rk
         |FROM joined""".stripMargin
  )
}
