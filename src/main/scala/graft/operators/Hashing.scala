package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic hashing shared by the dedup / similarity operators.
  *
  * Everything here is md5-derived (not Spark-native hashes) because these
  * values are part of the oracle contract: DuckDB recomputes them from
  * the same strings, so signatures, fingerprints and LSH buckets are
  * reproducible engine-to-engine with no RNG state anywhere.
  */
private[operators] object Hashing {

  /** 56-bit positive hash: first 14 hex chars of md5, parsed base-16.
    * Oracle equivalent: `('0x' || substr(md5(x), 1, 14))::BIGINT`.
    */
  def md5hash56(c: Column): Column =
    conv(substring(md5(c), 1, 14), 16, 10).cast("long")

  /** ±1 hyperplane component for (table, plane, dim) from md5 parity.
    * Oracle equivalent: the CASE in [[planesSqlCte]].
    */
  def planeSign(t: Int, p: Int, d: Int): Double = {
    val dig = MessageDigest.getInstance("MD5")
      .digest(s"$t:$p:$d".getBytes("UTF-8"))
    if ((Integer.parseInt(f"${dig(0) & 0xff}%02x".take(1), 16) & 1) == 1) 1.0
    else -1.0
  }

  /** Signed-random-projection plane set as a (tables × bits) literal
    * DataFrame of (t, p, w: Array[Double](dims)) — a constant that
    * broadcasts inside the plan; never a shuffle source.
    */
  def planesDF(spark: SparkSession, tables: Int, bits: Int,
      dims: Int): DataFrame = {
    val s = spark; import s.implicits._
    (for { t <- 0 until tables; p <- 0 until bits }
      yield (t, p, (0 until dims).map(planeSign(t, p, _))))
      .toDF("t", "p", "w")
  }

  /** DuckDB CTE computing the identical plane set. */
  def planesSqlCte(tables: Int, bits: Int, dims: Int): String =
    s"""planes AS (
       |  SELECT t, p, list_transform(range(0, $dims),
       |    d -> CASE WHEN (('0x' || substr(md5(t || ':' || p || ':' || d), 1, 1))::INT & 1) = 1
       |         THEN 1.0 ELSE -1.0 END) AS w
       |  FROM (SELECT unnest(range(0, $tables)) t) tt,
       |       (SELECT unnest(range(0, $bits)) p) pp
       |)""".stripMargin

  /** Sequential-order dot product of two double-array columns — op-for-op
    * identical to the oracle's `list_reduce(list_transform(...))`, so the
    * resulting IEEE double is bit-equal across engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity from [[dot]]s (exact same expression as oracle). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Oracle fragment: sequential dot product of two list expressions. */
  def dotSql(a: String, b: String, dims: Int): String =
    s"""list_reduce(list_transform(range(1, ${dims + 1}),
       |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String, dims: Int): String =
    s"""${dotSql(a, b, dims)}
       |  / (sqrt(${dotSql(a, a, dims)})
       |   * sqrt(${dotSql(b, b, dims)}))""".stripMargin
}
