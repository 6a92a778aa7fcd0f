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

  /** JVM twin of [[md5hash56]]: big-endian 56-bit int of md5's first 7
    * bytes == first-14-hex-chars base-16. Parity with both the Column
    * form and DuckDB's `('0x' || substr(md5(x),1,14))::BIGINT` is
    * asserted by the dedup brute-force specs.
    */
  def md5hash56Jvm(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** splitmix64 finalizer: derives the i-th minhash function from one
    * base hash per shingle (internal candidate keys only — never part of
    * an oracle contract).
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** ±1 hyperplane component for (table, plane, dim) from md5 parity.
    * Oracle equivalent: the CASE in [[planesSqlCte]].
    */
  def planeSign(t: Int, p: Int, d: Int): Double = {
    val dig = MessageDigest.getInstance("MD5")
      .digest(s"$t:$p:$d".getBytes("UTF-8"))
    if ((Integer.parseInt(f"${dig(0) & 0xff}%02x".take(1), 16) & 1) == 1) 1.0
    else -1.0
  }

  /** SRP bucket table via a typed kernel: for each vector, `tables`
    * bucket ids of `bits` sign bits each. The plane set is a broadcast
    * constant; the per-vector work is O(tables · bits · dims) plain-JVM
    * flops (a columnar higher-order formulation evaluates interpreted and
    * is ~5× slower — measured). Projections use [[dotSeq]], whose
    * addition order matches the oracle's list_reduce, so bucket ids are
    * bit-identical to [[planesSqlCte]]-based SQL.
    */
  def srpBuckets(spark: SparkSession, emb: DataFrame, tables: Int,
      bits: Int, dims: Int = Dims): DataFrame = {
    val s = spark; import s.implicits._
    val planes = Array.tabulate(tables, bits)((t, p) =>
      Array.tabulate(dims)(planeSign(t, p, _)))
    val bc = spark.sparkContext.broadcast(planes)
    emb.as[(Long, Array[Double])]
      .mapPartitions { it =>
        val pl = bc.value
        it.flatMap { case (id, e) =>
          pl.indices.iterator.map { t =>
            var bkt = 0L
            var p = 0
            while (p < pl(t).length) {
              if (dotSeq(e, pl(t)(p)) > 0) bkt |= (1L << p)
              p += 1
            }
            (id, t, bkt)
          }
        }
      }
      .toDF("vec_id", "t", "bkt")
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

  /** Fixture embedding dimensionality. */
  val Dims = 64

  /** Cosine similarity on the column path, built on the codegen'd
    * [[graft.functions.DotProduct]] expression (ascending-index
    * summation — bit-equal to the oracle's `list_reduce` and to
    * [[dotSeq]]; a `zip_with`+`aggregate` formulation computes the same
    * value but evaluates interpreted).
    */
  def cosineNative(spark: SparkSession, a: Column, b: Column): Column = {
    def d(x: Column, y: Column) = graft.functions.DotProduct.dot(spark, x, y)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  /** JVM kernel with the SAME sequential order as [[dot]] / the oracle's
    * list_reduce — bit-equal results, ~100× the interpreted expression
    * throughput. For the dense O(n·q·d) inner loops.
    */
  def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  def cosineSeq(a: Array[Double], b: Array[Double]): Double =
    dotSeq(a, b) / (math.sqrt(dotSeq(a, a)) * math.sqrt(dotSeq(b, b)))

  /** Oracle fragment: sequential dot product of two list expressions. */
  def dotSql(a: String, b: String, dims: Int): String =
    s"""list_reduce(list_transform(range(1, ${dims + 1}),
       |    i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  def cosineSql(a: String, b: String, dims: Int): String =
    s"""${dotSql(a, b, dims)}
       |  / (sqrt(${dotSql(a, a, dims)})
       |   * sqrt(${dotSql(b, b, dims)}))""".stripMargin
}
