package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The shared md5-derived primitives every dedup/similarity operator
  * builds on: JVM and column forms must agree exactly, since mixed
  * pipelines (kernel signature + column verify) rely on it.
  */
class HashingSpec extends SparkSpecBase {

  test("md5hash56Jvm equals the conv(md5) column form") {
    val s = spark; import s.implicits._
    val inputs = Seq("a", "bread milk eggs", "", "0:7:63", "über-ascii")
    val viaCol = inputs.toDF("x")
      .select(Hashing.md5hash56(col("x"))).collect().map(_.getLong(0))
    val md = MessageDigest.getInstance("MD5")
    val viaJvm = inputs.map(Hashing.md5hash56Jvm(md, _))
    assert(viaCol.toSeq == viaJvm)
    // 56-bit positive range
    viaJvm.foreach(h => assert(h >= 0 && h < (1L << 56)))
  }

  test("planeSign is ±1 and roughly balanced") {
    val signs = for { t <- 0 until 8; p <- 0 until 8; d <- 0 until 64 }
      yield Hashing.planeSign(t, p, d)
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    val pos = signs.count(_ == 1.0).toDouble / signs.size
    assert(pos > 0.4 && pos < 0.6, s"biased plane signs: $pos")
  }

  test("mix64 derivations of one base hash do not collide trivially") {
    val base = Hashing.md5hash56Jvm(
      MessageDigest.getInstance("MD5"), "shingle")
    val derived = (0 until 64).map(i =>
      Hashing.mix64(base ^ (i * 0x9e3779b97f4a7c15L)))
    assert(derived.distinct.size == derived.size)
  }

  test("cosineSeq equals the native cosine column on the same vectors") {
    val s = spark; import s.implicits._
    val a = Array.tabulate(64)(i => math.sin(i + 1.0))
    val b = Array.tabulate(64)(i => math.cos(2.0 * i - 3.0))
    val viaCol = Seq((a, b)).toDF("a", "b")
      .select(Hashing.cosineNative(spark, col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(viaCol == Hashing.cosineSeq(a, b))
  }
}
