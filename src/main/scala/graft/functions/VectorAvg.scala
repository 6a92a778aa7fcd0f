package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise vector average as a typed `Aggregator` — the user-facing
  * typed aggregation surface (SURVEY.md §2.9: the one custom-UDAF-shaped
  * component the reference's A5 parameter averaging maps to;
  * multilinereg.java:121-138 sums θ snapshots component-wise and divides
  * by the record count exactly like this).
  *
  * Buffer is (running sums, count): O(dims) state, associative merge, so
  * Spark runs it with map-side partial aggregation. Empty input → empty
  * array.
  */
object VectorAvg
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long),
      x: Array[Double]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](x.length) else b._1
    var i = 0
    while (i < x.length) { sums(i) += x(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long),
      b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.emptyDoubleArray else r._1.map(_ / r._2)

  // Session-independent and lazy: the serialized Aggregator forces class
  // init on executor JVMs (readResolve), where no SparkSession is active —
  // encoders are only ever needed driver-side at planning time.
  private lazy val arr: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(arr, Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = arr
}
