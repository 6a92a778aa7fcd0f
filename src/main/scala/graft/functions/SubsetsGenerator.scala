package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UDTF-shaped Catalyst `Generator` — SQL `graft_subsets(items)`: one
  * output row per order-preserving subset of a string array, as
  * (itemset = space-joined key, k = size). The SQL surface of the
  * Apriori candidate generator (G1, `CandidatesGenRecursion` at
  * `apriori/apriori_final.java:70-110`; singletons included, matching
  * [[graft.operators.Apriori.subsetKeys]] exactly — the spec asserts
  * row-level parity), completing the custom-function trio alongside the
  * scalar [[DotProduct]] and the aggregate [[TopKAgg]].
  *
  * Generators run row-at-a-time by design (`CodegenFallback`): the
  * 2^k fan-out dominates any per-row dispatch cost, so unlike the hot
  * scalar path there is nothing for codegen to win here. The engine's
  * own pipeline keeps the typed flatMap ([[graft.operators.Apriori
  * .itemsetSupportsOf]]) — this class is the equivalent LATERAL VIEW
  * surface for SQL users.
  */
case class SubsetsGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(
    StructField("itemset", StringType, nullable = false) ::
      StructField("k", IntegerType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_subsets expects array<string>, got $t")
  }

  override def prettyName: String = "graft_subsets"

  /** Space separator, built once (the key join below is byte-level). */
  private val Space = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      // stay in UTF8String space end-to-end (r16): the 2^k fan-out
      // means the per-SUBSET cost dominates — the former
      // toString-per-item + mkString + fromString path paid a UTF-8
      // decode per item per row and an ENCODE per subset; concatWs is
      // a byte copy
      val items =
        Array.tabulate(arr.numElements())(i => arr.getUTF8String(i))
      (1 to items.length).iterator
        .flatMap(k => items.indices.combinations(k))
        .map { idx =>
          InternalRow(
            UTF8String.concatWs(Space, idx.map(items): _*), idx.length)
        }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): SubsetsGenerator = copy(child = newChild)
}

object SubsetsGenerator {

  private val ident = FunctionIdentifier("graft_subsets")

  private val info = new ExpressionInfo(
    classOf[SubsetsGenerator].getName, null, "graft_subsets")

  private[functions] val builder: Seq[Expression] => Expression = {
    case Seq(c) => SubsetsGenerator(c)
    case other => throw new IllegalArgumentException(
      s"graft_subsets expects 1 argument, got ${other.size}")
  }

  /** Idempotent per-session registration, for sessions not built with
    * [[GraftExtensions]].
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
