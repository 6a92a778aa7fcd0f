package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native lexicon-hit counting: `graft_set_hits(text, words)` ==
  * `size(filter(split(text, ' '), t -> array_contains(words, t)))` for
  * a foldable word list — the `hits()` kernel behind every
  * lexicon-based text gate (language-ID's three function-word counts,
  * the stopword-ratio quality signal, the blocklist counter).
  *
  * Same rationale as [[ShinglesExpr]]: the declarative form pays an
  * interpreted `filter` lambda + `array_contains` linear scan PER
  * TOKEN, and materializes the token array only to measure a count.
  * This expression splits once and probes a hash set per token in one
  * compiled pass (the set is built once per plan from the literal and
  * shipped via the codegen reference mechanism). Value-identical —
  * split semantics (trailing empties kept) and binary string equality
  * match the built-ins, so the DuckDB oracles (`len(list_filter(...))`)
  * are untouched.
  */
case class TokensInSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_set_hits expects (string, array<string> literal), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_set_hits"

  @transient private lazy val set: java.util.HashSet[String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      s.add(arr.getUTF8String(i).toString)
      i += 1
    }
    s
  }

  override protected def nullSafeEval(t: Any, w: Any): Any =
    TokensInSet.compute(t.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexicon", set,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.TokensInSet.compute($t, $setRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TokensInSet {

  /** One-pass count of whitespace tokens present in `set`. */
  def compute(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val toks = text.toString.split(" ", -1)
    var cnt = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) cnt += 1
      i += 1
    }
    cnt
  }
}
