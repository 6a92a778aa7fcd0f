package graft

import org.apache.spark.sql.functions._
import graft.functions.TokenCount

/** graft_token_count == size(split(...)) bit-for-bit, the optimizer
  * rewrite fires on plain delimiters only, and the expression stays
  * inside whole-stage codegen.
  */
class TokenCountSpec extends SparkSpecBase {

  test("equals size(split) on every edge: empty, trailing, repeated") {
    val s = spark; import s.implicits._
    val rows = Seq("", " ", "a", "a b", "a b ", " a  b", "a  b c ",
      "único tökens ünïcode", "x" * 1000)
    val df = rows.toDF("text")
    val got = df.select(
      size(split(col("text"), " ")).as("builtin"),
      expr("graft_token_count(text, ' ')").as("fast")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null-in-null-out, matching ANSI size(split(NULL))
    val n = Seq[Option[String]](None).toDF("text")
      .selectExpr("graft_token_count(text, ' ')").head()
    assert(n.isNullAt(0))
  }

  test("optimizer rewrites size(split(text, ' ')) automatically") {
    val plan = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), " ")).as("n"))
      .queryExecution.optimizedPlan
    val found = plan.expressions.flatMap(_.collect {
      case t: TokenCount => t
    })
    assert(found.nonEmpty, s"rewrite did not fire:\n$plan")
    // and the rewritten plan computes the same counts as the raw
    // expression evaluated without the rule's help (interp eval path)
    val a = Tables(spark, Sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val b = Tables(spark, Sf, "documents")
      .select(col("doc_id"),
        expr("graft_token_count(text, ' ')").as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(a == b)
  }

  test("regex-meaningful and non-literal delimiters are NOT rewritten") {
    val plan1 = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), "\\|\\|")).as("n"))
      .queryExecution.optimizedPlan
    assert(plan1.expressions.flatMap(_.collect {
      case t: TokenCount => t
    }).isEmpty, s"rewrote a regex delimiter:\n$plan1")
    val plan2 = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), col("lang"))).as("n"))
      .queryExecution.optimizedPlan
    assert(plan2.expressions.flatMap(_.collect {
      case t: TokenCount => t
    }).isEmpty, s"rewrote a non-literal delimiter:\n$plan2")
  }

  test("graft_set_hits equals size(filter(array_contains)) everywhere") {
    val s = spark; import s.implicits._
    val lex = Seq("the", "a", "of")
    val rows = Seq("", "the", "the the a", "b the  c", "of a the of",
      "none here", "THE a")
    def viaKernel(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.TokensInSet(
          org.apache.spark.sql.GraftColumnBridge.expression(c),
          org.apache.spark.sql.GraftColumnBridge.expression(
            typedLit(lex))))
    val got = rows.toDF("text").select(
      size(filter(split(col("text"), " "),
        t => array_contains(typedLit(lex), t))).as("builtin"),
      viaKernel(col("text")).as("fast")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // null-in-null-out
    val n = Seq[Option[String]](None).toDF("text")
      .select(viaKernel(col("text"))).head()
    assert(n.isNullAt(0))
  }

  test("token count participates in whole-stage codegen") {
    val df = Tables(spark, Sf, "documents")
      .select(size(split(col("text"), " ")).as("n"))
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` marker = the operator is inside a WholeStageCodegen
    // stage (the DotProductSpec convention)
    val line = p.linesIterator
      .find(_.contains("graft_token_count"))
      .getOrElse(fail(s"no graft_token_count in plan:\n$p"))
    assert(line.trim.startsWith("*("), s"not codegen'd: $line")
    val gen = org.apache.spark.sql.execution.debug
      .codegenString(df.queryExecution.executedPlan)
    assert(gen.contains("indexOf"),
      "generated code should inline the indexOf loop")
  }
}
