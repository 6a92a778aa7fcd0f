package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.operators.Dedup

/** The custom Catalyst expression: value parity with the JVM kernel,
  * availability through SQL (extensions + runtime registration), and
  * actual codegen participation in the query plans that use it.
  */
class DotProductSpec extends SparkSpecBase {

  test("graft_dot equals the sequential kernel, via SQL and Column API") {
    val s = spark; import s.implicits._
    DotProduct.register(spark)
    val a = Array(1.5, -2.0, 3.25, 0.0)
    val b = Array(0.5, 4.0, -1.0, 9.9)
    val want = { // ascending-index sequential sum, the contract order
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val viaSql = Seq((a, b)).toDF("a", "b")
      .selectExpr("graft_dot(a, b) as d").collect()(0).getDouble(0)
    assert(viaSql == want)
    val viaCol = Seq((a, b)).toDF("a", "b")
      .select(DotProduct.dot(spark, col("a"), col("b"))).collect()(0)
      .getDouble(0)
    assert(viaCol == want)
  }

  test("graft_subsets generator matches subsetKeys row-for-row via SQL") {
    val s = spark; import s.implicits._
    graft.functions.SubsetsGenerator.register(spark)
    val baskets = Seq(
      Seq("a", "b", "c"),
      Seq("x"),
      Seq.empty[String])
    baskets.map(Tuple1(_)).toDF("items")
      .createOrReplaceTempView("subsets_gen_test")
    val got = spark.sql(
      """SELECT itemset, k FROM subsets_gen_test
        |LATERAL VIEW graft_subsets(items) t AS itemset, k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val want = baskets
      .flatMap(b => graft.operators.Apriori.subsetKeys(b))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == want)
    // 2^3-1 + 1 + 0 subsets in total (singletons included)
    assert(got.values.sum == 8)
    // null arrays generate nothing instead of crashing
    assert(spark.sql(
      """SELECT itemset FROM (SELECT cast(null as array<string>) AS items)
        |LATERAL VIEW graft_subsets(items) t AS itemset, k""".stripMargin)
      .count() == 0)
  }

  test("graft_dot handles mismatched lengths and null arrays") {
    val s = spark; import s.implicits._
    DotProduct.register(spark)
    val d = Seq((Array(1.0, 2.0, 5.0), Array(3.0, 4.0)))
      .toDF("a", "b").selectExpr("graft_dot(a, b) as d")
      .collect()(0).getDouble(0)
    assert(d == 11.0) // min-length semantics
    val n = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("embedding near-dup runs graft_dot inside whole-stage codegen") {
    val df = Dedup.embeddingNearDup(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dot"), p)
    // the scoring projection (containing graft_dot) sits in a codegen
    // stage, not an interpreted project
    val scoringLine = p.linesIterator.find(_.contains("graft_dot")).get
    assert(scoringLine.contains("*("), // WholeStageCodegen marker
      s"graft_dot not codegen'd:\n$p")
  }
}
