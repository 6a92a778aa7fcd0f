package graft

import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.operators.{Apriori, Dedup}

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

  test("apriori enumeration runs its generators inside whole-stage " +
    "codegen (r17: CollectionGenerator, not CodegenFallback)") {
    // the r17 optimization contract for the enumeration family: the
    // Generate node must sit INSIDE a WholeStageCodegen span (the `*(n)`
    // marker), fusing enumerate→filter→partial-agg — a CodegenFallback
    // generator would break the stage exactly where the 2^k fan-out
    // meets the aggregation
    def generateLine(df: org.apache.spark.sql.DataFrame, fn: String)
        : String = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val l = p.linesIterator.find(l =>
        l.contains("Generate") && l.contains(fn))
      assert(l.nonEmpty, s"no Generate[$fn] in:\n$p")
      assert(l.get.contains("*("),
        s"$fn Generate not codegen'd:\n$p")
      l.get
    }
    generateLine(Apriori.candidatesRaw(spark, Sf), "graft_subsets")
    generateLine(Apriori.assocRules(spark, Sf), "graft_antecedents")
    // the level-wise ENTRY returns a checkpointed consolidation (bare
    // scan), so assert the level-shaped plan itself: prune → generate
    // → aggregate, exactly what each loop iteration runs
    val s = spark; import s.implicits._
    graft.functions.KSubsetsGenerator.register(spark)
    val level = Seq(Seq("a", "b", "c"), Seq("a", "c", "d"))
      .map(Tuple1(_)).toDF("fitems")
      .where(size(col("fitems")) >= 2)
      .selectExpr("graft_subsets_k(fitems, 2) AS itemset")
      .groupBy("itemset").agg(count(lit(1)).as("cnt"))
    generateLine(level, "graft_subsets_k")
  }

  test("graft_subsets_k enumerates exactly the size-k position " +
    "combinations") {
    val s = spark; import s.implicits._
    graft.functions.KSubsetsGenerator.register(spark)
    val got = Seq(Seq("a", "b", "c", "d"), Seq("x"), Seq.empty[String])
      .map(Tuple1(_)).toDF("items")
      .selectExpr("graft_subsets_k(items, 2) AS itemset")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a b", "a c", "a d", "b c", "b d", "c d"))
    // k out of range and null arrays generate nothing
    assert(spark.sql(
      """SELECT itemset FROM (SELECT cast(null as array<string>) AS items)
        |LATERAL VIEW graft_subsets_k(items, 2) t AS itemset""".stripMargin)
      .count() == 0)
    val kTooBig = Seq(Tuple1(Seq("a")))
      .toDF("items").selectExpr("graft_subsets_k(items, 3) AS itemset")
    assert(kTooBig.count() == 0)
  }

  test("graft_antecedents matches the typed antecedents kernel " +
    "row-for-row") {
    val s = spark; import s.implicits._
    graft.functions.AntecedentsGenerator.register(spark)
    val zs = Seq(Seq("a", "b", "c"), Seq("x", "y"))
    val got = zs.map(Tuple1(_)).toDF("z")
      .selectExpr("graft_antecedents(z) AS (antecedent, consequent)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      .groupBy(identity(_)).view.mapValues(_.size).toMap
    val want = zs.flatMap(z => Apriori.antecedents(z))
      .groupBy(identity(_)).view.mapValues(_.size).toMap
    assert(got == want)
    assert(got.values.sum == (8 - 2) + (4 - 2)) // 2^n - 2 each
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
