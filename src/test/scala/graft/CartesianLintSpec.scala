package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Lint: no entry may ship an unbounded Cartesian product. A
  * `CartesianProductExec` partitions as |left|·|right| tasks and is the
  * one join shape with no scale story at all; every deliberate cross
  * join in this library is a 1-row-or-catalog-sized broadcast
  * (`crossJoin(broadcast(...))` → BroadcastNestedLoopJoin with a tiny
  * build side). This spec walks every `SparkEntry.queries` physical
  * plan (pre-AQE `sparkPlan` — planning only, nothing executes) and
  * requires each CartesianProductExec to be explicitly pinned with its
  * boundedness justification; a new unpinned one fails the build.
  */
class CartesianLintSpec extends SparkSpecBase {

  /** query name → allowed CartesianProductExec count, each justified. */
  private val Pinned: Map[String, Int] = Map(
  )

  private def offenders(plan: SparkPlan): Seq[String] =
    plan.collect {
      case c: CartesianProductExec =>
        s"CartesianProduct over ${c.left.nodeName} × ${c.right.nodeName}"
    }

  test("every Cartesian product is pinned with a boundedness argument") {
    val found = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val offs =
          try offenders(fn(spark, Sf).queryExecution.sparkPlan)
          catch { case e: Throwable =>
            Seq(s"PLAN FAILURE ${e.getClass.getSimpleName}") }
        if (offs.isEmpty) None else Some(name -> offs)
    }
    val bad = found.filter { case (n, offs) =>
      Pinned.getOrElse(n, 0) != offs.size }
    assert(bad.isEmpty,
      s"""unpinned Cartesian products:
         |${bad.map { case (n, o) =>
             s"  $n (${o.size}):\n    ${o.mkString("\n    ")}" }
           .mkString("\n")}""".stripMargin)
  }
}
