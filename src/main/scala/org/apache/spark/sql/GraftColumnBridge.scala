package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so library code that
  * wants to wrap a custom `Expression` as a `Column` WITHOUT a session
  * function registry (e.g. [[graft.operators]]' pure-Column helpers)
  * goes through this package-placed accessor — the standard technique
  * Spark extension libraries use (same role as their `functions`
  * bridge objects).
  */
object GraftColumnBridge {

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
