package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column↔Expression converters — Spark 4 hides
  * `classic.ExpressionUtils` behind `private[sql]`, and custom Catalyst
  * expressions (e.g. [[graft.functions.SortedIntersectSize]]) need both
  * directions to expose themselves as `Column`s.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
