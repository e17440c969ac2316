package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the package-private Column <-> Expression converters of
  * the classic (non-Connect) API, for exposing custom Catalyst
  * expressions as Columns (Spark 4.x removed the public
  * `new Column(expr)` constructor).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
