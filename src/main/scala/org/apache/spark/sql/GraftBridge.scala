package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters, needed
  * to expose custom Catalyst expressions as user-facing Columns in Spark 4
  * (where `new Column(expr)` is no longer public). Single point of contact
  * with Spark internals. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
