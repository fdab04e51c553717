package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 removed the public `new Column(expr)` constructor).
  * Lives in the `org.apache.spark.sql` package purely for access;
  * used by graft.functions.CatalystExprs.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
