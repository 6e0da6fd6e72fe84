package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters for
  * graft's custom Catalyst expressions. Lives in the org.apache.spark.sql
  * package purely for access; the public Spark 4 API routes Column
  * construction through ColumnNodes, and `classic.ExpressionUtils` is the
  * supported internal path for classic-mode extensions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
