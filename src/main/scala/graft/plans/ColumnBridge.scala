package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression conversions —
  * needed to expose custom Catalyst expressions (graft.plans.*) as
  * user-facing Columns on Spark 4, where Column wraps a ColumnNode
  * instead of an Expression. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
