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

/** Bridge to build a DataFrame from a custom LogicalPlan node
  * (classic.Dataset.ofRows is private[sql]) — the entry point for
  * graft's planner-strategy operators (graft.plans.PackSequencesNode). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
