package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. Spark 4 moved Column to a plan-agnostic ColumnNode representation;
  * the Expression<->Column converters live in `classic.ExpressionUtils`,
  * which is package-private to org.apache.spark.sql — hence this shim in the
  * Spark namespace (the established pattern for Spark-native libraries).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
