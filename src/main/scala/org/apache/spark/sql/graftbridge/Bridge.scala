package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for Spark 4's private[sql] Column↔Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) so graft's custom Catalyst
  * expressions get first-class Column wrappers. Additive shim — nothing in
  * Spark is modified. */
object Bridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an already-constructed logical plan (classic
    * Dataset.ofRows) — used to re-register a temp view after splicing a
    * secured subtree into its captured plan. */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Fully-converted expression (no lazy ColumnNode wrapper) — required
    * when a Column built from `functions._` is returned from a
    * FunctionRegistry builder, where the analyzer will not run the
    * column-node converter for us. */
  def resolvedExpression(c: Column): Expression =
    classic.SparkSession.active.expression(c)
}
