package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's private[sql] Column <-> Expression converters, for
  * exposing custom Catalyst expressions as Columns (the classic pattern for
  * Spark extension libraries since the Column/ColumnNode refactor).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Convert a Column to a real catalyst Expression TREE (unresolved
    * functions and lambdas as first-class nodes the analyzer recurses
    * into), not an opaque `ColumnNodeExpression` wrapper — required when
    * the expression is handed to the analyzer outside a Dataset
    * transformation, e.g. from a FunctionRegistry builder
    * (functions.SqlFunctions).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** The exact ANSI divide-by-zero error Spark's Divide raises — thrown by
    * graft_nearest_cells on a zero-norm vector so the native kernel's
    * failure mode is indistinguishable from the literal cosine pipeline's
    * (`QueryExecutionErrors` is private[sql]).
    */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)

  /** DataFrame from a logical plan (classic Dataset.ofRows is private[sql]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
