package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `sql`-package-private Column ↔ Expression
  * converters (Spark 4 moved `Column` to a connect-agnostic node
  * model; libraries defining native Catalyst expressions go through
  * `classic.ExpressionUtils`). Standard extension-library pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a manually-built (resolved) logical plan — the
    * entry point for custom plan nodes (e.g. graft.plans.AsOfJoinNode).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
