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
}
