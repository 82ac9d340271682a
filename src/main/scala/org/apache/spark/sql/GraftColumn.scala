package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping a custom Catalyst [[Expression]] in a user-facing
  * [[Column]] (and back) — `classic.ExpressionUtils` is `private[sql]` in
  * Spark 4, so the graft expressions (VecFoldExpression) route through this
  * shim, same pattern as registering TokenizeExpression via extensions.
  */
object GraftColumn {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
