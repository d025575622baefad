package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 scopes the Expression↔Column converters
  * `private[sql]` (classic/columnNodeSupport.scala); this one-file shim in
  * the sql package re-exports exactly the two converters, so graft kernels
  * can be used as Columns without per-session function registration. */
object GraftColumn {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
