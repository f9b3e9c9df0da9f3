package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column⇄Expression converters so graft's
  * native Catalyst expressions can be exposed as ordinary [[Column]]s
  * without installing SparkSessionExtensions on every session. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
