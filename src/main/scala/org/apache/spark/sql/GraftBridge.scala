package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters, so
  * graft's custom Catalyst expressions (e.g. `graft.functions.
  * DotProduct`) can be used as ordinary `Column`s. Lives in the
  * `org.apache.spark.sql` package solely for access; no Spark
  * internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
