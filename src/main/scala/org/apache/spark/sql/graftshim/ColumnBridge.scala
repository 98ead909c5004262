package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for building `Column`s from custom Catalyst expressions.
  *
  * Spark 4 routes `Column` through `ColumnNode` (Connect refactor); the
  * classic-session converter lives in `private[sql]` scope, so this
  * one-liner sits inside the `org.apache.spark.sql` package tree. Only
  * glue — all engine logic stays under `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
