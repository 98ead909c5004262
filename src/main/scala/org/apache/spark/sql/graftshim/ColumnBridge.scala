package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

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

  /** EAGER conversion of a Column's node tree into a Catalyst
    * expression (the classic-session converter), for contexts that
    * never pass through the Dataset API's conversion step — e.g.
    * expressions returned from a FunctionRegistry builder
    * (`GraftExtensions`). [[expression]] only WRAPS the node
    * (`ColumnNodeExpression`); handing that wrapper to the analyzer
    * via a function builder leaves an unconvertible node in the plan
    * (no-codegen errors at execution). The converted tree may still
    * contain `UnresolvedFunction`s — the analyzer resolves those
    * normally, exactly as it does for Dataset-built plans. */
  def catalystExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
