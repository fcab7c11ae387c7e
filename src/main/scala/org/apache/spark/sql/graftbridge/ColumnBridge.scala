package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Catalyst-Expression bridge. Spark 4 made the `Column` API
 * backend-agnostic and scoped the classic converters `private[sql]`; a
 * one-object bridge inside the sql package namespace is the standard way for
 * an extension library to register custom expressions as Columns.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
