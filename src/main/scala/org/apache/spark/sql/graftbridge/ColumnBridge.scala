package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalarSubquery}
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

  /**
   * A 1-row/1-column Dataset as a scalar-subquery Column (the SQL
   * `(SELECT agg FROM …)` form, unavailable through the public functions
   * API). Why it matters for broadcast model state: a model carried as a
   * 1-row broadcast JOIN column is physically COPIED into every joined
   * output row when the join materializes UnsafeRows — megabytes of model
   * bytes memcpy'd per row. A scalar subquery instead runs as its own
   * subquery stage inside each execution (so model-building work stays in
   * the measured run) and its RESULT value ships once per task binary —
   * never per row.
   */
  def scalarSubquery(ds: Dataset[_]): Column =
    column(ScalarSubquery(ds.queryExecution.analyzed))
}
