package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.types.{AbstractDataType, TypeCollection}

/**
 * Input-type-check bridge. `ExpectsInputTypes` (the standard analysis-time
 * type validation every built-in expression uses — wrong-typed arguments
 * become an AnalysisException instead of executor-side garbage reads) is
 * public, but its vocabulary types `AbstractDataType`/`TypeCollection` are
 * `private[sql]` in Spark 4 — same situation as [[ColumnBridge]], same
 * one-object remedy. Fails at compile on a Spark minor bump, by design.
 */
object TypeBridge {
  type AbstractType = AbstractDataType
  /** `TypeCollection` — accepts any one of the given types (e.g. an
    * `array<float>` OR `array<double>` vector argument). */
  def oneOf(types: AbstractDataType*): AbstractDataType =
    TypeCollection(types: _*)
}
