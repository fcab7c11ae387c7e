package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * stg_logistics_events — cast/trim/clean.
 *
 * Reference: `logistics_pipeline/models/layer/staging/stg_logistics_events.sql`.
 *
 * Semantics preserved exactly (SURVEY §1.4):
 *  - the 8 text fields are `TRIM(CAST(x AS STRING))`;
 *  - `timestamp` / `estimated_delivery` REMAIN strings (lexicographic
 *    comparison is the reference's temporal semantics — §1.4.1);
 *  - lat/lon/weight narrow to float32 (§1.4.4);
 *  - `ingestion_timestamp` is re-projected as "now" on every evaluation
 *    (`stg_logistics_events.sql:20`) — Spark's `current_timestamp()` is
 *    likewise fixed per query execution (§1.4.2). Tests inject a fixed clock.
 *  - rows with NULL/empty (after trim) event_id or order_id are dropped
 *    (`stg_logistics_events.sql:25-33`).
 *
 * Scale note: this is a pure narrow projection + filter — no shuffle; the
 * filter and the 12-column pruning push down to the parquet scan.
 */
object Staging {

  private val textCols =
    Seq("event_id", "order_id", "timestamp", "estimated_delivery",
        "status", "origin", "destination", "carrier_name")
  private val floatCols = Seq("latitude", "longitude", "weight_kg")

  /** The staged projection with an injectable ingestion clock (for tests / oracle determinism). */
  def stg(raw: DataFrame, ingestionTs: Column = current_timestamp()): DataFrame = {
    val projected = raw.select(
      textCols.map(c => trim(col(c).cast("string")).as(c)) ++
      floatCols.map(c => col(c).cast("float").as(c)) :+
      ingestionTs.as("ingestion_timestamp"): _*)
    projected.filter(
      graft.functions.present(col("event_id")) &&
      graft.functions.present(col("order_id")))
  }
}
