package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * dq_invalid_delivery_summary — daily invalid-rate rollup.
 *
 * Reference: `logistics_pipeline/models/layer/intermediate/quality/
 * dq_invalid_delivery_summary.sql`.
 *
 * `pct_of_total_events` is ROUND(CAST(count AS FLOAT)/total*100, 2) — the
 * float32 cast happens BEFORE the division, so stored values carry float32
 * artifacts (10.58 → 10.579999923706055; SURVEY §1.4.4). We reproduce the
 * cast order exactly.
 *
 * Shape: two grouped aggregates over invalid/staged joined on the date key —
 * the invalid-side groupBy is tiny (dates × ≤5 reasons) and broadcastable
 * against the per-date totals.
 */
object DqSummary {

  def summary(stg: DataFrame, invalid: DataFrame): DataFrame = {
    val invalidCounts = invalid
      .select(col("ingestion_timestamp").cast("date").as("event_date"),
              col("invalid_reason"), col("event_id"))
      .groupBy("event_date", "invalid_reason")
      .agg(count("event_id").as("invalid_count"))

    val allEvents = stg
      .select(col("ingestion_timestamp").cast("date").as("event_date"),
              col("event_id"))
      .groupBy("event_date")
      .agg(count("event_id").as("total_events"))

    invalidCounts
      .join(broadcast(allEvents), Seq("event_date"), "left")
      .select(
        col("event_date"), col("invalid_reason"), col("invalid_count"),
        col("total_events"),
        round(col("invalid_count").cast("float") /
                nullif(col("total_events"), lit(0)) * 100, 2)
          .cast("float")   // DuckDB ROUND(FLOAT,2) stays FLOAT → float32 artifact (§1.4.4)
          .as("pct_of_total_events"))
      .orderBy("event_date", "invalid_reason")
  }
}
