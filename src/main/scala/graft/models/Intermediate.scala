package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{missing, present}

/**
 * int_valid_logistics_events / int_invalid_logistics_events — the
 * complementary validity split.
 *
 * Reference: `logistics_pipeline/models/layer/intermediate/
 * int_valid_logistics_events.sql` and `int_invalid_logistics_events.SQL`.
 *
 * Rule 3 (`estimated_delivery >= timestamp`) is a STRING comparison — the
 * same-day-estimate case (`"2026-02-23" < "2026-02-23T01:09:36…"`, shorter
 * string is a prefix) classifies as invalid. Load-bearing (SURVEY §1.4.1).
 *
 * "Complementary" carries the reference's own three-valued-logic caveat
 * (r12 review): a staged row with a NULL `timestamp` (staging only drops
 * null/empty ids, never timestamps) lands on NEITHER side — rule 3
 * evaluates NULL in [[valid]]'s conjunction, and `is_invalid_delivery`'s
 * `false OR NULL = NULL` keeps it out of [[invalid]]'s disjunction too.
 * The reference SQL (`int_valid…sql:19` / `int_invalid…SQL:13-14`) behaves
 * identically under DuckDB, so reproducing the hole IS the parity contract;
 * such a row still counts in dq_invalid_delivery_summary's total_events,
 * exactly as it does there. The deployed generator never emits a null
 * timestamp, which is why the hole is latent in both systems.
 *
 * Both sides are narrow (filter / project only — no shuffle). At 100 TB the
 * split evaluates as two pushed-down predicate scans over the same staged
 * projection; if both sides are consumed in one job, cache the staged frame.
 */
object Intermediate {

  /** The 5-rule conjunctive validity filter (`int_valid_logistics_events.sql:6-29`). */
  def valid(stg: DataFrame): DataFrame =
    stg.filter(
      col("weight_kg") > 0f &&
      col("latitude").isNotNull && col("longitude").isNotNull &&
      col("estimated_delivery") >= col("timestamp") &&   // string compare!
      present(col("status")) &&
      present(col("origin")) && present(col("destination")))

  /** The 5 violation flags (`int_invalid_logistics_events.SQL:6-20`). */
  def flagged(stg: DataFrame): DataFrame =
    stg
      .withColumn("is_invalid_weight",
        col("weight_kg").isNull || col("weight_kg") <= 0f)
      .withColumn("is_missing_coordinates",
        col("latitude").isNull || col("longitude").isNull)
      .withColumn("is_invalid_delivery",
        col("estimated_delivery").isNull ||
        col("estimated_delivery") < col("timestamp"))     // string compare!
      .withColumn("is_missing_status", missing(col("status")))
      .withColumn("is_missing_location",
        missing(col("origin")) || missing(col("destination")))

  /**
   * Invalid rows, labelled via the priority CASE (first-true-wins:
   * weight > coordinates > delivery > status > location;
   * `int_invalid_logistics_events.SQL:22-57`). Drops `timestamp` in the final
   * projection, exactly like the reference's `labelled` CTE.
   */
  def invalid(stg: DataFrame): DataFrame = {
    val f = flagged(stg)
    f.filter(
        col("is_invalid_weight") || col("is_missing_coordinates") ||
        col("is_invalid_delivery") || col("is_missing_status") ||
        col("is_missing_location"))
      .select(
        col("event_id"), col("order_id"), col("estimated_delivery"),
        col("status"), col("origin"), col("destination"), col("carrier_name"),
        col("latitude"), col("longitude"), col("weight_kg"),
        col("ingestion_timestamp"),
        when(col("is_invalid_weight"), "INVALID_WEIGHT")
          .when(col("is_missing_coordinates"), "MISSING_COORDINATES")
          .when(col("is_invalid_delivery"), "INVALID_ESTIMATED_DELIVERY")
          .when(col("is_missing_status"), "MISSING_STATUS")
          .when(col("is_missing_location"), "MISSING_LOCATION")
          .as("invalid_reason"))
  }
}
