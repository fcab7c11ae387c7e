package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{present, surrogateKey}

/**
 * The five dimensions of the star schema, each a function of
 * int_valid_logistics_events.
 *
 * Reference: `logistics_pipeline/models/layer/dimension/dim_*.sql`.
 *
 * Scale notes (100 TB): every dim is a shuffle (distinct / groupBy) whose
 * output is tiny relative to the fact (statuses: 6, carriers: 4, locations /
 * orders / timestamps: sublinear in events). Partial aggregation makes the
 * shuffle map-side-combined; the results are broadcast into the fact join.
 */
object Dimensions {

  /**
   * dim_order — per-order rollup (`dim_order.sql`).
   * `ANY_VALUE` ≈ Spark's `any_value` (both pick an arbitrary value per
   * group); MIN/MAX on the ISO-8601 `timestamp` strings are lexicographic,
   * which is chronological within the generator's fixed format.
   */
  def order(valid: DataFrame): DataFrame =
    valid.groupBy("order_id")
      .agg(
        any_value(col("destination")).as("destination"),
        any_value(col("origin")).as("origin"),
        min("weight_kg").as("weight_kg"),
        min("timestamp").as("first_event_timestamp"),
        max("timestamp").as("latest_event_timestamp"))
      .select(
        surrogateKey(col("order_id")).as("order_sk"),
        col("order_id"), col("destination"), col("origin"), col("weight_kg"),
        col("first_event_timestamp"), col("latest_event_timestamp"))

  /**
   * dim_time — distinct timestamps expanded to calendar attributes
   * (`dim_time.sql`). DuckDB `EXTRACT(DOW …)` is Sunday=0; Spark
   * `dayofweek` is Sunday=1, hence the `- 1` (SURVEY §1.4.5).
   * EXTRACT in DuckDB returns BIGINT — keep LongType for schema parity.
   */
  def time(valid: DataFrame): DataFrame = {
    val ts = col("full_timestamp").cast("timestamp")
    valid.select(col("timestamp").as("full_timestamp")).distinct()
      .select(
        surrogateKey(col("full_timestamp")).as("time_sk"),
        col("full_timestamp"),
        col("full_timestamp").cast("date").as("date"),
        year(ts).cast("long").as("year"),
        month(ts).cast("long").as("month"),
        dayofmonth(ts).cast("long").as("day"),
        hour(ts).cast("long").as("hour"),
        (dayofweek(ts) - 1).cast("long").as("day_of_week"))
  }

  /** dim_status — distinct present statuses (`dim_status.sql`). */
  def status(valid: DataFrame): DataFrame =
    valid.filter(present(col("status")))
      .select(col("status").as("status_name")).distinct()
      .select(surrogateKey(col("status_name")).as("status_sk"), col("status_name"))

  /**
   * dim_location — origins ∪ destinations (UNION ALL), deduped by
   * `GROUP BY location_name` with MIN(lat)/MIN(lon) (`dim_location.sql`).
   */
  def location(valid: DataFrame): DataFrame = {
    val origins = valid.filter(present(col("origin")))
      .select(col("origin").as("location_name"), col("latitude"), col("longitude"))
    val destinations = valid.filter(present(col("destination")))
      .select(col("destination").as("location_name"), col("latitude"), col("longitude"))
    origins.unionByName(destinations)
      .groupBy("location_name")
      .agg(min("latitude").as("latitude"), min("longitude").as("longitude"))
      .select(
        surrogateKey(col("location_name")).as("location_sk"),
        col("location_name"), col("latitude"), col("longitude"))
  }

  /** dim_carrier — distinct present carriers (`dim_carrier.sql`). */
  def carrier(valid: DataFrame): DataFrame =
    valid.filter(present(col("carrier_name")))
      .select(col("carrier_name")).distinct()
      .select(surrogateKey(col("carrier_name")).as("carrier_sk"), col("carrier_name"))
}
