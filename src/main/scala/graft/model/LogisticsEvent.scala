package graft.model

import org.apache.spark.sql.types._

/**
 * The canonical 11-field logistics event record.
 *
 * Mirrors the reference's Pydantic model (reference:
 * `src/api/generator.py:33-44`) and the bronze parquet shape written by the
 * stream consumer (`src/stream/consumer_to_minio.py:86-91`).
 *
 * Deliberate choices (SURVEY §1.2, §1.4):
 *  - `timestamp` and `estimated_delivery` stay STRING through the whole
 *    pipeline: all temporal comparisons downstream are lexicographic string
 *    comparisons on ISO-8601 text, and the same-day-estimate edge case
 *    (`"2026-02-23" < "2026-02-23T01:09:36+00:00"`) is load-bearing behavior.
 *  - lat/lon/weight arrive as float64 (pandas-inferred parquet) and are only
 *    narrowed to float32 at staging.
 *  - Every field is nullable: the generator never emits nulls, but corruption
 *    modes (FIXTURES.md §2) and the DQ gate depend on null routing.
 */
final case class LogisticsEvent(
    event_id: Option[String],
    order_id: Option[String],
    timestamp: Option[String],
    status: Option[String],
    origin: Option[String],
    destination: Option[String],
    carrier_name: Option[String],
    latitude: Option[Double],
    longitude: Option[Double],
    weight_kg: Option[Double],
    estimated_delivery: Option[String]
)

object LogisticsEvent {

  /** Bronze parquet / Kafka-JSON schema (all nullable, SURVEY §1.2). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("order_id", StringType),
    StructField("timestamp", StringType),
    StructField("status", StringType),
    StructField("origin", StringType),
    StructField("destination", StringType),
    StructField("carrier_name", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("weight_kg", DoubleType),
    StructField("estimated_delivery", StringType)
  ))

  /** `raw_logistics` = bronze + ingestion_timestamp (reference `_init_duckdb.py:50-56`). */
  val rawSchema: StructType =
    schema.add(StructField("ingestion_timestamp", TimestampType))

  /** The six valid statuses (reference `src/api/generator.py:47`). */
  val validStatuses: Seq[String] = Seq(
    "Order Created", "Picked Up", "In Transit",
    "Out for Delivery", "Delivered", "Delayed")

  /** The four carriers (reference `src/api/generator.py:55`). */
  val carriers: Seq[String] = Seq("BlueDart", "FedEx", "DHL", "SwiftLogistics")
}
