package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * dbt's four generic schema-test kinds as reusable DataFrame assertions, run
 * post-transform — the Spark analogue of `dbt test` over
 * `logistics_pipeline/models/layer/schema.yml` (40+ declared tests).
 *
 * Each test returns the VIOLATION COUNT (dbt's convention: a test passes iff
 * its compiled SELECT returns zero rows).
 */
object DbtStyleTests {

  /** `not_null` — rows where the column is null. */
  def notNull(df: DataFrame, column: String): Long =
    df.filter(col(column).isNull).count()

  /** `unique` — number of duplicated non-null key values. */
  def unique(df: DataFrame, column: String): Long =
    df.filter(col(column).isNotNull)
      .groupBy(column).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()

  /** `accepted_values` — rows whose value falls outside the enumeration. */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): Long =
    df.filter(col(column).isNotNull && !col(column).isin(values: _*)).count()

  /**
   * `relationships` — child FK values with no matching parent PK
   * (referential integrity; an anti-join, null FKs exempt per dbt).
   */
  def relationships(child: DataFrame, fk: String,
                    parent: DataFrame, pk: String): Long =
    child.filter(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
      .count()

  final case class TestResult(model: String, test: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  /**
   * The schema.yml test suite over a built warehouse (SURVEY §5.1.2): keys
   * not_null+unique on every model, accepted_values on enumerations, and the
   * six fact→dim relationship tests.
   */
  def suite(w: graft.models.Warehouse): Seq[TestResult] = {
    import graft.model.LogisticsEvent.validStatuses
    val keyTests = Seq(
      ("stg_logistics_events", w.stg, "event_id"),
      ("dim_order", w.dimOrder, "order_sk"),
      ("dim_time", w.dimTime, "time_sk"),
      ("dim_status", w.dimStatus, "status_sk"),
      ("dim_location", w.dimLocation, "location_sk"),
      ("dim_carrier", w.dimCarrier, "carrier_sk"),
      ("fact_event", w.factEvent, "event_sk")
    ).flatMap { case (m, df, k) => Seq(
      TestResult(m, s"not_null:$k", notNull(df, k)),
      TestResult(m, s"unique:$k", unique(df, k)))
    }
    val enumTests = Seq(
      TestResult("int_invalid_logistics_events", "accepted_values:invalid_reason",
        acceptedValues(w.invalid, "invalid_reason", Seq(
          "INVALID_WEIGHT", "MISSING_COORDINATES", "INVALID_ESTIMATED_DELIVERY",
          "MISSING_STATUS", "MISSING_LOCATION"))),
      TestResult("dim_status", "accepted_values:status_name",
        acceptedValues(w.dimStatus, "status_name", validStatuses)),
      TestResult("fact_event", "accepted_values:is_late_delivery",
        acceptedValues(w.factEvent, "is_late_delivery", Seq(true, false))))
    val relTests = Seq(
      ("order_sk", w.dimOrder), ("time_sk", w.dimTime),
      ("status_sk", w.dimStatus), ("carrier_sk", w.dimCarrier)
    ).map { case (fk, dim) =>
      TestResult("fact_event", s"relationships:$fk",
        relationships(w.factEvent, fk, dim, fk))
    } ++ Seq(
      TestResult("fact_event", "relationships:origin_location_sk",
        relationships(w.factEvent, "origin_location_sk", w.dimLocation, "location_sk")),
      TestResult("fact_event", "relationships:destination_location_sk",
        relationships(w.factEvent, "destination_location_sk", w.dimLocation, "location_sk")))
    keyTests ++ enumTests ++ relTests
  }
}
