package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The whole view DAG wired together — the Spark analogue of `dbt run` over the
 * reference's model tree (every model `+materialized: view`,
 * `logistics_pipeline/dbt_project.yml:32-43`): plain unpersisted DataFrames,
 * recomputed on read, exactly like the reference's views.
 *
 * `fromRaw` optionally caches the staged/valid frames: in the reference's
 * expanded fact_event tree, staging appears 7× (SURVEY §3.2) — DuckDB re-scans
 * one local file cheaply, but at 100 TB recomputing the staged projection per
 * branch is 7 full scans, so the shared prefix is worth materializing once.
 */
final case class Warehouse(
    raw: DataFrame,
    stg: DataFrame,
    valid: DataFrame,
    invalid: DataFrame,
    dimOrder: DataFrame,
    dimTime: DataFrame,
    dimStatus: DataFrame,
    dimLocation: DataFrame,
    dimCarrier: DataFrame,
    factEvent: DataFrame,
    dqInvalidDeliverySummary: DataFrame) {

  /** Register every model as a temp view (the `dbt run` step). */
  def registerViews(): Unit = {
    raw.createOrReplaceTempView("raw_logistics")
    stg.createOrReplaceTempView("stg_logistics_events")
    valid.createOrReplaceTempView("int_valid_logistics_events")
    invalid.createOrReplaceTempView("int_invalid_logistics_events")
    dimOrder.createOrReplaceTempView("dim_order")
    dimTime.createOrReplaceTempView("dim_time")
    dimStatus.createOrReplaceTempView("dim_status")
    dimLocation.createOrReplaceTempView("dim_location")
    dimCarrier.createOrReplaceTempView("dim_carrier")
    factEvent.createOrReplaceTempView("fact_event")
    dqInvalidDeliverySummary.createOrReplaceTempView("dq_invalid_delivery_summary")
  }
}

object Warehouse {

  /**
   * Build the full model DAG from the raw table.
   *
   * @param ingestionTs injectable clock for staging (tests / oracle runs pass
   *                    a fixed literal; production uses `current_timestamp()`)
   * @param cacheShared cache stg/valid — the shared prefix of every branch
   */
  def fromRaw(
      raw: DataFrame,
      ingestionTs: Column = current_timestamp(),
      cacheShared: Boolean = false): Warehouse = {
    val stg0 = Staging.stg(raw, ingestionTs)
    val stg = if (cacheShared) stg0.cache() else stg0
    val valid0 = Intermediate.valid(stg)
    val valid = if (cacheShared) valid0.cache() else valid0
    val invalid = Intermediate.invalid(stg)
    val dOrder = Dimensions.order(valid)
    val dTime = Dimensions.time(valid)
    val dStatus = Dimensions.status(valid)
    val dLocation = Dimensions.location(valid)
    val dCarrier = Dimensions.carrier(valid)
    val fact = Facts.factEvent(valid, dOrder, dTime, dStatus, dLocation, dCarrier)
    val dq = DqSummary.summary(stg, invalid)
    Warehouse(raw, stg, valid, invalid, dOrder, dTime, dStatus, dLocation,
      dCarrier, fact, dq)
  }
}
