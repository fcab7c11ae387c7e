package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.models.Warehouse

/**
 * The nine ad-hoc serving queries the reference's two Streamlit dashboards
 * issue, as named DataFrame functions over the model DAG.
 *
 * Reference: `src/dashboards/Business_KPI_dashboard.py` (4 queries) and
 * `src/dashboards/pipeline_monitoring_dashboard.py` (5 queries).
 *
 * Scale notes: every query aggregates the fact/raw down to dashboard-sized
 * results; the dim joins are broadcasts, the groupBys partial-aggregate
 * map-side, and the top-k queries plan as TakeOrderedAndProject (no global
 * sort materialization).
 */
object DashboardQueries {

  /** Carrier performance KPI — the flagship query (`Business_KPI_dashboard.py:20-34`). */
  def carrierPerformance(w: Warehouse): DataFrame =
    w.factEvent.as("f")
      .join(broadcast(w.dimCarrier).as("c"),
        col("f.carrier_sk") === col("c.carrier_sk"), "left")
      .groupBy(col("c.carrier_name"))
      .agg(
        count("f.event_sk").as("total_events"),
        sum(when(col("f.is_late_delivery"), 1).otherwise(0)).as("late_deliveries"),
        round(
          sum(when(!col("f.is_late_delivery"), 1).otherwise(0)) * 100.0 /
            nullif(count("f.event_sk"), lit(0)), 2).as("on_time_rate"),
        round(avg("f.weight_kg"), 2).as("avg_weight_kg"))
      .orderBy(desc("on_time_rate"))

  /** Active-shipment map — 3 dim joins + filter (`Business_KPI_dashboard.py:55-68`).
    * `dim_location` carries NO broadcast hint: it is linear-ish in the fact
    * (see [[graft.models.Facts]]) — the planner auto-broadcasts it while
    * stats fit and shuffle-joins when it outgrows the threshold. */
  def activeShipments(w: Warehouse): DataFrame =
    w.factEvent.as("f")
      .join(w.dimLocation.as("l"),
        col("f.origin_location_sk") === col("l.location_sk"), "left")
      .join(broadcast(w.dimStatus).as("s"),
        col("f.status_sk") === col("s.status_sk"), "left")
      .join(broadcast(w.dimCarrier).as("c"),
        col("f.carrier_sk") === col("c.carrier_sk"), "left")
      .filter(col("s.status_name") =!= "Delivered" &&
        col("l.latitude").isNotNull && col("l.longitude").isNotNull)
      .select(col("l.latitude"), col("l.longitude"),
        col("s.status_name").as("status"), col("c.carrier_name"))

  /** Weight histogram input (`Business_KPI_dashboard.py:80-82`). */
  def weightDistribution(w: Warehouse): DataFrame =
    w.factEvent.filter(col("weight_kg").isNotNull).select("weight_kg")

  /** Events by status (`Business_KPI_dashboard.py:95-101`). */
  def eventsByStatus(w: Warehouse): DataFrame =
    w.factEvent.as("f")
      .join(broadcast(w.dimStatus).as("s"),
        col("f.status_sk") === col("s.status_sk"), "left")
      .groupBy(col("s.status_name"))
      .agg(count(lit(1)).as("event_count"))
      .orderBy(desc("event_count"))

  /** The three scalar header KPIs (`pipeline_monitoring_dashboard.py:21-23`). */
  def headlineKpis(w: Warehouse): DataFrame =
    w.raw.agg(
      count(lit(1)).as("total_events"),
      countDistinct("order_id").as("unique_orders"),
      max("timestamp").as("latest_event"))

  /** Per-minute ingestion trend, last 60 buckets (`pipeline_monitoring_dashboard.py:31-39`). */
  def ingestionTrend(w: Warehouse): DataFrame =
    w.raw
      .groupBy(date_trunc("minute", col("timestamp").cast("timestamp")).as("minute"))
      .agg(count(lit(1)).as("event_count"))
      .orderBy(desc("minute"))
      .limit(60)

  /** Invalid-record rollup (`pipeline_monitoring_dashboard.py:54-59`). */
  def dqIssues(w: Warehouse): DataFrame =
    w.dqInvalidDeliverySummary
      .groupBy("invalid_reason")
      .agg(sum("invalid_count").as("total_invalid"))
      .orderBy(desc("total_invalid"))

  /** Recent-20 raw preview (`pipeline_monitoring_dashboard.py:76`). */
  def recentRaw(w: Warehouse): DataFrame =
    w.raw.orderBy(desc("ingestion_timestamp")).limit(20)
}
