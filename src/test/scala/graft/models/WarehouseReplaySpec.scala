package graft.models

import graft.SparkSuite
import graft.model.LogisticsEvent
import graft.quality.DbtStyleTests
import graft.serve.DashboardQueries
import org.apache.spark.sql.functions._

/**
 * End-to-end replay of the reference's committed warehouse
 * (`src/warehouse/data/warehouse.duckdb`, 690 raw rows, exported read-only to
 * the fixture parquet) through our full model DAG, asserting every
 * dataset-level invariant from BASELINE.md §a.
 */
class WarehouseReplaySpec extends SparkSuite {

  private lazy val w: Warehouse = {
    val raw = spark.read.parquet(fixturePath("raw_logistics.parquet"))
    Warehouse.fromRaw(raw, cacheShared = true)
  }

  test("raw has 690 rows; staging drops none") {
    assert(w.raw.count() == 690)
    assert(w.stg.count() == 690)
  }

  test("validity split is 617 / 73") {
    assert(w.valid.count() == 617)
    assert(w.invalid.count() == 73)
  }

  test("all 73 invalid rows are INVALID_ESTIMATED_DELIVERY (same-day string-compare artifact)") {
    val reasons = w.invalid.groupBy("invalid_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons == Map("INVALID_ESTIMATED_DELIVERY" -> 73L))
  }

  test("dimension row counts: order 617, time 617, status 6, location 1234, carrier 4") {
    assert(w.dimOrder.count() == 617)
    assert(w.dimTime.count() == 617)
    assert(w.dimStatus.count() == 6)
    assert(w.dimLocation.count() == 1234)
    assert(w.dimCarrier.count() == 4)
  }

  test("fact has 617 rows, no late deliveries, and fully-resolved dimension keys") {
    val fact = w.factEvent.cache()
    assert(fact.count() == 617)
    assert(fact.filter(col("is_late_delivery")).count() == 0)
    // every FK resolved (left joins found their dim rows)
    val nullFks = fact.filter(
      col("order_sk").isNull || col("time_sk").isNull || col("status_sk").isNull ||
      col("origin_location_sk").isNull || col("destination_location_sk").isNull ||
      col("carrier_sk").isNull).count()
    assert(nullFks == 0)
  }

  test("dq summary collapses to one date with the float32 pct artifact (§1.4.4)") {
    val rows = w.dqInvalidDeliverySummary.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("invalid_count") == 73L)
    assert(r.getAs[Long]("total_events") == 690L)
    // float32(10.58) — the exact stored artifact from the reference warehouse
    assert(r.getAs[Float]("pct_of_total_events") == 10.58f)
    assert(r.getAs[Float]("pct_of_total_events").toDouble == 10.579999923706055)
  }

  test("carrier KPI: 4 carriers, all 100% on-time (flagship query)") {
    val kpi = DashboardQueries.carrierPerformance(w).collect()
    assert(kpi.length == 4)
    assert(kpi.forall(_.getAs[Double]("on_time_rate") == 100.0))
    assert(kpi.map(_.getAs[Long]("total_events")).sum == 617L)
    val names = kpi.map(_.getAs[String]("carrier_name")).toSet
    assert(names == LogisticsEvent.carriers.toSet)
  }

  test("status distribution matches the committed warehouse") {
    val dist = DashboardQueries.eventsByStatus(w).collect()
      .map(r => r.getAs[String]("status_name") -> r.getAs[Long]("event_count")).toMap
    // raw distribution minus the 73 invalid rows, verified against BASELINE.md
    assert(dist.values.sum == 617L)
    assert(dist.keySet == LogisticsEvent.validStatuses.toSet)
  }

  test("headline KPIs: 690 events, unique orders, max timestamp is a string max") {
    val r = DashboardQueries.headlineKpis(w).head()
    assert(r.getAs[Long]("total_events") == 690L)
    assert(r.getAs[Long]("unique_orders") > 0L)
    assert(r.getAs[String]("latest_event").startsWith("2026-"))
  }

  test("remaining dashboard queries: map, weights, trend, dq rollup, recent-20") {
    val map = DashboardQueries.activeShipments(w)
    assert(map.count() > 0)
    assert(map.filter(col("status") === "Delivered").count() == 0)

    assert(DashboardQueries.weightDistribution(w).count() == 617)

    val trend = DashboardQueries.ingestionTrend(w).collect()
    assert(trend.nonEmpty && trend.length <= 60)
    assert(trend.map(_.getAs[Long]("event_count")).forall(_ > 0))

    val dq = DashboardQueries.dqIssues(w).collect()
    assert(dq.length == 1 &&
      dq.head.getAs[String]("invalid_reason") == "INVALID_ESTIMATED_DELIVERY" &&
      dq.head.getAs[Long]("total_invalid") == 73L)

    assert(DashboardQueries.recentRaw(w).count() == 20)
  }

  test("dbt-style schema test suite passes end to end") {
    val results = DbtStyleTests.suite(w)
    // the full schema.yml roster (51 declared tests) + 1 beyond-schema
    assert(results.length == 52, s"expected 52 tests, got ${results.length}")
    val failures = results.filterNot(_.passed)
    assert(failures.isEmpty, s"failing tests: $failures")
  }
}
