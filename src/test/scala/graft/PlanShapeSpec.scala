package graft

import graft.coverage.OperatorQueries
import graft.models.Warehouse
import org.apache.spark.sql.DataFrame

/**
 * Physical-plan shape assertions — the scale contract, machine-checked:
 * filters and projections reach the parquet scan, dims broadcast, top-k
 * fuses, and nothing silently degrades to a cartesian/nested-loop join.
 * (A plan that passes correctness but loses these properties would still
 * "work" at sf0.01 and melt at 100 TB.)
 */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val p = plan(OperatorQueries.p3ConjunctiveFilter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), p)
    // pruned read schema: only the two projected + filtered columns
    assert(!p.contains("l_extendedprice"), "column pruning lost: " + p)
  }

  test("the 5-way role-playing join is all broadcast hash joins") {
    val p = plan(OperatorQueries.j2RolePlayingJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SMJ: " + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan(OperatorQueries.o3TopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("fact_event: six left joins, every one broadcast, fact side never shuffles") {
    // other suites may have cached this same plan — a CacheManager hit would
    // render an InMemoryRelation (whose stored plan double-counts the joins)
    spark.catalog.clearCache()
    val raw = spark.read.parquet(fixturePath("raw_logistics.parquet"))
    val w = Warehouse.fromRaw(raw)
    val p = plan(w.factEvent)
    assert(!p.contains("SortMergeJoin"), "a dim join fell back to SMJ: " + p)
    // all six dim joins broadcast (the dims' internal aggregations may
    // hash-partition — that's the dim build, not the fact side)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 6, s"expected 6 broadcast joins, got $bhj: " + p)
  }

  test("anti-join dedup broadcasts the key set (no full shuffle of incoming)") {
    val p = plan(OperatorQueries.s7AntiJoinDedup(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("grouped aggregation is partial + final (map-side combine)") {
    val p = plan(OperatorQueries.a1GroupMultiAgg(spark, dir))
    assert(p.contains("partial_"), "no partial aggregation: " + p)
  }
}
