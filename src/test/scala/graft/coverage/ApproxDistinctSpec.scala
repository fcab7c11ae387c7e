package graft.coverage

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The HLL approx-distinct stays within its configured rsd of exact. */
class ApproxDistinctSpec extends SparkSuite {
  test("approx_count_distinct within 3×rsd of exact at sf0.001") {
    // the raw estimate (the driver query folds it into a verdict column —
    // oracle-checkable — so the bound is asserted on the underlying agg here)
    val r = OperatorQueries.T(spark, "/root/testdata/sf0.001", "events")
      .agg(approx_count_distinct("user_id", 0.02).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .head()
    val approx = r.getAs[Long]("approx_users")
    val exact = r.getAs[Long]("exact_users")
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"approx=$approx exact=$exact err=$err")
  }

  test("driver query verdict: exact count carried, bound met") {
    val r = OperatorQueries.a8ApproxCountDistinct(spark, "/root/testdata/sf0.001").head()
    assert(r.getAs[Long]("exact_users") > 0)
    assert(r.getAs[Boolean]("within_5pct"))
  }
}
