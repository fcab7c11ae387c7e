package graft.coverage

import graft.SparkSuite

/** The HLL approx-distinct stays within its configured rsd of exact. */
class ApproxDistinctSpec extends SparkSuite {
  test("approx_count_distinct within 3×rsd of exact at sf0.001") {
    val r = OperatorQueries.a8ApproxCountDistinct(spark, "/root/testdata/sf0.001").head()
    val approx = r.getAs[Long]("approx_users")
    val exact = r.getAs[Long]("exact_users")
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"approx=$approx exact=$exact err=$err")
  }
}
