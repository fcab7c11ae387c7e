package graft.coverage

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PercentileSpec extends SparkSuite {

  test("exact percentile interpolates like the textbook definition") {
    val s = spark
    import s.implicits._
    // sorted [10, 20, 30, 40]: p50 → pos 1.5 → 20 + 0.5·(30−20) = 25
    val df = Seq(10.0, 40.0, 20.0, 30.0).toDF("x")
    val p = df.agg(expr("percentile(x, 0.5)")).head().getDouble(0)
    assert(p == 25.0)
  }

  test("approx_percentile (the one-pass 100 TB sketch) tracks exact percentile") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"))
      .head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // 1/accuracy = 0.1% rank error bound; prices are dense so value error stays small
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
