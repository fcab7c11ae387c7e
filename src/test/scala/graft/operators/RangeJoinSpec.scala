package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {

  private lazy val points = {
    val s = spark
    import s.implicits._
    Seq((1L, 5.0), (2L, 10.0), (3L, 19.9), (4L, 25.0), (5L, 100.0))
      .toDF("pid", "x")
  }

  private lazy val intervals = {
    val s = spark
    import s.implicits._
    Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 24.0, 26.0), ("d", 90.0, 95.0))
      .toDF("iid", "lo", "hi")
  }

  test("binned range join equals the brute-force BETWEEN join") {
    val fast = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
        binWidth = 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val brute = points.crossJoin(intervals)
      .filter(col("x").between(col("lo"), col("hi")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == brute)
    // boundary inclusivity: x=10 is in both [0,10] and [10,20]
    assert(fast.contains((2L, "a")) && fast.contains((2L, "b")))
    // 100.0 matches nothing
    assert(!fast.exists(_._1 == 5L))
  }

  test("no duplicate pairs even when an interval spans many bins") {
    val out = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi",
      binWidth = 0.5) // every interval spans many bins
    assert(out.count() == out.select("pid", "iid").distinct().count())
  }

  test("plans an equi-join on the bin — no nested-loop/cartesian") {
    val p = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 7.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("junk inputs degrade exactly like SQL BETWEEN: inverted and null-bound " +
      "intervals and null points match nothing") {
    val s = spark
    import s.implicits._
    // inverted (lo > hi): BETWEEN is empty in SQL three-valued logic; the
    // binned path explodes a descending bin sequence but the verify filter
    // rejects every pair — wasted rows, never wrong ones
    val junky = Seq(
      ("inv", Some(20.0), Some(10.0)),    // inverted
      ("nlo", None: Option[Double], Some(5.0)),  // null lo
      ("nhi", Some(5.0), None: Option[Double]),  // null hi
      ("ok", Some(0.0), Some(10.0))       // one real interval as control
    ).toDF("iid", "lo", "hi")
    val pts = Seq((1L, Some(5.0)), (2L, Some(15.0)),
      (3L, None: Option[Double])).toDF("pid", "x")
    val got = RangeJoin.pointInInterval(pts, "x", junky, "lo", "hi", 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // only the control interval matches, and only the non-null in-range point
    assert(got === Set((1L, "ok")))
  }

  test("scratch-name guard: an input __bin is rejected loudly") {
    val s = spark
    import s.implicits._
    val pts = Seq((1.0, 7L)).toDF("t", "__bin")
    val ivs = Seq((0.0, 2.0)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(pts, "t", ivs, "lo", "hi", 1.0))
    assert(e.getMessage.contains("__bin"), e.getMessage)
  }
}
