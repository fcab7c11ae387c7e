package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {

  // trades (left) ← quotes (right), the canonical as-of shape
  private lazy val trades = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 25L, "t3"),
      ("B", 15L, "t4"), ("C", 99L, "t5")
    ).toDF("sym", "t", "trade_id")
  }

  private lazy val quotes = {
    val s = spark
    import s.implicits._
    Seq(
      ("A", 10L, 1.0, Some("x")),   // equal-time quote for t1
      ("A", 18L, 2.0, None),        // latest before t2/t3 — null side field
      ("B", 10L, 3.0, Some("y"))
      // C has no quotes at all
    ).toDF("sym", "t", "px", "src")
  }

  test("backward as-of: inclusive match, latest-before wins, unmatched stays null") {
    val out = AsOfJoin.asofBackward(trades, "sym", "t", quotes, "sym", "t")
      .orderBy("trade_id")
      .collect().map(r => (r.getAs[String]("trade_id"),
        Option(r.getAs[java.lang.Double]("px")).map(_.doubleValue)))
    assert(out.toSeq == Seq(
      ("t1", Some(1.0)),   // equal time matches (<=)
      ("t2", Some(2.0)),   // 18 < 20, latest
      ("t3", Some(2.0)),
      ("t4", Some(3.0)),
      ("t5", None)))       // no quote for C
  }

  test("strict mode excludes the equal-time right row") {
    val out = AsOfJoin.asofBackward(trades, "sym", "t", quotes, "sym", "t",
        strict = true)
      .filter(col("trade_id") === "t1").collect()
    assert(out.head.getAs[java.lang.Double]("px") == null)
  }

  test("a NULL field inside the matched right row stays NULL (no row mixing)") {
    // t2 matches the (A, 18) quote whose src is NULL — src must NOT borrow
    // the older (A, 10) quote's 'x'
    val out = AsOfJoin.asofBackward(trades, "sym", "t", quotes, "sym", "t")
      .filter(col("trade_id") === "t2").collect()
    assert(out.head.getAs[java.lang.Double]("px") == 2.0)
    assert(out.head.getAs[String]("src") == null)
  }

  test("null keys/times never fabricate matches (SQL join semantics)") {
    val s = spark
    import s.implicits._
    val l = Seq[(Option[String], Option[Long], String)](
      (Some("A"), Some(20L), "t1"),   // normal match
      (None, Some(20L), "t2"),        // null KEY: must attach nothing
      (Some("A"), None, "t3"))        // null TIME: must attach nothing
      .toDF("sym", "t", "trade_id")
    val r = Seq[(Option[String], Option[Long], Double)](
      (Some("A"), Some(10L), 1.0),
      (None, Some(5L), 9.0),          // null-key right row: matches NOBODY
      (Some("A"), None, 8.0))         // null-time right row: matches NOBODY
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asofBackward(l, "sym", "t", r, "sym", "t")
      .orderBy("trade_id")
      .collect().map(x => (x.getAs[String]("trade_id"),
        Option(x.getAs[java.lang.Double]("px")).map(_.doubleValue)))
    // before the r11 fix, the window partition grouped the null keys
    // together and t2 got the 9.0 quote — a match no real join produces
    assert(out.toSeq == Seq(
      ("t1", Some(1.0)), ("t2", None), ("t3", None)))
  }

  test("plans one shuffle on the key — no cartesian/nested-loop range join") {
    val p = AsOfJoin.asofBackward(trades, "sym", "t", quotes, "sym", "t")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("name guards: tag collisions and duplicate output columns are rejected loudly") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "2024-01-01 00:00:00", 1)).toDF("k", "t", "__side")
    val r = Seq((1L, "2024-01-01 00:00:00", 9)).toDF("k", "t", "v")
    val e1 = intercept[IllegalArgumentException](
      AsOfJoin.asofBackward(l, "k", "t", r, "k", "t"))
    assert(e1.getMessage.contains("__side"), e1.getMessage)
    // a carry column named like a left column would emit duplicate outputs
    val l2 = Seq((1L, "2024-01-01 00:00:00", "left")).toDF("k", "t", "v")
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.asofBackward(l2, "k", "t", r, "k", "t"))
    assert(e2.getMessage.contains("v"), e2.getMessage)
  }
}
