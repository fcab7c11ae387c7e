package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScdMergeSpec extends SparkSuite {

  private val attrs = Seq("city", "tier")

  private def dim(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "city", "tier")
  }

  private def t(s: String) = lit(s"2024-$s 00:00:00")

  test("one batch: close+insert on change, no-op on identical, insert on new key") {
    val init = ScdMerge.scd2Init(dim(Seq(
      (1L, "paris", "gold"), (2L, "rome", "silver"), (3L, "oslo", "gold"))),
      "id", attrs, t("01-01"))
    val batch = dim(Seq(
      (1L, "lyon", "gold"),    // changed → close + insert
      (2L, "rome", "silver"),  // identical → no-op
      (9L, "bonn", "bronze"))) // new key → insert
    val out = ScdMerge.scd2Apply(init, batch, "id", attrs, t("02-01"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getTimestamp(3)).map(_.toString).orNull,
        Option(r.getTimestamp(4)).map(_.toString).orNull, r.getBoolean(5)))
      .toSet
    assert(out == Set(
      (1L, "paris", "gold", "2024-01-01 00:00:00.0", "2024-02-01 00:00:00.0", false),
      (1L, "lyon", "gold", "2024-02-01 00:00:00.0", null, true),
      (2L, "rome", "silver", "2024-01-01 00:00:00.0", null, true),
      (3L, "oslo", "gold", "2024-01-01 00:00:00.0", null, true),
      (9L, "bonn", "bronze", "2024-02-01 00:00:00.0", null, true)))
  }

  test("idempotent replay: re-applying the same batch changes nothing") {
    val init = ScdMerge.scd2Init(dim(Seq((1L, "paris", "gold"))), "id", attrs, t("01-01"))
    val batch = dim(Seq((1L, "lyon", "gold")))
    val once = ScdMerge.scd2Apply(init, batch, "id", attrs, t("02-01"))
    val twice = ScdMerge.scd2Apply(once, batch, "id", attrs, t("03-01"))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("closed history is immutable across later batches; chains grow to depth 3") {
    val init = ScdMerge.scd2Init(dim(Seq((1L, "paris", "gold"))), "id", attrs, t("01-01"))
    val s1 = ScdMerge.scd2Apply(init, dim(Seq((1L, "lyon", "gold"))), "id", attrs, t("02-01"))
    val s2 = ScdMerge.scd2Apply(s1, dim(Seq((1L, "nice", "gold"))), "id", attrs, t("03-01"))
    val rows = s2.orderBy("valid_from")
      .collect().map(r => (r.getString(1),
        Option(r.getTimestamp(4)).map(_.toString).orNull, r.getBoolean(5)))
    assert(rows.toSeq == Seq(
      ("paris", "2024-02-01 00:00:00.0", false),
      ("lyon", "2024-03-01 00:00:00.0", false),
      ("nice", null, true)))
  }

  test("duplicate keys in one batch: the max attribute tuple wins deterministically") {
    val init = ScdMerge.scd2Init(dim(Seq((1L, "paris", "gold"))), "id", attrs, t("01-01"))
    val batch = dim(Seq((1L, "aaa", "t1"), (1L, "zzz", "t0"), (1L, "mmm", "t9")))
    val out = ScdMerge.scd2Apply(init, batch, "id", attrs, t("02-01"))
      .filter(col("is_current")).collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "zzz") // max city under (city, tier) order
  }

  test("null attributes compare null-safely: null→value and value→null both version") {
    import spark.implicits._
    val init = ScdMerge.scd2Init(
      Seq((1L, null.asInstanceOf[String], "gold"), (2L, "rome", "silver"))
        .toDF("id", "city", "tier"), "id", attrs, t("01-01"))
    val batch = Seq((1L, "paris", "gold"), (2L, null.asInstanceOf[String], "silver"))
      .toDF("id", "city", "tier")
    val out = ScdMerge.scd2Apply(init, batch, "id", attrs, t("02-01"))
    assert(out.filter(!col("is_current")).count() == 2) // both closed
    assert(out.filter(col("is_current") && col("id") === 1L)
      .head.getString(1) == "paris")
    assert(out.filter(col("is_current") && col("id") === 2L)
      .head.getString(1) == null)
  }

  test("plan shape: one shuffle join on the key; history never shuffles") {
    val init = ScdMerge.scd2Init(
      spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
      "c_custkey", Seq("c_name", "c_mktsegment"), t("01-01"))
    val batch = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("c_mktsegment", lit("X"))
      .select("c_custkey", "c_name", "c_mktsegment")
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // disable broadcast so the intended shuffle-join shape is visible
      val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ScdMerge.scd2Apply(init, batch, "c_custkey", Seq("c_name", "c_mktsegment"),
          t("02-01")).queryExecution.executedPlan
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    // exactly ONE full-outer join — the array+explode emission keeps
    // Catalyst from splitting it into three filtered joins that would
    // re-shuffle the open slice per branch
    assert(joins.size == 1, plan.toString)
    assert(joins.head.joinType.toString == "FullOuter", joins.head.joinType)
    // the history (NOT is_current) branch reaches the union without any
    // exchange: every shuffle in the tree sits under the join
    val exchangesOutsideJoin = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.filterNot(e => joins.head.collect {
      case x: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => x
    }.contains(e))
    assert(exchangesOutsideJoin.isEmpty, plan.toString)
  }

  test("null business keys are excluded: no open-row fabrication across batches") {
    import spark.implicits._
    // r12 review: a NULL key never equi-joins, so each batch would insert a
    // FRESH open null-key version while all prior ones pass through — N
    // batches → N is_current rows for a key addressing no member
    val init = ScdMerge.scd2Init(
      Seq((Option(1L), "paris", "gold"), (Option.empty[Long], "ghost", "x"))
        .toDF("id", "city", "tier"), "id", attrs, t("01-01"))
    assert(init.count() == 1) // the null-key snapshot row is dropped
    val batch = Seq((Option.empty[Long], "ghost2", "y"),
      (Option(1L), "lyon", "gold")).toDF("id", "city", "tier")
    val out1 = ScdMerge.scd2Apply(init, batch, "id", attrs, t("02-01"))
    val out2 = ScdMerge.scd2Apply(out1, batch, "id", attrs, t("03-01"))
    assert(out2.filter(col("id").isNull).count() == 0)
    // key 1 versioned normally: paris closed + lyon open
    assert(out2.filter(col("is_current")).count() == 1)
    assert(out2.count() == 2)
  }
}
