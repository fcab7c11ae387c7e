package graft.sources

import graft.SparkSuite
import graft.models.Warehouse
import org.apache.spark.sql.functions._

/** Distribution parity with the reference generator (`generator.py:46-60`)
  * plus determinism and end-to-end compatibility with the warehouse DAG. */
class EventGeneratorSpec extends SparkSuite {

  private lazy val gen = EventGenerator.events(spark, 2000L, seed = 7L).cache()

  test("ids: uuid4-shaped unique event ids; ORD-??-#### order ids") {
    assert(gen.count() == 2000L)
    assert(gen.select("event_id").distinct().count() == 2000L)
    val badUuid = gen.filter(!col("event_id")
      .rlike("^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$")).count()
    assert(badUuid == 0L)
    val badOrder = gen.filter(!col("order_id")
      .rlike("^ORD-[A-Za-z]{2}-[0-9]{4}$")).count()
    assert(badOrder == 0L)
  }

  test("categorical draws are complete and roughly uniform") {
    val st = gen.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.keySet == EventGenerator.statuses.toSet)
    // 2000/6 ≈ 333 expected; loose 3-sigma-ish band
    assert(st.values.forall(n => n > 230 && n < 440), st.toString)
    val ca = gen.groupBy("carrier_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ca.keySet == EventGenerator.carriers.toSet)
    assert(ca.values.forall(n => n > 390 && n < 610), ca.toString)
  }

  test("numeric ranges and precision match the reference") {
    val bad = gen.filter(
      col("weight_kg") < 1.0 || col("weight_kg") > 500.0 ||
      col("latitude") < -90 || col("latitude") > 90 ||
      col("longitude") < -180 || col("longitude") > 180 ||
      round(col("weight_kg"), 2) =!= col("weight_kg")).count()
    assert(bad == 0L)
  }

  test("estimated_delivery spans [today, +10d] with the ~1/11 same-day rate") {
    val days = gen.select(
      datediff(to_date(col("estimated_delivery")),
        to_date(to_timestamp(col("timestamp")))).as("d"))
    // events advance 1s each from the start instant, all on the start date
    assert(days.filter(col("d") < 0 || col("d") > 10).count() == 0L)
    val sameDay = days.filter(col("d") === 0).count().toDouble / 2000.0
    assert(sameDay > 0.04 && sameDay < 0.15, s"same-day rate $sameDay")
  }

  test("same seed reproduces the identical frame; different seed diverges") {
    val a = EventGenerator.events(spark, 100L, seed = 7L).collect().toSeq
    val b = EventGenerator.events(spark, 100L, seed = 7L).collect().toSeq
    val c = EventGenerator.events(spark, 100L, seed = 8L).collect().toSeq
    assert(a == b)
    assert(a != c)
  }

  test("generated events flow through the warehouse with the same-day invalidity artifact") {
    val w = Warehouse.fromRaw(gen, ingestionTs = lit("2026-02-23T12:00:00+00:00")
      .cast("timestamp"))
    val total = w.stg.count()
    val invalid = w.invalid.count()
    assert(total == 2000L)
    // same-day estimates fail the string-compare validity rule (§1.4.1);
    // rate ≈ 1/11 like the reference generator's date_between('today','+10d')
    val reasons = w.invalid.select("invalid_reason").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reasons == Set("INVALID_ESTIMATED_DELIVERY"), reasons.toString)
    val rate = invalid.toDouble / total
    assert(rate > 0.04 && rate < 0.15, s"invalid rate $rate")
    assert(w.factEvent.count() == total - invalid)
  }

  test("a non-UTC session time zone is rejected (corpus would not reproduce)") {
    val key = "spark.sql.session.timeZone"
    spark.conf.set(key, "Asia/Tokyo")
    try {
      val e = intercept[IllegalArgumentException](
        EventGenerator.events(spark, 10))
      assert(e.getMessage.contains("UTC"), e.getMessage)
    } finally spark.conf.set(key, "UTC")
  }
}
