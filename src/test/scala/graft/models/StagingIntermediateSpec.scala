package graft.models

import graft.SparkSuite
import graft.model.LogisticsEvent
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Unit coverage for the staging + validity layers over hand-built corruption
 * fixtures (FIXTURES.md §2), nailing the load-bearing quirks of SURVEY §1.4:
 * lexicographic temporal comparison, empty-after-trim dropping, float32
 * narrowing, priority CASE ordering.
 */
class StagingIntermediateSpec extends SparkSuite {

  private def mkRaw(rows: Seq[LogisticsEvent]): DataFrame = {
    val s = spark
    import s.implicits._
    spark.createDataFrame(rows)
  }

  private def ev(
      eventId: String = "e1", orderId: String = "o1",
      ts: String = "2026-02-23T01:09:36.021943+00:00",
      status: String = "In Transit", origin: String = "A, AA",
      dest: String = "B, BB", carrier: String = "DHL",
      lat: java.lang.Double = 10.0, lon: java.lang.Double = 20.0,
      weight: java.lang.Double = 5.5, est: String = "2026-02-27") =
    LogisticsEvent(Option(eventId), Option(orderId), Option(ts), Option(status),
      Option(origin), Option(dest), Option(carrier),
      Option(lat).map(_.doubleValue), Option(lon).map(_.doubleValue),
      Option(weight).map(_.doubleValue), Option(est))

  test("staging trims text, narrows floats, stamps ingestion_timestamp") {
    val stg = Staging.stg(mkRaw(Seq(ev(eventId = "  e1  ", status = " In Transit "))))
    val r = stg.head()
    assert(r.getAs[String]("event_id") == "e1")
    assert(r.getAs[String]("status") == "In Transit")
    assert(stg.schema("latitude").dataType.typeName == "float")
    assert(stg.schema("weight_kg").dataType.typeName == "float")
    assert(stg.schema("timestamp").dataType.typeName == "string")
    assert(stg.schema("ingestion_timestamp").dataType.typeName == "timestamp")
  }

  test("staging drops null and empty-after-trim ids") {
    val raw = mkRaw(Seq(
      ev(eventId = "keep"),
      ev(eventId = null),
      ev(eventId = "   "),        // trims to '' → dropped
      ev(orderId = null),
      ev(orderId = " ")))
    val stg = Staging.stg(raw)
    assert(stg.count() == 1)
    assert(stg.head().getAs[String]("event_id") == "keep")
  }

  test("same-day estimate is INVALID via lexicographic string comparison (§1.4.1)") {
    // '2026-02-23' < '2026-02-23T01:09:36…' because the shorter string is a prefix
    val raw = mkRaw(Seq(ev(eventId = "sameday", est = "2026-02-23")))
    val stg = Staging.stg(raw)
    assert(Intermediate.valid(stg).count() == 0)
    val inv = Intermediate.invalid(stg).head()
    assert(inv.getAs[String]("invalid_reason") == "INVALID_ESTIMATED_DELIVERY")
  }

  test("future-date estimate is valid; past estimate invalid") {
    val raw = mkRaw(Seq(
      ev(eventId = "ok", est = "2026-02-27"),
      ev(eventId = "past", est = "2026-02-20")))
    val stg = Staging.stg(raw)
    assert(Intermediate.valid(stg).select("event_id").head().getString(0) == "ok")
    assert(Intermediate.invalid(stg).select("event_id").head().getString(0) == "past")
  }

  test("stg = valid ⊎ invalid (disjoint, exhaustive) on mixed corruption") {
    val raw = mkRaw(Seq(
      ev(eventId = "v1"),
      ev(eventId = "w1", weight = 0.0),
      ev(eventId = "w2", weight = -5.0),
      ev(eventId = "c1", lat = null),
      ev(eventId = "d1", est = "2026-02-20"),
      ev(eventId = "s1", status = ""),
      ev(eventId = "l1", origin = ""),
      ev(eventId = "l2", dest = null)))
    val stg = Staging.stg(raw).cache()
    val v = Intermediate.valid(stg)
    val i = Intermediate.invalid(stg)
    assert(v.count() + i.count() == stg.count())
    assert(v.select("event_id").join(i.select("event_id"), Seq("event_id")).count() == 0)
  }

  test("priority CASE: weight > coordinates > delivery > status > location") {
    val raw = mkRaw(Seq(
      // weight AND status violated → weight wins
      ev(eventId = "m1", weight = 0.0, status = null),
      // coords AND location violated → coords wins
      ev(eventId = "m2", lat = null, origin = ""),
      // delivery AND status violated → delivery wins
      ev(eventId = "m3", est = "2020-01-01", status = "")))
    val inv = Intermediate.invalid(Staging.stg(raw))
      .select("event_id", "invalid_reason").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inv("m1") == "INVALID_WEIGHT")
    assert(inv("m2") == "MISSING_COORDINATES")
    assert(inv("m3") == "INVALID_ESTIMATED_DELIVERY")
  }

  test("null weight is invalid (flag uses IS NULL OR <= 0)") {
    val raw = mkRaw(Seq(ev(eventId = "nw", weight = null)))
    val inv = Intermediate.invalid(Staging.stg(raw)).head()
    assert(inv.getAs[String]("invalid_reason") == "INVALID_WEIGHT")
  }

  test("malformed timestamp still passes validity (string compare only, no cast)") {
    // est 'zzz' > ts 'not-a-date' lexicographically → valid per the reference rules
    val raw = mkRaw(Seq(ev(eventId = "weird", ts = "not-a-date", est = "zzz")))
    assert(Intermediate.valid(Staging.stg(raw)).count() == 1)
  }

  test("NULL timestamp lands on NEITHER side — the reference's own " +
       "three-valued-logic hole, reproduced as the parity contract") {
    // Rule 3 evaluates NULL in valid()'s conjunction; is_invalid_delivery's
    // `false OR NULL = NULL` keeps the row out of invalid()'s disjunction.
    // The reference SQL behaves identically under DuckDB (Intermediate
    // scaladoc) — this test pins that we reproduce, not "fix", the hole.
    val raw = mkRaw(Seq(ev(eventId = "nullts", ts = null)))
    val stg = Staging.stg(raw).cache()
    assert(stg.count() == 1)                       // staging keeps it…
    assert(Intermediate.valid(stg).count() == 0)   // …valid excludes it…
    assert(Intermediate.invalid(stg).count() == 0) // …and so does invalid
  }
}
