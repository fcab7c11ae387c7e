package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionizeSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00")

  test("gap semantics: strict-< merges, exact-gap splits, per-key isolation") {
    val s = spark
    import s.implicits._
    // user 1: 0,5,9 min (one session, gaps < 10) | 25 min (gap 16 → new)
    // user 2: 0 min, 10 min — gap EXACTLY 10 min → splits (session_window
    //         windows are right-exclusive)
    val df = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(5)), (3L, 1L, ts(9)), (4L, 1L, ts(25)),
      (5L, 2L, ts(0)), (6L, 2L, ts(10))
    ).toDF("event_id", "user_id", "ts")
    val sess = Sessionize.sessionStats(df, "user_id", "ts", "event_id",
      gapSeconds = 600)
    val byUser = sess.groupBy("user_id").agg(
      count(lit(1)).as("n_sessions"), max("n_events").as("max_ev"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byUser(1L) == (2L, 3L))
    assert(byUser(2L) == (2L, 1L))
    // durations: user 1 session 1 spans 0→9 min
    val d = sess.filter(col("user_id") === 1 && col("session_seq") === 1)
      .head().getAs[Long]("duration_us")
    assert(d == 9L * 60 * 1000000)
  }

  // Route through the shared coverage loader (the exact frame Verify/Bench
  // feed the operator) instead of a private re-cast of the raw parquet — the
  // round-5 testdata regeneration changed ts's physical type and the spec's
  // hardcoded nanos cast broke alongside the queries; the shared loader
  // normalizes every known generation in one place.
  private def events: org.apache.spark.sql.DataFrame =
    graft.coverage.OperatorQueries.T(spark, "/root/testdata/sf0.001", "events")

  test("window-function path and session_window path partition identically") {
    val e = events
    val gap = 4L * 3600
    val a = Sessionize.sessionStats(e, "user_id", "ts", "event_id", gap)
      .select("user_id", "session_start", "n_events")
    val b = Sessionize.sessionWindowAgg(e, "user_id", "ts", gap)
      .select("user_id", "session_start", "n_events")
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("both stacked windows share ONE exchange and ONE sort") {
    val e = events
    val plan = Sessionize
      .withSessionIds(e, "user_id", "ts", "event_id", gapSeconds = 3600)
      .queryExecution.executedPlan.toString
    def count(marker: String): Int = marker.r.findAllIn(plan).length
    // lag + running sum use the same partitioning and ordering; Catalyst must
    // plan them over a single shuffle + sort — the property that makes
    // sessionizing 100 TB a one-exchange operator.
    assert(count("Exchange hashpartitioning") == 1, s"plan:\n$plan")
    assert(count("\\[Sort ") + count("\\bSort \\[") <= 2, s"plan:\n$plan")
  }

  test("session_window sessionizes a stream incrementally under a watermark") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(5)), (3L, 1L, ts(25)), (4L, 2L, ts(1))
    ).toDF("event_id", "user_id", "ts")
      .write.parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP")
      .parquet(s"$tmp/src")
      .withWatermark("ts", "1 minute")
    val q = Sessionize.sessionWindowAgg(stream, "user_id", "ts", 600)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    // user 1 → sessions {0,5} and {25}; user 2 → {1}
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }
}
