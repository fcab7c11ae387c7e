package graft.streaming

import graft.SparkSuite
import java.nio.file.Files
import java.sql.Timestamp

class StreamJoinsSpec extends SparkSuite {

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-02-23 01:$minute%02d:00")

  // deliveries (left) should pick up the order-created events (right) for
  // the same user within the preceding 5 minutes
  private def leftRows = Seq(
    (1L, ts(10), "delivered"),
    (2L, ts(20), "delivered"),
    (3L, ts(30), "delivered"))
  private def rightRows = Seq(
    (1L, ts(7), "created"),    // in window (3 min before)
    (1L, ts(10), "created"),   // in window (same instant)
    (2L, ts(14), "created"),   // OUT: 6 min before
    (2L, ts(21), "created"),   // OUT: after the delivery
    (3L, ts(25), "created"))   // in window (exactly 5 min before)

  private def expected = Set((1L, 10, 7), (1L, 10, 10), (3L, 30, 25))

  private def toPairs(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0),
      r.getTimestamp(1).toLocalDateTime.getMinute,
      r.getTimestamp(3).toLocalDateTime.getMinute)).toSet

  test("batch mode: interval condition keeps exactly the in-window pairs") {
    val s = spark
    import s.implicits._
    val out = StreamJoins.intervalJoin(
      leftRows.toDF("user_id", "ts", "kind"),
      rightRows.toDF("user_id", "ts", "kind"),
      "user_id", "ts", "ts", maxSpanSeconds = 300)
    assert(out.columns.toSeq ===
      Seq("user_id", "ts", "kind", "ts_r", "kind_r"))
    assert(toPairs(out.select("user_id", "ts", "kind", "ts_r").collect())
      === expected)
  }

  test("streamed two-sided join matches the static result across micro-batches") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    val lDir = s"$tmp/left"; val rDir = s"$tmp/right"

    def write(dir: String, name: String,
              rows: Seq[(Long, Timestamp, String)]): Unit = {
      val stage = Files.createTempDirectory("graft-ssjoin-stage").toString
      rows.toDF("user_id", "ts", "kind").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      new java.io.File(dir).mkdirs()
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$dir/$name").toPath)
    }
    // split each side over two files → multiple micro-batches; the cross-
    // batch pair (user 3: right arrives in a later batch than nothing —
    // left 30 in file 2, right 25 in file 1) must still join via state
    write(lDir, "b1.parquet", leftRows.take(2))
    write(lDir, "b2.parquet", leftRows.drop(2))
    write(rDir, "b1.parquet", rightRows.take(3))
    write(rDir, "b2.parquet", rightRows.drop(3))

    val schema = leftRows.toDF("user_id", "ts", "kind").schema
    def stream(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val q = StreamJoins.intervalJoin(stream(lDir), stream(rDir),
        "user_id", "ts", "ts", maxSpanSeconds = 300)
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    assert(toPairs(spark.table("ssjoin")
      .select("user_id", "ts", "kind", "ts_r").collect()) === expected)
  }

  test("suffix collisions are rejected loudly, not emitted as duplicate columns") {
    val s = spark
    import s.implicits._
    // chaining shape: the left already carries kind_r from a previous join
    val chained = leftRows.toDF("user_id", "ts", "kind")
      .withColumn("kind_r", org.apache.spark.sql.functions.lit("prev"))
    val e = intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(chained, rightRows.toDF("user_id", "ts", "kind"),
        "user_id", "ts", "ts", maxSpanSeconds = 300)
    }
    assert(e.getMessage.contains("kind_r"))
    // right side holding both x and x_r collides with itself
    val e2 = intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(leftRows.toDF("user_id", "ts", "kind"),
        rightRows.toDF("user_id", "ts", "kind")
          .withColumn("ts_r", org.apache.spark.sql.functions.lit(0)),
        "user_id", "ts", "ts", maxSpanSeconds = 300)
    }
    assert(e2.getMessage.contains("ts_r"))
  }
}
