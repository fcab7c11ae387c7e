package graft.streaming

import graft.SparkSuite
import graft.model.LogisticsEvent
import java.nio.file.Files

class StatefulOpsV2Spec extends SparkSuite {

  private def ev(id: Int, order: String, minute: Int, status: String) =
    LogisticsEvent(
      Some(f"e$id%03d"), Some(order),
      Some(f"2026-02-23T01:$minute%02d:00+00:00"), Some(status),
      Some("A, AA"), Some("B, BB"), Some("DHL"),
      Some(10.0), Some(20.0), Some(5.5), Some("2026-03-01"))

  // batch 1: o1 created+moving, o2 created; batch 2: o1 again SAME status
  // (unchanged flag must be false), o2 delivered (changed)
  private def batch1 = Seq(
    ev(1, "o1", 1, "Created"), ev(2, "o1", 5, "In Transit"),
    ev(3, "o2", 2, "Created"))
  private def batch2 = Seq(ev(4, "o1", 9, "In Transit"), ev(5, "o2", 11, "Delivered"))

  private def runStreamed(name: String,
      progress: org.apache.spark.sql.Dataset[LogisticsEvent] =>
        org.apache.spark.sql.Dataset[OrderUpdate]): Seq[OrderUpdate] = {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory(s"graft-$name").toString
    val srcDir = s"$tmp/landing"; new java.io.File(srcDir).mkdirs()
    def writeFile(fname: String, events: Seq[LogisticsEvent]): Unit = {
      val stage = Files.createTempDirectory(s"graft-$name-stage").toString
      spark.createDataFrame(events).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new java.io.File(s"$srcDir/$fname").toPath)
    }
    writeFile("b1.parquet", batch1)
    writeFile("b2.parquet", batch2)
    val stream = spark.readStream.schema(LogisticsEvent.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir).as[LogisticsEvent]
    val q = progress(stream)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name).as[OrderUpdate].collect().toSeq
  }

  test("transformWithState: state carries across micro-batches, TTL-backed RocksDB store") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val v2 = runStreamed("tws_v2", StatefulOpsV2.orderProgress)
      // per (order, batch): o1 b1 (2 ev, changed), o2 b1 (1 ev, changed),
      // o1 b2 (3 ev, UNCHANGED status), o2 b2 (2 ev, changed)
      val byKey = v2.groupBy(_.order_id)
      assert(byKey("o1").map(u => (u.n_events, u.status, u.status_changed)).toSet
        === Set((2L, "In Transit", true), (3L, "In Transit", false)))
      assert(byKey("o2").map(u => (u.n_events, u.status, u.status_changed)).toSet
        === Set((1L, "Created", true), (2L, "Delivered", true)))

      // v2 ≡ v1 on the identical scenario (both fold via StatefulOps.advance)
      val v1 = runStreamed("tws_v1", StatefulOps.orderProgress)
      assert(v2.toSet === v1.toSet)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
