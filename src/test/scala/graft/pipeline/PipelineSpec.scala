package graft.pipeline

import graft.SparkSuite
import graft.model.LogisticsEvent
import graft.quality.DqChecks
import java.nio.file.Files

/** Full-DAG drive: landing files → stream drain → load → DQ gate → models → tests. */
class PipelineSpec extends SparkSuite {

  private def ev(id: Int): LogisticsEvent = LogisticsEvent(
    Some(s"e$id"), Some(s"o${id % 5}"),
    Some(f"2026-02-23T01:${id % 60}%02d:00+00:00"), Some("Delivered"),
    Some("A, AA"), Some("B, BB"), Some("FedEx"),
    Some(10.0), Some(20.0), Some(5.5), Some("2026-03-01"))

  private def writeBatchFile(events: Seq[LogisticsEvent], destFile: String): Unit = {
    val tmp = Files.createTempDirectory("graft-pbatch").toString
    spark.createDataFrame(events).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(destFile)
    dest.getParentFile.mkdirs()
    Files.move(part.toPath, dest.toPath)
  }

  test("full pipeline run: ingest → load → gate → models → tests → serving SQL") {
    val tmp = Files.createTempDirectory("graft-pipe").toString
    writeBatchFile((1 to 60).map(ev), s"$tmp/landing/b1.parquet")

    val r = Pipeline.run(spark, s"$tmp/landing", s"$tmp/bronze",
      s"$tmp/ckpt", s"$tmp/raw")
    assert(r.newRawRows == 60)
    assert(r.dqResults.forall(c => c.severity != "ERROR" || c.violations == 0))
    assert(r.warehouse.factEvent.count() == 60)
    assert(r.testsPassed, s"failing: ${r.testResults.filterNot(_.passed)}")

    // serving path: registered views answer SQL (§3.3)
    val n = Pipeline.query(spark,
      "SELECT count(*) AS n FROM fact_event").head().getLong(0)
    assert(n == 60)

    // second run with one new batch + replayed events: only new rows load
    writeBatchFile((55 to 70).map(ev), s"$tmp/landing/b2.parquet")
    val r2 = Pipeline.run(spark, s"$tmp/landing", s"$tmp/bronze",
      s"$tmp/ckpt", s"$tmp/raw")
    assert(r2.newRawRows == 10)   // 55-60 deduped by the anti-join
  }

  test("serve stage: dashboards attach over the wire, read-only enforced") {
    import graft.serve.ConnectServe
    val tmp = Files.createTempDirectory("graft-pipe3").toString
    writeBatchFile((1 to 40).map(ev), s"$tmp/landing/b1.parquet")
    val r = Pipeline.run(spark, s"$tmp/landing", s"$tmp/bronze",
      s"$tmp/ckpt", s"$tmp/raw")

    // a fresh port: this JVM's ConnectServeSpec may have served (and
    // stopped) the default one — the serve stage must work on either
    val port = ConnectServe.DefaultPort + 2
    Pipeline.serve(spark, r.warehouse, port)
    try {
      val (cols, rows) = ConnectServe.withConnection(port) { conn =>
        ConnectServe.querySeq(conn,
          "SELECT total_events FROM global_temp.dash_headline_kpis")
      }
      assert(cols == Seq("total_events") && rows == Seq(Seq("40")))
      // the reference's read_only=True contract holds at the DAG level too
      val denied = intercept[Exception] {
        ConnectServe.withConnection(port) { conn =>
          val st = conn.createStatement()
          try st.execute("DROP VIEW global_temp.dash_headline_kpis")
          finally st.close()
        }
      }
      assert(denied.getMessage.contains("read-only"))
    } finally ConnectServe.stop()
  }

  test("DQ gate halts the pipeline on ERROR-severity violations") {
    val tmp = Files.createTempDirectory("graft-pipe2").toString
    writeBatchFile(Seq(ev(1), ev(2).copy(weight_kg = Some(-1.0))),
      s"$tmp/landing/bad.parquet")
    intercept[DqChecks.DqGateFailure] {
      Pipeline.run(spark, s"$tmp/landing", s"$tmp/bronze",
        s"$tmp/ckpt", s"$tmp/raw")
    }
  }
}
