package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FileGlobSpec extends SparkSuite {

  test("lists the testdata corpus: 10 named non-empty parquet files") {
    val out = FileGlob.listGlob(spark, "/root/testdata/sf0.001/*.parquet")
      .orderBy("name").collect()
    assert(out.map(_.getAs[String]("name")).toSeq === Seq(
      "customer.parquet", "documents.parquet", "embeddings.parquet",
      "events.parquet", "lineitem.parquet", "nation.parquet",
      "orders.parquet", "part.parquet", "region.parquet",
      "supplier.parquet"))
    assert(out.forall(_.getAs[Long]("size_bytes") > 0))
    assert(out.forall(r =>
      r.getAs[String]("path").endsWith("/" + r.getAs[String]("name"))))
  }

  test("no match yields an empty frame with the full schema, not a failure") {
    val out = FileGlob.listGlob(spark, "/root/testdata/sf0.001/*.orc")
    assert(out.count() === 0)
    assert(out.columns.toSeq ===
      Seq("path", "name", "is_dir", "size_bytes", "mod_time"))
    // the did-anything-land gate composes as a relation
    val summary = FileGlob.globSummary(spark, "/root/testdata/sf0.001/*.orc")
      .collect().head
    assert(summary.getLong(0) === 0L && summary.getLong(1) === 0L)
  }

  test("directory datasets count as landed, with their recursive content size") {
    // Spark-written parquet names *.parquet entries as DIRECTORIES of part
    // files — the gate must report them as landed data, not skip them
    val tmp = Files.createTempDirectory("graft-glob")
    try {
      val dir = Files.createDirectory(tmp.resolve("table.parquet"))
      Files.write(dir.resolve("part-00000"), Array[Byte](1, 2, 3, 4))
      Files.write(dir.resolve("part-00001"), Array[Byte](5))
      Files.write(tmp.resolve("a.parquet"), Array[Byte](1, 2, 3))
      Files.write(tmp.resolve("b.parquet"), Array.emptyByteArray)
      val out = FileGlob.listGlob(spark, s"$tmp/*.parquet")
        .orderBy("name").collect()
      assert(out.map(r => (r.getAs[String]("name"), r.getAs[Boolean]("is_dir"),
        r.getAs[Long]("size_bytes"))).toSeq === Seq(
        ("a.parquet", false, 3L),
        ("b.parquet", false, 0L),
        ("table.parquet", true, 5L)))
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("the listing is lazy and re-executes per action (a polling gate sees fresh state)") {
    val tmp = Files.createTempDirectory("graft-glob-lazy")
    try {
      // shuffle-free frame: every action re-runs the listing task
      val listing = FileGlob.listGlob(spark, s"$tmp/*.parquet")
      assert(listing.count() === 0L)
      Files.write(tmp.resolve("late.parquet"), Array[Byte](9))
      assert(listing.collect().length === 1)
      // an AGGREGATED gate re-collected on the SAME Dataset object reuses
      // its computed shuffle map stage (standard Spark stage reuse) — a
      // polling gate must rebuild the frame per poll, as documented
      val fresh = FileGlob.globSummary(spark, s"$tmp/*.parquet")
      assert(fresh.collect().head.getLong(0) === 1L)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("globSummary reproduces the reference's count-before-read numbers") {
    val s = FileGlob.globSummary(spark, "/root/testdata/sf0.001/*.parquet")
      .collect().head
    assert(s.getLong(0) === 10L)
    assert(s.getLong(1) > 0L)
  }
}
