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
    assert(out.columns.toSeq === Seq("path", "name", "size_bytes", "mod_time"))
    // the did-anything-land gate composes as a relation
    val summary = FileGlob.globSummary(spark, "/root/testdata/sf0.001/*.orc")
      .collect().head
    assert(summary.getLong(0) === 0L && summary.getLong(1) === 0L)
  }

  test("directories are excluded: the gate counts files to read") {
    val tmp = Files.createTempDirectory("graft-glob")
    Files.createDirectory(tmp.resolve("sub.parquet")) // dir matching the glob
    Files.write(tmp.resolve("a.parquet"), Array[Byte](1, 2, 3))
    Files.write(tmp.resolve("b.parquet"), Array.emptyByteArray)
    val out = FileGlob.listGlob(spark, s"$tmp/*.parquet").orderBy("name").collect()
    assert(out.map(_.getAs[String]("name")).toSeq === Seq("a.parquet", "b.parquet"))
    assert(out.map(_.getAs[Long]("size_bytes")).toSeq === Seq(3L, 0L))
  }

  test("globSummary reproduces the reference's count-before-read numbers") {
    val s = FileGlob.globSummary(spark, "/root/testdata/sf0.001/*.parquet")
      .collect().head
    assert(s.getLong(0) === 10L)
    assert(s.getLong(1) > 0L)
  }
}
