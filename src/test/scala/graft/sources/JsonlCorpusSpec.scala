package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class JsonlCorpusSpec extends SparkSuite {
  import spark.implicits._

  private val nasty = Seq(
    (1L, "plain text", "en"),
    (2L, "embedded \"quotes\" and \\backslash\\", "en"),
    (3L, "newline\nand\ttab inside", "de"),
    (4L, "unicode: café 中文 😀", "zh"),
    (5L, null.asInstanceOf[String], "fr"))

  test("gzipped file roundtrip is lossless, including pathological strings") {
    val df = nasty.toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonlCorpus.writeJsonl(df, dir, shards = 3)
    // gzip shards actually on disk
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.count(_.endsWith(".json.gz")) === 3)
    val back = JsonlCorpus.readJsonl(spark, dir, df.schema)
    val orig = df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    val got = back.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got === orig)
  }

  test("in-plan roundTrip is the identity on the projected columns") {
    val df = nasty.toDF("doc_id", "text", "lang")
    val rt = JsonlCorpus.roundTrip(df, Seq("doc_id", "text", "lang"))
    // from_json makes every field nullable — names and types must survive
    assert(rt.schema.map(f => (f.name, f.dataType)) ===
      df.select("doc_id", "text", "lang").schema.map(f => (f.name, f.dataType)))
    val orig = df.collect().map(_.toSeq).toSet
    assert(rt.collect().map(_.toSeq).toSet === orig)
  }

  test("strict read fails loudly on a corrupt dump") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlbad").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"doc_id\": 1, \"text\": \"ok\"}\nnot json at all\n".getBytes("UTF-8"))
    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    val strict = JsonlCorpus.readJsonl(spark, dir, schema, strict = true)
    intercept[org.apache.spark.SparkException](strict.collect())
    // permissive mode surfaces the bad line as nulls instead
    val loose = JsonlCorpus.readJsonl(spark, dir, schema, strict = false)
    assert(loose.count() === 2)
  }
}
