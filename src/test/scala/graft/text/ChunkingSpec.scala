package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def chunks(text: String, size: Int, stride: Int): Seq[(Int, String, Int)] =
    Chunking.chunkByTokens(Seq((1L, text)).toDF("id", "text"), "id", "text", size, stride)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq

  test("exact boundaries: size 4, stride 2 over 10 tokens") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = chunks(text, size = 4, stride = 2)
    assert(got === Seq(
      (1, "t1 t2 t3 t4", 4),
      (2, "t3 t4 t5 t6", 4),
      (3, "t5 t6 t7 t8", 4),
      (4, "t7 t8 t9 t10", 4)))
  }

  test("trailing partial window; no window starts past the end") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val got = chunks(text, size = 4, stride = 3)
    assert(got === Seq(
      (1, "t1 t2 t3 t4", 4),
      (2, "t4 t5 t6 t7", 4),
      (3, "t7 t8 t9", 3)))
  }

  test("short docs emit exactly one window") {
    assert(chunks("only three tokens", 128, 64) ===
      Seq((1, "only three tokens", 3)))
  }

  test("stride == size means disjoint cover with no overlap") {
    val text = (1 to 6).map(i => s"t$i").mkString(" ")
    val got = chunks(text, size = 3, stride = 3)
    assert(got.map(_._2) === Seq("t1 t2 t3", "t4 t5 t6"))
    // every token appears exactly once
    assert(got.flatMap(_._2.split(" ")).length === 6)
  }

  test("every token is covered at any stride") {
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val covered = chunks(text, size = 7, stride = 5).flatMap(_._2.split(" ")).toSet
    assert(covered === (1 to 23).map(i => s"t$i").toSet)
  }

  test("null/empty/blank documents emit zero chunks, not a phantom row") {
    val s = spark
    import s.implicits._
    val df = Seq[(Long, Option[String])](
      (1L, Some("one two three")), (2L, Some("")), (3L, None), (4L, Some("   ")))
      .toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", chunkSize = 2, stride = 2)
    assert(out.select("doc_id").distinct().as[Long].collect().toSet === Set(1L))
  }
}
