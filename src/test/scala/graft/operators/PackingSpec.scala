package graft.operators

import graft.SparkSuite
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSuite {

  private def plan(nShards: Int = 4, contextLen: Int = 100) = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packPlan(docs, "doc_id", "n_tokens",
      pmod(col("doc_id"), lit(nShards)), contextLen)
  }

  test("offsets tile each shard's stream exactly: no gaps, no overlaps") {
    val p = plan().collect().map(r =>
      (r.getAs[Long]("shard"), r.getAs[Long]("offset"), r.getAs[Long]("n_tokens")))
    p.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var expected = 0L
      sorted.foreach { case (_, off, tok) =>
        assert(off == expected, s"gap/overlap at offset $off, expected $expected")
        expected = off + tok
      }
    }
  }

  test("pack indices match the offset arithmetic and flag straddlers") {
    val rows = plan(contextLen = 100).collect()
    rows.foreach { r =>
      val off = r.getAs[Long]("offset")
      val tok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("pack_first") == off / 100)
      assert(r.getAs[Long]("pack_last") == (off + tok - 1) / 100)
    }
    // with ~100-token docs and 100-token contexts, straddlers must exist
    assert(rows.exists(r => r.getAs[Long]("pack_last") > r.getAs[Long]("pack_first")))
  }

  test("the layout is reproducible and append-stable within untouched shards") {
    val a = plan().select("doc_id", "shard", "offset")
    val b = plan().select("doc_id", "shard", "offset")
    assert(a.exceptAll(b).isEmpty)
  }

  test("zero-token docs never straddle; corrupt token counts fail loudly") {
    import spark.implicits._
    // r12 review: the raw pack_last formula gave floor((offset−1)/ctx) for
    // an empty doc — pack_last < pack_first, a phantom straddle
    val docs = Seq((1L, 50L), (2L, 0L), (3L, 70L)).toDF("doc_id", "n_tokens")
    val p = Packing.packPlan(docs, "doc_id", "n_tokens", lit(0L), 100)
      .collect()
    p.foreach { r =>
      assert(r.getAs[Long]("pack_last") >= r.getAs[Long]("pack_first"),
        r.toString)
    }
    val empty = p.find(_.getAs[Long]("doc_id") == 2L).get
    assert(empty.getAs[Long]("pack_last") == empty.getAs[Long]("pack_first"))
    // a negative count would silently corrupt every later offset in the
    // shard — the guard must kill the job with the offending value
    val bad = Seq((1L, 10L), (2L, -5L)).toDF("doc_id", "n_tokens")
    val e = intercept[Throwable] {
      Packing.packPlan(bad, "doc_id", "n_tokens", lit(0L), 100).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-negative")), e.toString)
  }
}
