package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorQuantizationSpec extends SparkSuite {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("codes stay in [-127, 127] and reconstruction error is within scale/2") {
    val df = vecs(
      1L -> Seq(0.5f, -1.0f, 0.25f, 0.0f),
      2L -> Seq(100.0f, -50.0f, 3.0f, 0.1f))
    val r = VectorQuantization.maxAbsError(df, "embedding")
      .orderBy("vec_id").collect()
    r.foreach { row =>
      val scale = row.getAs[Double]("scale")
      val q = row.getAs[scala.collection.Seq[Byte]]("qvec")
      assert(q.forall(c => c >= -127 && c <= 127))
      // half-a-code-step bound, with float→double slack
      assert(row.getAs[Double]("max_abs_err") <= scale / 2 + 1e-6)
    }
    // the max-|x| element always maps to ±127 exactly
    assert(r(0).getAs[scala.collection.Seq[Byte]]("qvec")(1) == -127)
    assert(r(1).getAs[scala.collection.Seq[Byte]]("qvec")(0) == 127)
  }

  test("all-zero vectors quantize to all-zero codes with scale 1") {
    val r = VectorQuantization.quantizeInt8(vecs(1L -> Seq(0.0f, 0.0f, 0.0f)), "embedding").head()
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getAs[scala.collection.Seq[Byte]]("qvec").forall(_ == 0))
  }

  test("dequantize reproduces the dominant component to code precision") {
    val df = VectorQuantization.quantizeInt8(vecs(1L -> Seq(1.27f, -0.635f)), "embedding")
      .withColumn("deq", VectorQuantization.dequantize(col("qvec"), col("scale")))
    val deq = df.head().getAs[scala.collection.Seq[Double]]("deq")
    assert(math.abs(deq(0) - 1.27) < 0.01)
    assert(math.abs(deq(1) + 0.635) < 0.01)
  }

  test("exact top-k over the quantized corpus matches the full-precision top-k") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = base.orderBy("vec_id").limit(5)
    val quantized = VectorQuantization.quantizeInt8(base, "embedding")
      .select(col("vec_id"),
        VectorQuantization.dequantize(col("qvec"), col("scale")).as("embedding"))
    def topk(corpus: org.apache.spark.sql.DataFrame) = SimilaritySearch
      .bruteForceTopK(corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id")
    val full = topk(base).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = topk(quantized).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // int8 codes keep ~7 bits of mantissa — ranks are stable except for
    // near-ties; demand ≥80% agreement on 25 (query, neighbor) pairs
    val overlap = full.intersect(quant).size.toDouble / full.size
    assert(overlap >= 0.8, s"quantized recall $overlap")
  }

  test("quantization is deterministic across runs") {
    val base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = VectorQuantization.quantizeInt8(base, "embedding").select("vec_id", "qvec")
    val b = VectorQuantization.quantizeInt8(base, "embedding").select("vec_id", "qvec")
    assert(a.exceptAll(b).isEmpty)
  }

  test("output-name guard: an input scale/qvec/max_abs_err is rejected loudly") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, Seq(0.5f), 2.0)).toDF("vec_id", "embedding", "scale")
    val e = intercept[IllegalArgumentException](
      VectorQuantization.quantizeInt8(bad, "embedding"))
    assert(e.getMessage.contains("scale"), e.getMessage)
    val bad2 = Seq((1L, Seq(0.5f), 0.1)).toDF("vec_id", "embedding", "max_abs_err")
    val e2 = intercept[IllegalArgumentException](
      VectorQuantization.maxAbsError(bad2, "embedding"))
    assert(e2.getMessage.contains("max_abs_err"), e2.getMessage)
  }
}
