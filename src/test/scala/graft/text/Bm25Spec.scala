package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSuite {

  private def scored(rows: Seq[(Long, String)], terms: Seq[String]) = {
    import spark.implicits._
    Bm25.scoreAgainstTerms(rows.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("tf monotonicity: more query-term occurrences at equal length score higher") {
    val s = scored(Seq(
      1L -> "spark pad pad pad pad pad",
      2L -> "spark spark pad pad pad pad",
      3L -> "pad pad pad pad pad pad"), Seq("spark"))
    assert(s(2L)._2 > s(1L)._2)
    assert(s(1L)._2 > 0.0)
    assert(s(3L) == (0L, 0.0)) // no match → zero score, zero matched terms
  }

  test("idf: a rarer term outweighs a common one at equal tf and length") {
    // "common" appears in 3 of 4 docs, "rare" in 1 of 4
    val s = scored(Seq(
      1L -> "common pad pad",
      2L -> "common pad pad",
      3L -> "common pad pad",
      4L -> "rare pad pad"), Seq("common", "rare"))
    assert(s(4L)._2 > s(1L)._2)
    assert(s(1L)._1 == 1L && s(4L)._1 == 1L)
  }

  test("length normalization: the same tf in a longer document scores lower") {
    val s = scored(Seq(
      1L -> "spark pad",
      2L -> "spark pad pad pad pad pad pad pad pad pad"), Seq("spark"))
    assert(s(1L)._2 > s(2L)._2)
  }

  test("matching is on lower-cased tokens and counts matched terms") {
    val s = scored(Seq(
      1L -> "SPARK Vector pad",
      2L -> "pad pad pad"), Seq("spark", "vector", "absent"))
    assert(s(1L)._1 == 2L)
    assert(s(2L)._1 == 0L)
  }

  test("deterministic: two runs produce identical scores on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bm25.scoreAgainstTerms(docs, "doc_id", "text", Seq("spark", "customer"))
    val b = Bm25.scoreAgainstTerms(docs, "doc_id", "text", Seq("spark", "customer"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // scoring never changes the row count — one output row per document
    assert(a.count() == docs.count())
  }

  test("plan shape: scoring is narrow — no shuffle between scan and score") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = Bm25.scoreAgainstTerms(docs, "doc_id", "text", Seq("spark"))
    val plan = df.queryExecution.executedPlan
    // the main (non-subquery) plan must be exchange-free: stats ride as a
    // scalar subquery, tf/score are per-row expressions
    def hasExchange(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange] ||
        p.children.exists(hasExchange)
    assert(!hasExchange(plan), plan.toString)
  }
}
