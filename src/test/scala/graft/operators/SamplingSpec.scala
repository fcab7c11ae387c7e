package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("sample rate lands near the requested fraction and is reproducible") {
    val n = docs.count()
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2)
    val b = Sampling.deterministicSample(docs, "doc_id", 0.2)
    val rate = a.count().toDouble / n
    assert(rate > 0.1 && rate < 0.3, s"rate $rate")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).isEmpty)
  }

  test("thresholded samples nest: the 5% sample is a subset of the 20% sample") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.05).select("doc_id")
    val big = Sampling.deterministicSample(docs, "doc_id", 0.20).select("doc_id")
    assert(small.exceptAll(big).isEmpty)
    assert(small.count() < big.count())
  }

  test("different salts decorrelate selections") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2, salt = "a").select("doc_id")
    val b = Sampling.deterministicSample(docs, "doc_id", 0.2, salt = "b").select("doc_id")
    assert(a.exceptAll(b).count() > 0)
  }

  test("split is disjoint, exhaustive, and row-stable under appends") {
    val n = docs.count()
    val split = Sampling.withSplit(docs, "doc_id")
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    assert(counts("train") > counts.getOrElse("valid", 0L))
    // appending rows must not move existing rows between splits: the
    // assignment depends only on the row's own key
    val half = docs.filter(col("doc_id") % 2 === 0)
    val fromHalf = Sampling.withSplit(half, "doc_id").select("doc_id", "split")
    val fromFull = split.select("doc_id", "split")
      .filter(col("doc_id") % 2 === 0)
    assert(fromHalf.exceptAll(fromFull).isEmpty)
  }

  test("per-group cap keeps at most cap rows per group, deterministically") {
    val capped = Sampling.capPerGroup(docs, "doc_id", "source", cap = 5)
    val sizes = capped.groupBy("source").count()
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 5))
    assert(sizes.exists(_ == 5), "some source should hit the cap")
    // deterministic: a second run selects the same rows
    val again = Sampling.capPerGroup(docs, "doc_id", "source", cap = 5)
    assert(capped.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
    // capping is a subset of the input
    assert(capped.count() <= docs.count())
  }

  test("token budget admits exactly the hash-order prefix with pre-sum under budget") {
    val withTok = docs.withColumn("n_tok",
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
    val budget = 200L
    val kept = Sampling.tokenBudgetPerGroup(withTok, "doc_id", "source", "n_tok", budget)

    // Reference semantics recomputed independently: walk each group in
    // (hexBucket, doc_id) order, admit while the running pre-sum < budget.
    val all = withTok.select(col("source"), col("doc_id"), col("n_tok"),
        Sampling.hexBucket(col("doc_id")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = all.groupBy(_._1).values.flatMap { rs =>
      var acc = 0L
      rs.sortBy(r => (r._4, r._2)).flatMap { r =>
        val keep = acc < budget; acc += r._3
        if (keep) Some(r._2) else None
      }
    }.toSet
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // every non-empty group contributes at least one document
    assert(kept.select("source").distinct().count() ==
      docs.select("source").distinct().count())
  }

  test("token budget: skew-bucketed pre-cap selects the identical rows") {
    val withTok = docs.withColumn("n_tok",
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
    val plain = Sampling.tokenBudgetPerGroup(withTok, "doc_id", "source", "n_tok", 150L)
    val salted = Sampling.tokenBudgetPerGroup(withTok, "doc_id", "source", "n_tok", 150L,
      skewBuckets = 3)
    assert(plain.select("doc_id").exceptAll(salted.select("doc_id")).isEmpty)
    assert(salted.select("doc_id").exceptAll(plain.select("doc_id")).isEmpty)
  }

  test("stratified fractions apply per stratum") {
    val byLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 1.0, "es" -> 0.0))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.getOrElse("en", 0L) == byLang("en"))   // keep-all stratum
    assert(!sampled.contains("es"))                       // keep-none stratum
    assert(sampled.keySet subsetOf Set("en"))             // absent strata drop
  }
}
