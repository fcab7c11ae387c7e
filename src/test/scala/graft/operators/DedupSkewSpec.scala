package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * Planted-skew behavior of the first-occurrence paths (round-5 scale-proof):
 * one fingerprint / one domain owning 20% of all rows — the mega-duplicate
 * shape (empty pages, placeholder boilerplate, a crawl-hub domain) that
 * serializes window-partitioned plans into a single straggler task.
 */
class DedupSkewSpec extends SparkSuite {

  // 10k rows; ids 0..1999 all carry the SAME text (one fingerprint = 20%),
  // the rest unique. Spread over many input partitions so map-side collapse
  // is observable.
  private lazy val skewed = {
    val s = spark
    import s.implicits._
    (0L until 10000L).map { i =>
      val text = if (i < 2000L) "the mega duplicate placeholder page"
                 else s"unique document number $i with its own words"
      val domain = if (i % 5 == 0) "hot.example" else s"site${i % 97}.example"
      (i, text, domain)
    }.toDF("doc_id", "text", "domain").repartition(16)
  }

  test("exactDedup collapses a 20% mega-fingerprint with an aggregate, not a window") {
    val out = Dedup.exactDedup(skewed, "doc_id", "text")
    // correctness: one survivor per distinct text, lowest id, full row kept
    assert(out.count() == 8001L) // 8000 unique + 1 keeper for the mega-dup
    val keeper = out.filter(col("text") === "the mega duplicate placeholder page")
      .collect()
    assert(keeper.length == 1 && keeper.head.getAs[Long]("doc_id") == 0L)
    assert(keeper.head.getAs[String]("domain") == "hot.example")
    assert(out.columns.toSeq == Seq("doc_id", "text", "domain"))
    // plan shape: no Window anywhere; a partial aggregate below the
    // exchange collapses the hot fingerprint map-side, so the shuffle
    // carries O(#partitions) rows for it, not O(#copies)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in exactDedup plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("Partial"),
      s"no partial aggregate in exactDedup plan:\n$plan")
  }

  test("capPerGroup skew mode keeps the identical set and bounds the hot-group partition") {
    val single = Sampling.capPerGroup(skewed, "doc_id", "domain", cap = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val salted = Sampling.capPerGroup(skewed, "doc_id", "domain", cap = 10,
        skewBuckets = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted == single) // per-bucket top-cap union contains the global top-cap
    // load bound: the hot domain (2000 rows) splits across the 16 salt
    // buckets, so no first-level window partition carries more than a few
    // hundred rows (vs 2000 in the single-window plan)
    val maxBucket = skewed
      .withColumn("__sb", pmod(xxhash64(col("doc_id")), lit(16L)))
      .groupBy("domain", "__sb").count()
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= 400L,
      s"salt buckets failed to split the hot domain: max bucket $maxBucket")
  }

  test("exactDedup on the mega-dup matches the window formulation row-for-row") {
    val s = spark
    import s.implicits._
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      skewed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val a = Dedup.exactDedup(skewed, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = viaWindow.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
