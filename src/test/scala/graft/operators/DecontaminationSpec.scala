package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSuite {

  private def corpus(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("contamination report counts shared distinct shingles per train doc") {
    val evalSet = corpus(100L -> "the quick brown fox jumps over the lazy dog")
    val train = corpus(
      1L -> "the quick brown fox jumps high", // shares a 3-gram prefix
      2L -> "completely different words entirely here now")
    val r = Decontamination
      .contaminationReport(train, evalSet, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    // doc 1: shingles {the quick brown, quick brown fox, brown fox jumps,
    //   fox jumps high} — first three occur in the eval doc
    assert(r(0).getAs[Long]("n_shingles") == 4)
    assert(r(0).getAs[Long]("n_overlap") == 3)
    assert(r(0).getAs[Double]("contamination") == 0.75)
    assert(r(1).getAs[Long]("n_overlap") == 0)
    assert(r(1).getAs[Double]("contamination") == 0.0)
  }

  test("bloom-pre-filtered report is row-identical to the exact report") {
    // real corpus: the driver's documents table, split like the driver query
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val split = Sampling.withSplit(docs, "doc_id")
    val train = split.filter(col("split") === "train")
    val eval_ = split.filter(col("split") === "test")
    val exact = Decontamination
      .contaminationReport(train, eval_, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect().toSeq
    // tight filter (honest fpp) and an undersized, high-fpp filter: false
    // positives must die in the exact join either way
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = Decontamination
        .contaminationReportBloom(train, eval_, "doc_id", "text", k = 3,
          expectedEvalShingles = 1L << 12, fpp = fpp)
        .orderBy("doc_id").collect().toSeq
      assert(bloom == exact, s"fpp=$fpp")
    }
  }

  test("bloom probe never false-negatives and prunes non-members") {
    val evalSet = corpus(100L -> "alpha beta gamma delta epsilon")
    val train = corpus(
      1L -> "alpha beta gamma other words here",
      2L -> "nothing shared with that corpus at all truly")
    val r = Decontamination
      .contaminationReportBloom(train, evalSet, "doc_id", "text", k = 3,
        expectedEvalShingles = 1024, fpp = 0.001)
      .orderBy("doc_id").collect()
    // doc 1 shares exactly "alpha beta gamma"; doc 2 shares nothing
    assert(r(0).getAs[Long]("n_overlap") == 1)
    assert(r(1).getAs[Long]("n_overlap") == 0)
  }

  test("contaminatedIds returns only docs above the threshold") {
    val evalSet = corpus(100L -> "alpha beta gamma delta epsilon")
    val train = corpus(
      1L -> "alpha beta gamma delta epsilon",    // full copy → contamination 1.0
      2L -> "alpha beta gamma something else",   // partial
      3L -> "unrelated text with no overlap at all")
    val ids = Decontamination
      .contaminatedIds(train, evalSet, "doc_id", "text", k = 3,
        maxContamination = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("duplicate shingles within one doc count once (distinct semantics)") {
    val evalSet = corpus(100L -> "x y z")
    val train = corpus(1L -> "x y z x y z x y z")
    val r = Decontamination
      .contaminationReport(train, evalSet, "doc_id", "text", k = 3).head()
    // doc repeats "x y z" but shingleRows is distinct-per-doc
    val n = r.getAs[Long]("n_shingles")
    val o = r.getAs[Long]("n_overlap")
    assert(o >= 1 && o <= n)
    assert(r.getAs[Double]("contamination") == o.toDouble / n)
  }
}
