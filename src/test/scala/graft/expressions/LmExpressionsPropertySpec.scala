package graft.expressions

import graft.SparkSuite
import graft.text.{LmScore, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property-based fuzz of the round-7 map-side collapse expressions against
 * their relational reference formulations, on adversarial token streams
 * (tiny alphabet → heavy duplication; empty/whitespace/one-token docs):
 *
 *  - `bigram_counts` exploded + summed ≡ `bigramsOf` exploded + counted
 *    (the training-aggregation rewrite's exact contract), and
 *  - the fused NB evidence sums (`nb_sum_log` via NaiveBayes) stay
 *    bit-identical to the explode + broadcast-join formulation — already
 *    pinned on real data in NaiveBayesSpec; here the corpus is generated
 *    to maximize within-doc token repetition, the case the collapse
 *    actually rewrites.
 */
class LmExpressionsPropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // tiny alphabet (plus a token containing regex metachars and a unicode
  // token) so duplicate bigrams are the COMMON case, not the corner
  private val word: Gen[String] =
    Gen.oneOf("a", "b", "c", "ab", "the", "x.y*", "naïve")
  private val doc: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
  } yield ws.mkString(sep)

  test("bigram_counts ≡ bigramsOf: per-corpus totals match on fuzzed docs") {
    val s = spark
    import s.implicits._
    val docs = samples(doc, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    val collapsed = docs
      .select(explode(LmExpressions.bigram_counts(
        TextAnalysis.tokens(col("text")))).as("e"))
      .groupBy(col("e.w1").as("w1"), col("e.w2").as("w2"))
      .agg(sum(col("e.cnt")).as("c"))
    val reference = docs
      .select(explode(LmScore.bigramsOf(TextAnalysis.tokens(col("text")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    assert(collapsed.exceptAll(reference).isEmpty &&
      reference.exceptAll(collapsed).isEmpty)
    // and per-doc: the collapsed entry counts must sum to len-1 per doc
    val perDoc = docs.select(col("id"),
        TextAnalysis.tokens(col("text")).as("t"),
        LmExpressions.bigram_counts(TextAnalysis.tokens(col("text"))).as("e"))
      .select(col("id"), size(col("t")).as("n"),
        coalesce(aggregate(col("e"), lit(0L), (a, x) => a + x.getField("cnt")),
          lit(0L)).as("total"))
      .collect()
    perDoc.foreach { r =>
      val expected = math.max(0, r.getInt(1) - 1).toLong
      assert(r.getLong(2) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("term_counts map keys/values reproduce exploded token counts on fuzzed docs") {
    val s = spark
    import s.implicits._
    val docs = samples(doc, 300).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val collapsed = docs
      .select(explode(SketchExpressions.term_counts(
        TextAnalysis.tokens(col("text")))).as(Seq("w", "c")))
      .groupBy("w").agg(sum(col("c")).as("n"))
    val reference = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    assert(collapsed.exceptAll(reference).isEmpty &&
      reference.exceptAll(collapsed).isEmpty)
  }

  test("fused NB evidence sums stay bit-identical on a repetition-heavy fuzzed corpus") {
    val s = spark
    import s.implicits._
    val langs = Seq("aa", "bb", "cc")
    val rows = samples(doc, 200).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, langs(i % langs.size))
    }.toDF("id", "text", "y")
    val classes = Seq("aa", "bb")
    val trainPred = col("id") % 2 === 0
    val fused = graft.text.NaiveBayes
      .evidenceSums(rows, "id", "text", "y", classes, trainPred)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), classes.indices.map(i => r.getDouble(2 + i)))).toMap
    // reference: explode + broadcast join + per-doc sum
    val train = rows.filter(trainPred)
    val trainTok = train.select(col("y").as("__y"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
    val counts = trainTok.groupBy("t").agg(
      sum(when(col("__y") === classes.head, 1L).otherwise(0L)).as("c0"),
      sum(when(col("__y") === classes(1), 1L).otherwise(0L)).as("c1"))
    val expect = rows.select(col("id"),
        explode_outer(TextAnalysis.tokens(col("text"))).as("t"))
      .join(broadcast(counts), Seq("t"), "left")
      .groupBy(col("id"))
      .agg(count(col("t")).as("n_tokens"),
        sum(log(coalesce(col("c0"), lit(0L)) + lit(1.0))).as("s0"),
        sum(log(coalesce(col("c1"), lit(0L)) + lit(1.0))).as("s1"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3)))).toMap
    assert(fused.keySet === expect.keySet)
    fused.foreach { case (id, (n, sums)) =>
      assert(n === expect(id)._1, s"doc $id n_tokens")
      sums.zip(expect(id)._2).foreach { case (a, b) =>
        assert(a == b, s"doc $id: $a != $b") // bit-identical, not approx
      }
    }
  }

  test("nb_sum_log skips null token-array elements (ADVICE r7: explode semantics)") {
    // the exploded reference excludes nulls twice over — count(col("t"))
    // ignores them and a null join key never matches — so the fused
    // expression must neither count a null element nor look one up (a ""
    // lookup would silently add evidence if "" is a trained token)
    val s = spark
    import s.implicits._
    val model = map_from_entries(typedLit(Seq(
      ("a", Seq(2L, 0L)), ("", Seq(5L, 7L)))).cast(
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))))))
    val df = Seq(Tuple1(1)).toDF("id").select(
      LmExpressions.nb_sum_log(
        array(lit("a"), lit(null).cast("string"), lit("a")), model, 2)
        .as("r"))
    val r = df.select(col("r.n_tokens"), col("r.sums")).head()
    assert(r.getLong(0) == 2L) // null element not counted
    val sums = r.getSeq[Double](1)
    // two "a" hits: 2·ln(3) in class 0, 0 in class 1 — NO ln(6)/ln(8)
    // contamination from the ""-keyed model entry
    assert(sums(0) == 2.0 * StrictMath.log(3.0) && sums(1) == 0.0,
      sums.mkString(","))
  }
}
