package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.operators.Dedup
import graft.text.TextAnalysis

/** Pins [[ShinglesOfTokensExpr]] bit-identical to the declarative HOF chain
  * it replaced (r14 optimization): the DuckDB oracles replay the HOF
  * formulation in SQL, so any divergence here is an oracle mismatch waiting
  * to happen. Corner surface: short docs (< k tokens → ONE truncated
  * shingle), empty string (tokens("") = [""]), null text, duplicate
  * shingles (first-occurrence order), multi-space runs, k ∈ {1, 3, 8}. */
class ShinglesExprSpec extends SparkSuite {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two"),                       // shorter than k=3 → one truncated shingle
      (3L, "solo"),                          // single token
      (4L, ""),                              // tokens("") = [""]
      (5L, null.asInstanceOf[String]),       // null text → null tokens
      (6L, "a b a b a b a b"),               // heavy duplicate shingles
      (7L, "x  y   z    w"),                 // multi-space runs
      (8L, "p q r s t u v w x y z p q r s")  // wraps a repeat at distance > k
    ).toDF("doc_id", "text")
  }

  private def bothFormulations(k: Int) = {
    val toks = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val fast = toks.select(col("doc_id"), Dedup.shinglesOfTokens(col("toks"), k).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = toks.select(col("doc_id"), Dedup.shinglesOfTokensHof(col("toks"), k).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    (fast, hof)
  }

  for (k <- Seq(1, 3, 8)) {
    test(s"one-pass shingles ≡ HOF chain, element-for-element in order, k=$k") {
      val (fast, hof) = bothFormulations(k)
      assert(fast == hof)
    }
  }

  test("degenerate inputs produce [\"\"] like the HOF chain") {
    val (fast, hof) = bothFormulations(3)
    assert(fast(4L) == Seq(""))   // empty text
    assert(fast(5L) == Seq(""))   // null text (split → null tokens)
    assert(hof(4L) == Seq("") && hof(5L) == Seq(""))
  }

  test("short doc emits exactly one whole-text shingle") {
    val (fast, _) = bothFormulations(3)
    assert(fast(2L) == Seq("one two"))
    assert(fast(3L) == Seq("solo"))
  }

  test("duplicates collapse to first occurrence, order preserved") {
    val (fast, hof) = bothFormulations(3)
    assert(fast(6L) == Seq("a b a", "b a b"))
    assert(fast(6L) == hof(6L))
  }

  for (n <- Seq(2, 8)) {
    test(s"positional ngrams (emitShortDoc=true) ≡ repetitionMetrics HOF form, n=$n") {
      val toksDf = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      val fast = toksDf.select(col("doc_id"),
        graft.expressions.SketchExpressions.ngrams_of_tokens(col("toks"), n, emitShortDoc = true).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = toksDf.select(col("doc_id"),
        transform(sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fast == hof)
    }

    test(s"positional ngrams (emitShortDoc=false) ≡ exciseDuplicateSpans HOF form, n=$n") {
      val toksDf = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      val fast = toksDf.select(col("doc_id"),
        graft.expressions.SketchExpressions.ngrams_of_tokens(col("toks"), n, emitShortDoc = false).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = toksDf.select(col("doc_id"),
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(fast == hof)
    }
  }

  test("count_in_set ≡ size(filter(array_contains)) including null array") {
    val toksDf = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .withColumn("toks", when(col("doc_id") === 5L, lit(null).cast("array<string>"))
        .otherwise(col("toks"))) // force a genuinely null array
    val set = TextAnalysis.stopwords
    val fast = toksDf.select(col("doc_id"),
      graft.expressions.SketchExpressions.count_in_set(col("toks"), set).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val hof = toksDf.select(col("doc_id"),
      size(filter(col("toks"), tk => array_contains(array(set.map(lit): _*), tk))).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(fast == hof)
    assert(fast(5L).isEmpty) // null array → null count, like size(null)
  }

  test("portable_hash60_array ≡ per-element conv(substring(md5)) chain") {
    val toksDf = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesOfTokens(col("toks"), 3).as("sh"))
    val fast = toksDf.select(col("doc_id"),
      graft.expressions.SketchExpressions.portable_hash60_array(col("sh")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = toksDf.select(col("doc_id"),
      transform(col("sh"), x => Dedup.portableHash60(x)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast == hof)
    // and a hand-checked value: md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    // → first 15 hex digits 0x900150983cd24fb >>> nothing further
    val one = spark.sql("select 1").select(
      graft.expressions.SketchExpressions.portable_hash60_array(
        array(lit("abc"))).getItem(0)).collect().head.getLong(0)
    assert(one == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("minhash_band_keys ≡ transform(sequence, concat_ws(slice)) twin") {
    val sigDf = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), Dedup.shinglesOfTokens(col("toks"), 3).as("sh"))
      .select(col("doc_id"),
        graft.expressions.SketchExpressions.minhash_signature(
          graft.expressions.SketchExpressions.portable_hash60_array(col("sh")), 32).as("sig"))
    val bands = 8; val rpb = 4
    val fast = sigDf.select(col("doc_id"),
      graft.expressions.SketchExpressions.minhash_band_keys(col("sig"), bands, rpb).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = sigDf.select(col("doc_id"),
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rpb + 1, lit(rpb)))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast == hof)
  }

  test("null ELEMENTS inside the token array are skipped like concat_ws") {
    val s = spark
    import s.implicits._
    // hand-built array with a null element (split never yields one, but the
    // expression mirrors concat_ws's skip semantics for generality)
    val df = Seq(Tuple1(Seq("a", null, "c", "d"))).toDF("toks")
    val fast = df.select(Dedup.shinglesOfTokens(col("toks"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    val hof = df.select(Dedup.shinglesOfTokensHof(col("toks"), 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(fast == hof)
    assert(fast == Seq("a c", "c d"))
  }
}
