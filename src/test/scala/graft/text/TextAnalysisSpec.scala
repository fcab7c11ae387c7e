package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {

  private def one(text: String) = {
    val s = spark
    import s.implicits._
    Seq((1L, text)).toDF("id", "text")
  }

  test("token counts: whitespace and BPE-ish") {
    val df = one("Hello, world! This is   a test.")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeIshTokenCount(col("text")).as("bpe")).head()
    assert(r.getAs[Int]("ws") == 6)
    // hello , world ! this is a test . → 9 pieces
    assert(r.getAs[Int]("bpe") == 9)
  }

  test("empty and null text count zero tokens") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, ""), (2L, "   ")).toDF("id", "text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq == Seq(0, 0))
  }

  test("quality metrics compute expected ratios") {
    val r = TextAnalysis.qualityMetrics(one("the cat sat on the mat"), "text").head()
    assert(r.getAs[Int]("n_tokens") == 6)
    // stopwords here: the, on, the → 3/6
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
    assert(r.getAs[Double]("punct_ratio") == 0.0)
  }

  test("language id picks the dominant marker language") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato está en la casa de los vecinos y una ventana"),
      (3L, "le chat est dans la maison pour les vacances sur une table"),
      (4L, "der hund ist nicht mit der katze und ein vogel von hier"),
      (5L, "xyzzy plugh qwerty")).toDF("id", "text")
    val langs = df.select(col("id"), TextAnalysis.languageId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en")
    assert(langs(2L) == "es")
    assert(langs(3L) == "fr")
    assert(langs(4L) == "de")
    assert(langs(5L) == "und")
  }

  test("fingerprint is deterministic and equal for identical content") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("id", "text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
  }

  test("analyze projects the full feature row") {
    val out = TextAnalysis.analyze(one("The quick brown fox, and the lazy dog."), "id", "text")
    val r = out.head()
    assert(out.columns.toSeq == Seq("id", "n_chars", "n_tokens", "bpe_ish_tokens",
      "mean_token_len", "stopword_ratio", "punct_ratio", "upper_ratio",
      "quality_score", "lang_id", "fingerprint"))
    assert(r.getAs[String]("lang_id") == "en")
  }

  test("repetition metrics: duplicate and top n-gram fractions") {
    // tokens: a b a b a → bigrams: "a b","b a","a b","b a" → 4 grams, 2 distinct
    val r = TextAnalysis.repetitionMetrics(one("a b a b a"), "text").head()
    assert(r.getAs[Int]("n_ngrams") == 4)
    assert(r.getAs[Double]("dup_ngram_frac") == 0.5)   // 2 repeats of 4
    assert(r.getAs[Double]("top_ngram_frac") == 0.5)   // "a b" twice of 4
  }

  test("repetition metrics: an unrepetitive document scores zero") {
    val r = TextAnalysis.repetitionMetrics(one("one two three four"), "text").head()
    assert(r.getAs[Int]("n_ngrams") == 3)
    assert(r.getAs[Double]("dup_ngram_frac") == 0.0)
    // all bigrams unique → the top one is 1 of 3
    assert(math.abs(r.getAs[Double]("top_ngram_frac") - 1.0 / 3) < 1e-15)
  }
}
