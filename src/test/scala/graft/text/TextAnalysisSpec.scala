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

  test("pii redaction replaces emails, urls, phones, and ips with tags") {
    val df = one("mail a.b+c@x.org or call 555-123-4567, see https://x.y/z?q=1 from 10.1.2.3 done")
    val r = df.select(TextAnalysis.redactPii(col("text")).as("red")).head()
    assert(r.getAs[String]("red") ==
      "mail <EMAIL> or call <PHONE>, see <URL> from <IP> done")
    val counts = TextAnalysis.piiCounts(df, "text").head()
    assert(counts.getAs[Int]("n_email") == 1)
    assert(counts.getAs[Int]("n_url") == 1)
    assert(counts.getAs[Int]("n_phone") == 1)
    assert(counts.getAs[Int]("n_ip") == 1)
  }

  test("pii redaction leaves clean text untouched") {
    val clean = "just ordinary words with numbers 42 and a ratio 3.5 here"
    val r = one(clean).select(TextAnalysis.redactPii(col("text")).as("red")).head()
    assert(r.getAs[String]("red") == clean)
  }

  test("salient terms rank by tf desc, then rarity, then term") {
    val s = spark
    import s.implicits._
    // "rare" appears twice in doc 1 and nowhere else; "common" is everywhere
    val df = Seq(
      (1L, "rare rare common filler"),
      (2L, "common other words here"),
      (3L, "common more words again")).toDF("doc_id", "text")
    val top = TextAnalysis.salientTerms(df, "doc_id", "text", k = 1)
      .orderBy("doc_id").collect()
    assert(top(0).getAs[String]("term") == "rare")   // tf=2 beats all tf=1
    assert(top(0).getAs[Long]("tf") == 2)
    assert(top(0).getAs[Long]("df") == 1)
    // docs 2/3: all tf=1 → rarest wins; their non-shared words have df=1,
    // ties broken alphabetically
    assert(top(1).getAs[Long]("df") == 1)
    assert(top(1).getAs[String]("term") == "here")
    assert(top(2).getAs[String]("term") == "again")
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

  test("repetition metrics: character-mass fractions (r12 Gopher twins)") {
    val s = spark
    import s.implicits._
    // tokens [aa bb aa bb cc] → bigrams: "aa bb"×2, "bb aa", "bb cc"
    // masses (count × chars): "aa bb" 2×5=10, others 1×5 each → total 20
    // dup mass = 10 (only "aa bb" repeats) → dup_char = 0.5; top = 10/20
    val r = TextAnalysis.repetitionMetrics(
      Seq((1L, "aa bb aa bb cc")).toDF("doc_id", "text"), "text", n = 2)
      .head()
    assert(r.getAs[Int]("n_ngrams") == 4)
    assert(r.getAs[Double]("dup_ngram_frac") == 0.25)   // (4 − 3) / 4
    assert(r.getAs[Double]("top_ngram_frac") == 0.5)    // 2 / 4
    assert(r.getAs[Double]("dup_ngram_char_frac") == 0.5)
    assert(r.getAs[Double]("top_ngram_char_frac") == 0.5)
    // blank doc: zero masses, fractions 0.0 (no division by zero)
    val b = TextAnalysis.repetitionMetrics(
      Seq((2L, "")).toDF("doc_id", "text"), "text", n = 2).head()
    assert(b.getAs[Double]("dup_ngram_char_frac") == 0.0)
    assert(b.getAs[Double]("top_ngram_char_frac") == 0.0)
  }
}
