package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class FilterCascadeSpec extends SparkSuite {
  import spark.implicits._

  test("first failing rule wins; passing rows get kept=true, reason=null") {
    val df = Seq((1L, 5), (2L, 50), (3L, 500)).toDF("id", "v")
    val out = FilterCascade.withDecision(df, Seq(
      "small" -> (col("v") < 10),
      "big" -> (col("v") > 100),
      "odd" -> (col("v") % 2 === 1))) // rule 3 never blamed for 5 (rule 1 took it)
      .select("id", "kept", "drop_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) === ((false, "small")))
    assert(out(2L) === ((true, null)))
    assert(out(3L) === ((false, "big")))
  }

  test("gopher recipe blames the expected rule per planted pathology") {
    val good = "the quick brown fox jumps over a lazy dog and runs to the " +
      "green hill with great speed for it is late in this day"
    val docs = Seq(
      (1L, good),                                        // kept
      (2L, "tiny doc"),                                  // too_short
      (3L, ("za qo " * 20).trim),                        // low stopwords + repetitive → earlier rule order decides
      (4L, good + " " + "el la de que y los las por con una el la de que y los las")
    ).toDF("id", "text")
    val out = FilterCascade.gopherRecipe(docs, "text")
      .select("id", "kept", "drop_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) === ((true, null)))
    assert(out(2L) === ((false, "too_short")))
    assert(out(3L)._1 === false)
    assert(out(3L)._2 === "low_stopword") // ordered: blamed before "repetitive"
    // doc 4 has plenty of length and English stopwords but the Spanish tail
    // outweighs: marker vote flips the language
    assert(out(4L) === ((false, "wrong_language")))
  }

  test("keep-stream and drop-report come from the same decision") {
    val docs = (0L until 200L).map { i =>
      val body = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
      (i, if (i % 4 == 0) "short" else s"the body is $body with the for a")
    }.toDF("id", "text")
    val dec = FilterCascade.gopherRecipe(docs, "text")
    val keptN = dec.filter(col("kept")).count()
    val report = dec.filter(!col("kept"))
      .groupBy("drop_reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptN + report.values.sum === 200L)
    assert(report("too_short") === 50L)
  }
}
