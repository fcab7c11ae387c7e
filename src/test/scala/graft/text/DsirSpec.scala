package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = (
    (1L to 12L).map(i => (i, "en", "the cat sat on the mat and the dog ran")) ++
    (13L to 24L).map(i => (i, "xx", "zq vw zq vw zq vw xk pj")) ++ Seq(
      (25L, "xx", "the cat sat on the mat"),   // target-like, labelled xx
      (26L, "en", "zq vw zq vw"),              // raw-like, labelled en
      (27L, "xx", "solo"))                     // 1 token: no evidence
    ).toDF("id", "lang", "text")

  test("one-pass two-model scores equal two independent LmScore runs") {
    val fused = Dsir.importanceScores(corpus, "id", "text",
      targetPred = col("lang") === "en")
    val target = LmScore.perplexityFilter(corpus, "id", "text",
      trainPred = col("lang") === "en")
    val raw = LmScore.perplexityFilter(corpus, "id", "text",
      trainPred = lit(true))
    val t = target.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    val rw = raw.collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    fused.collect().foreach { r =>
      val id = r.getLong(0)
      assert(Option(r.get(2)) === t(id), s"nll_target for $id")
      assert(Option(r.get(3)) === rw(id), s"nll_raw for $id")
    }
  }

  test("selection tracks domain fit: target-like docs selected, raw-like not") {
    val out = Dsir.importanceScores(corpus, "id", "text",
        targetPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))).toMap
    // target-like text has positive importance weight regardless of label
    assert(out(25L)._1.get > 0 && out(25L)._2)
    assert(out(1L)._1.get > 0 && out(1L)._2)
    // raw-corpus-typical (non-target) text weighs negative
    assert(out(26L)._1.get < 0 && !out(26L)._2)
    assert(out(13L)._1.get < 0 && !out(13L)._2)
    // no bigram evidence → null weight, never selected
    assert(out(27L)._1.isEmpty && !out(27L)._2)
  }

  test("1-row pair model frames ≡ trainPair's two models, field for field") {
    val targetPred = col("lang") === "en"
    for (minCount <- Seq(1L, 2L)) {
      val (target, raw) = Dsir.trainPair(corpus, "text", targetPred, minCount)
      val row = Dsir.bigramPairRow(corpus, "text", targetPred, minCount)
        .collect().head.getStruct(0)
      val vRow = Dsir.vocabPairRow(corpus, "text", targetPred)
        .collect().head.getStruct(0)
      def flat(m: scala.collection.Map[String, scala.collection.Map[String, Long]]) =
        m.toSeq.flatMap { case (w1, inner) =>
          inner.toSeq.map { case (w2, c) => (w1, w2) -> c } }.toMap
      def bgOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      def pfxOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(flat(row.getMap(0)) === bgOf(target.bg), s"bg_t at minCount=$minCount")
      assert(row.getMap[String, Long](1).toMap === pfxOf(target.pfx),
        s"pfx_t at minCount=$minCount")
      assert(flat(row.getMap(2)) === bgOf(raw.bg), s"bg_r at minCount=$minCount")
      assert(row.getMap[String, Long](3).toMap === pfxOf(raw.pfx),
        s"pfx_r at minCount=$minCount")
      assert(vRow.getLong(0) === target.v.collect().head.getLong(0),
        s"v_t at minCount=$minCount")
      assert(vRow.getLong(1) === raw.v.collect().head.getLong(0),
        s"v_r at minCount=$minCount")
    }
  }

  test("w is exactly nll_raw - nll_target on the rounded means") {
    Dsir.importanceScores(corpus, "id", "text",
        targetPred = col("lang") === "en")
      .collect().foreach { r =>
        (Option(r.get(2)), Option(r.get(3)), Option(r.get(4))) match {
          case (Some(t: Double), Some(rw: Double), Some(w: Double)) =>
            assert(w === rw - t)
          case (t, rw, w) => assert(t.isEmpty && rw.isEmpty && w.isEmpty)
        }
      }
  }
}
