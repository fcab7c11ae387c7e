package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSuite {

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "text", "y")
  }

  test("separable classes: held-out docs classify by their class's vocabulary") {
    val train = Seq(
      1L -> ("apple banana fruit sweet", "food"),
      2L -> ("banana apple tasty fruit", "food"),
      3L -> ("gear engine piston oil", "car"),
      4L -> ("engine oil brake gear", "car"))
    val test = Seq(
      10L -> ("apple fruit snack", "food"),
      11L -> ("piston brake engine", "car"))
    val all = frame((train ++ test).map { case (id, (t, y)) => (id, t, y) })
    val out = NaiveBayes.trainScore(all, "id", "text", "y",
        Seq("car", "food"), trainPred = col("id") < 10L)
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(10L) == "food")
    assert(out(11L) == "car")
    // training docs also classify correctly on separable vocab
    assert(out(1L) == "food" && out(3L) == "car")
  }

  test("priors matter: at equal token totals an all-OOV doc goes to the majority class") {
    // both classes train on 3 'red' tokens (identical token term for an
    // OOV doc), but 'big' has 3 training docs vs 1 — only the prior
    // ln((3+1)/(4+2)) vs ln((1+1)/(4+2)) separates them
    val rows = frame(Seq(
      (1L, "red", "big"), (2L, "red", "big"), (3L, "red", "big"),
      (4L, "red red red", "small"),
      (9L, "zzz qqq", "?"))) // all tokens unseen in training
    val out = NaiveBayes.trainScore(rows, "id", "text", "y",
        Seq("small", "big"), trainPred = col("id") < 9L) // list order can't rescue 'big'
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(9L) == "big")
  }

  test("tie-break is deterministic: first class in the list wins exact ties") {
    val rows = frame(Seq(
      (1L, "x", "a"), (2L, "x", "b"), // perfectly symmetric classes
      (9L, "x", "?")))
    val out = NaiveBayes.trainScore(rows, "id", "text", "y",
        Seq("a", "b"), trainPred = col("id") < 9L)
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(out(9L) == "a")
    val outFlipped = NaiveBayes.trainScore(rows, "id", "text", "y",
        Seq("b", "a"), trainPred = col("id") < 9L)
      .collect().map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    assert(outFlipped(9L) == "b")
  }

  test("every document is scored, including ones outside the class space") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = NaiveBayes.trainScore(docs, "doc_id", "text", "lang",
      Seq("en", "es"), trainPred = col("doc_id") % 2 === 0)
    assert(out.count() == docs.count())
    assert(out.filter(col("predicted").isNull).count() == 0)
    // deterministic across runs
    val again = NaiveBayes.trainScore(docs, "doc_id", "text", "lang",
      Seq("en", "es"), trainPred = col("doc_id") % 2 === 0)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("plan shape: the score path is one narrow pass — no shuffles, no joins") {
    // repartition: the single-file sf0.001 scan is ONE partition, which
    // satisfies any required distribution — no exchange would be planned
    // and the assertion would be vacuous
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(4)
    // AQE off for the assertion: its root defers EnsureRequirements, so the
    // pre-adaptive inputPlan has no exchanges to count yet
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      NaiveBayes.trainScore(docs, "doc_id", "text", "lang",
        Seq("en", "es"), trainPred = col("doc_id") % 2 === 0)
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    // the MAIN tree is explode-free, join-free and shuffle-free: the model
    // and corpus stats ride as scalar subqueries (their own little plans),
    // and NbSumLogExpr scores each document in place — the only exchange is
    // the round-robin repartition above
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val hashEx = exchanges.filter(_.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx.isEmpty, exchanges.map(_.outputPartitioning).toString)
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.isEmpty, plan.toString)
    assert(plan.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, plan.toString)
    // the model struct (map + token stats) and the doc priors arrive as
    // exactly two DISTINCT scalar subqueries (one training aggregation run)
    val subPlanIds = plan.collect { case n => n }.flatMap(_.expressions)
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.ScalarSubquery => s.exprId
      }).distinct
    assert(subPlanIds.size == 2, plan.toString)
  }

  test("fused scorer ≡ explode + broadcast-join formulation, bit for bit") {
    // the fused NbSumLogExpr path must reproduce the join-based evidence
    // sums EXACTLY (same left-to-right accumulation order), so scores match
    // at full double precision, not just post-rounding — pin it at 9 dp
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val classes = Seq("en", "es", "fr")
    val trainPred = col("doc_id") % 2 === 0
    val fused = NaiveBayes.trainScore(docs, "doc_id", "text", "lang",
      classes, trainPred, roundTo = 9)

    // independent reference: the pre-round-7 explode + broadcast-join shape
    val train = docs.filter(trainPred)
    val trainTok = train.select(col("lang").as("__y"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
    val counts = trainTok.groupBy("t").agg(
      sum(when(col("__y") === classes.head, 1L).otherwise(0L)).as("c0"),
      classes.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col("__y") === c, 1L).otherwise(0L)).as(s"c${i + 1}")
      }: _*)
    val exploded = docs.select(col("doc_id"),
      explode_outer(TextAnalysis.tokens(col("text"))).as("t"))
    val perDoc = exploded
      .join(broadcast(counts), Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("t")).as("n_tokens"),
        classes.indices.map(i =>
          sum(log(coalesce(col(s"c$i"), lit(0L)) + lit(1.0))).as(s"__s$i")): _*)
    val fusedRaw = fused.select(col("doc_id") +: col("n_tokens") +:
      classes.zipWithIndex.map { case (c, i) => col(s"score_$c").as(s"r$i") }: _*)
    // compare the evidence sums via the final scores: identical sums +
    // identical scalar stats ⇒ identical rounded scores at 9 dp
    val expect = perDoc.collect().map { r =>
      r.getLong(r.fieldIndex("doc_id")) ->
        (r.getLong(r.fieldIndex("n_tokens")),
          classes.indices.map(i => r.getDouble(r.fieldIndex(s"__s$i"))))
    }.toMap
    val gotSums = NaiveBayes.evidenceSums(docs, "doc_id", "text",
      "lang", classes, trainPred)
      .collect().map { r =>
        r.getLong(0) -> (r.getLong(1), classes.indices.map(i => r.getDouble(2 + i)))
      }.toMap
    assert(gotSums.keySet == expect.keySet)
    gotSums.foreach { case (id, (n, sums)) =>
      val (en, esums) = expect(id)
      assert(n == en, s"doc $id n_tokens")
      sums.zip(esums).foreach { case (a, b) =>
        assert(a == b, s"doc $id evidence sum: $a != $b") // bit-identical
      }
    }
    assert(fusedRaw.count() == docs.count())
  }

  test("a single-class model is degenerate but does not crash") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta", "en"), (2L, "gamma delta", "en"))
      .toDF("doc_id", "text", "label")
    val out = NaiveBayes.trainScore(docs, "doc_id", "text", "label",
      Seq("en"), trainPred = col("doc_id") === 1L)
    assert(out.select("predicted").as[String].collect().toSet === Set("en"))
  }
}
