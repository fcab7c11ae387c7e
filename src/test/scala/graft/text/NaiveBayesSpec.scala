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

  test("plan shape: model join is broadcast; the scoring shuffle keys on the id only") {
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
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // exactly two HASH exchanges in the whole tree: the training token-count
    // shuffle (inside the broadcast build) and the per-doc score aggregation
    // on the id — never a shuffle of the exploded corpus by token
    val hashEx = exchanges.filter(_.outputPartitioning
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(hashEx.size == 2, exchanges.map(_.outputPartitioning).toString)
    assert(hashEx.count(_.outputPartitioning.toString.contains("doc_id")) == 1,
      exchanges.map(_.outputPartitioning).toString)
    // the model join on the token is a broadcast, never a shuffle of the
    // exploded corpus
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.size == 1, plan.toString)
  }
}
