package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multinomial Naive Bayes document classifier, trained and applied entirely
 * inside the engine — the fastText-niche component of a curation pipeline
 * (domain/quality/language tagging at corpus scale) expressed as pure
 * relational algebra: training is one token-count aggregation, scoring is an
 * explode + model join + per-document sum. No driver-side learning loop, no
 * UDFs, nothing collected.
 *
 * Math (add-1 token smoothing, add-1 class priors, natural log):
 *   score(c, d) = Σ_{t∈d} ln(count(c,t) + 1)  −  |d|·ln(total_c + V)
 *                 + ln((docs_c + 1) / (docs_train + K))
 * which is the standard Σ ln P̂(t|c) + ln P̂(c) with the per-token
 * denominator factored out of the sum — fewer float ops per row and an
 * exactly replayable grouping for the cross-engine oracle (round-6 output,
 * LmScore's convention).
 *
 * Scale shape: the (token × class-counts) model table is vocabulary-bounded
 * (a few hundred thousand rows for real corpora — broadcast-sized; were the
 * vocab unbounded, the same plan works as a shuffle join on the token).
 * Training shuffles (token, class-count partials) only — map-side partial
 * aggregation collapses each partition to its local vocab before the
 * exchange. The four corpus scalars per class (token totals, vocab size,
 * doc priors) ride as two struct scalar subqueries: stats work re-runs
 * inside every execution, and the values ship once per task, never per row.
 * The per-document aggregation keys on the id alone, so the one scoring
 * shuffle carries ids and partial sums, never text.
 */
object NaiveBayes {

  /**
   * Train on `docs.filter(trainPred)`, score EVERY document: emits
   * (idCol, n_tokens, score_<class>…, predicted) with scores rounded to
   * `roundTo` decimals and argmax ties broken by `classes` order (the chain
   * compares the ROUNDED scores, so both engines tie-break identically).
   * Rows whose label is outside `classes` still train nothing and score
   * normally — `classes` defines the model's output space.
   */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, classes: Seq[String],
                 trainPred: Column, roundTo: Int = 6): DataFrame = {
    require(classes.nonEmpty && classes.distinct == classes,
      "classes must be non-empty and distinct")
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery

    val train = docs.filter(trainPred)
    val trainTok = train.select(col(labelCol).as("__y"),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))

    // model: one row per training token, one count column per class
    val counts = trainTok.groupBy("t").agg(
      sum(when(col("__y") === classes.head, 1L).otherwise(0L)).as("c0"),
      classes.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col("__y") === c, 1L).otherwise(0L)).as(s"c${i + 1}")
      }: _*)

    // corpus scalars: per-class token totals + vocab size; per-class doc
    // counts + training size (two subqueries — they aggregate different
    // frames)
    val tokStats = scalarSubquery(counts.agg(
      count(lit(1)).cast("double").as("v"),
      classes.indices.map(i => sum(col(s"c$i")).cast("double").as(s"tot$i")): _*)
      .select(struct(col("v") +: classes.indices.map(i => col(s"tot$i")): _*)))
    val docStats = scalarSubquery(train.agg(
      count(lit(1)).cast("double").as("n"),
      classes.zipWithIndex.map { case (c, i) =>
        sum(when(col(labelCol) === c, 1L).otherwise(0L)).cast("double").as(s"n$i")
      }: _*)
      .select(struct(col("n") +: classes.indices.map(i => col(s"n$i")): _*)))

    val exploded = docs.select(col(idCol),
      explode_outer(TextAnalysis.tokens(col(textCol))).as("t"))
    val perDoc = exploded
      .join(broadcast(counts), Seq("t"), "left")
      .groupBy(col(idCol))
      .agg(count(col("t")).as("n_tokens"),
        classes.indices.map(i =>
          sum(log(coalesce(col(s"c$i"), lit(0L)) + lit(1.0))).as(s"__s$i")): _*)

    val k = classes.size.toDouble
    val scoreCols = classes.zipWithIndex.map { case (c, i) =>
      round(
        col(s"__s$i")
          - col("n_tokens").cast("double") *
            log(tokStats.getField(s"tot$i") + tokStats.getField("v"))
          + log((docStats.getField(s"n$i") + 1.0) / (docStats.getField("n") + k)),
        roundTo).as(s"score_$c")
    }
    val withScores = perDoc.select(
      col(idCol) +: col("n_tokens") +: scoreCols: _*)

    val best = greatest(classes.map(c => col(s"score_$c")): _*)
    val predicted = classes.foldRight(lit(null).cast("string")) { (c, acc) =>
      when(col(s"score_$c") === best, c).otherwise(acc)
    }
    // foldRight builds …when(c0).otherwise(when(c1)…): first class in
    // `classes` wins rounded-score ties
    withScores.withColumn("predicted", predicted)
  }
}
