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
 * vocab unbounded, the same plan works as explode + shuffle join on the
 * token + per-doc aggregation). Training shuffles (token, class-count
 * partials) only — per-doc [[graft.expressions.TermCountsExpr]] maps
 * collapse repeated tokens BEFORE the explode, so the exchange carries
 * distinct (doc, token) counts, never occurrences. Scoring is one narrow
 * pass: the model collapses to a single-row `token → array<class-count>`
 * map carried as a scalar subquery into
 * [[graft.expressions.NbSumLogExpr]] — zero joins, zero per-token rows,
 * zero per-document aggregation, zero shuffles on the score path. The four
 * corpus scalars per class (token totals, vocab size, doc priors) ride as
 * two struct scalar subqueries: stats work re-runs inside every execution,
 * and the values ship once per task, never per row.
 */
object NaiveBayes {

  /**
   * Train on `docs.filter(trainPred)`, score EVERY document: emits
   * (idCol, n_tokens, score_<class>…, predicted) with scores rounded to
   * `roundTo` decimals and argmax ties broken by `classes` order (the chain
   * compares the ROUNDED scores, so both engines tie-break identically).
   * Rows whose label is outside `classes` still train nothing and score
   * normally — `classes` defines the model's output space.
   *
   * One output row per INPUT row (ADVICE r7): the fused scorer evaluates
   * each row in place, so duplicate `idCol` values yield one scored row
   * each — unlike the pre-r7 explode+groupBy formulation, which merged
   * duplicates into a single row with summed `n_tokens`/evidence. `idCol`
   * is expected unique (every caller here keys on `doc_id`, a primary key);
   * NaiveBayesSpec pins the row-count contract.
   */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, classes: Seq[String],
                 trainPred: Column, roundTo: Int = 6): DataFrame = {
    require(classes.nonEmpty && classes.distinct == classes,
      "classes must be non-empty and distinct")
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery

    val train = docs.filter(trainPred)
    // ONE model subquery carries the token→class-counts map AND its summary
    // stats (vocab size, per-class token totals) in a single struct, so the
    // training aggregation executes once per run, not once per consuming
    // subquery; doc priors aggregate a different frame (the un-exploded
    // training slice) and stay their own cheap subquery
    val model = modelSubquery(train, textCol, labelCol, classes)
    val docStats = scalarSubquery(train.agg(
      count(lit(1)).cast("double").as("n"),
      classes.zipWithIndex.map { case (c, i) =>
        sum(when(col(labelCol) === c, 1L).otherwise(0L)).cast("double").as(s"n$i")
      }: _*)
      .select(struct(col("n") +: classes.indices.map(i => col(s"n$i")): _*)))

    val perDoc = evidence(docs, idCol, textCol, classes, model)

    val k = classes.size.toDouble
    val scoreCols = classes.zipWithIndex.map { case (c, i) =>
      round(
        col(s"__s$i")
          - col("n_tokens").cast("double") *
            log(model.getField(s"tot$i") + model.getField("v"))
          + log((docStats.getField(s"n$i") + 1.0) / (docStats.getField("n") + k)),
        roundTo).as(s"score_$c")
    }
    val withScores = perDoc.select(
      col(idCol) +: col("n_tokens") +: scoreCols: _*)

    // greatest() requires ≥ 2 args (r11 review) — a one-class model is
    // degenerate but well-defined: it always predicts that class
    val best =
      if (classes.size == 1) col(s"score_${classes.head}")
      else greatest(classes.map(c => col(s"score_$c")): _*)
    val predicted = classes.foldRight(lit(null).cast("string")) { (c, acc) =>
      when(col(s"score_$c") === best, c).otherwise(acc)
    }
    // foldRight builds …when(c0).otherwise(when(c1)…): first class in
    // `classes` wins rounded-score ties
    withScores.withColumn("predicted", predicted)
  }

  /** The whole trained model as ONE scalar-subquery struct:
    * `(__m: token → array<class-count>, v: vocab size, tot0…totK: per-class
    * token totals)`. Training is the vocabulary-bounded token×class count
    * aggregation; per-doc [[graft.expressions.TermCountsExpr]] maps collapse
    * repeated tokens BEFORE the explode (round-6 verdict item 1), so the
    * training exchange carries distinct (doc, token) counts — `sum(__tc)`
    * reproduces occurrence counts exactly. Bundling map and stats in one
    * struct means the aggregation executes once per run, however many score
    * columns read its fields. */
  private def modelSubquery(train: DataFrame, textCol: String,
                            labelCol: String, classes: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery
    val trainTok = train.select(col(labelCol).as("__y"),
      explode(graft.expressions.SketchExpressions
        .term_counts(TextAnalysis.tokens(col(textCol)))).as(Seq("t", "__tc")))
    val counts = trainTok.groupBy("t").agg(
      sum(when(col("__y") === classes.head, col("__tc")).otherwise(0L)).as("c0"),
      classes.tail.zipWithIndex.map { case (c, i) =>
        sum(when(col("__y") === c, col("__tc")).otherwise(0L)).as(s"c${i + 1}")
      }: _*)
    scalarSubquery(counts.agg(
      map_from_entries(collect_list(struct(col("t"),
        array(classes.indices.map(i => col(s"c$i")): _*)))).as("__m"),
      count(lit(1)).cast("double").as("v") +:
        classes.indices.map(i => sum(col(s"c$i")).cast("double").as(s"tot$i")): _*)
      .select(struct(col("__m") +: col("v") +:
        classes.indices.map(i => col(s"tot$i")): _*)))
  }

  /** Fused evidence-sum stage (round-6 verdict item 1): per document,
    * `(idCol, n_tokens, __s0…__sK)` with `__si = Σ_t ln(count(cᵢ,t)+1)` —
    * every class summed by [[graft.expressions.NbSumLogExpr]] in one narrow
    * pass against the model struct's map field. Zero joins, zero per-token
    * rows, zero per-document aggregation; sums are bit-identical to the
    * explode + broadcast-join formulation (NaiveBayesSpec pins equality). */
  private def evidence(docs: DataFrame, idCol: String, textCol: String,
                       classes: Seq[String], model: Column): DataFrame =
    docs
      .withColumn("__nb", graft.expressions.LmExpressions.nb_sum_log(
        TextAnalysis.tokens(col(textCol)), model.getField("__m"), classes.size))
      .select(col(idCol) +: col("__nb").getField("n_tokens").as("n_tokens") +:
        classes.indices.map(i =>
          element_at(col("__nb").getField("sums"), i + 1).as(s"__s$i")): _*)

  /** Test hook: the fused evidence sums at full precision (`private[graft]`
    * so NaiveBayesSpec and the expressions fuzz spec can pin bit-equality
    * against the exploded shape). */
  private[graft] def evidenceSums(docs: DataFrame, idCol: String,
                                 textCol: String, labelCol: String,
                                 classes: Seq[String],
                                 trainPred: Column): DataFrame =
    evidence(docs, idCol, textCol, classes,
      modelSubquery(docs.filter(trainPred), textCol, labelCol, classes))
}
