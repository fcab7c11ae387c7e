package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style importance resampling — "Data Selection for Language Models
 * via Importance Resampling" (Xie et al., 2023, public): score every
 * candidate document by how much more likely a TARGET-domain n-gram LM
 * finds it than a RAW-corpus n-gram LM, and keep the documents whose
 * log-likelihood ratio clears a threshold. This is the model-based data
 * selection step of a pretraining pipeline, one level up from the plain
 * perplexity filter ([[LmScore.perplexityFilter]]): the ratio cancels
 * generic fluency, so selection tracks DOMAIN fit rather than just
 * well-formedness.
 *
 * Both models are the same add-k-smoothed bigram estimator as
 * [[LmScore]] (so the DuckDB oracle replays every number); the importance
 * weight is `w = nll_raw − nll_target` = mean per-bigram
 * `ln p_target − ln p_raw` — positive ⇔ the target model likes the
 * document more.
 *
 * Scale shape (100 TB): BOTH models collapse to vocabulary-bounded map
 * values carried as scalar subqueries, and both are evaluated by the fused
 * one-pass expression on a SINGLE scan of the candidate corpus — zero
 * joins, zero shuffles, zero per-bigram rows on the score path. Training
 * scans only the (small) target slice plus the raw corpus once each, all
 * map-side aggregation into vocabulary-bounded tables.
 */
object Dsir {

  /**
   * Per-document importance scores and the selection decision.
   *
   * Output: `(idCol, n_bigrams, nll_target, nll_raw, w, selected)` —
   * per-model mean NLLs rounded to `roundTo` (absorbing last-ulp `ln`
   * differences across engines), `w` their difference (exact, both
   * operands already rounded), `selected = w ≥ tau` (never true for
   * no-bigram documents: no evidence, null scores).
   */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
                       targetPred: Column, tau: Double = 0.0,
                       k: Double = 0.5, minCount: Long = 1L,
                       roundTo: Int = 6): DataFrame = {
    val target = LmScore.train(docs.filter(targetPred), textCol, minCount)
    val raw = LmScore.train(docs, textCol, minCount)
    val toks = TextAnalysis.tokens(col(textCol))
    docs
      .withColumn("__t", LmScore.nllStruct(target, toks, k))
      .withColumn("__r", LmScore.nllStruct(raw, toks, k))
      .select(col(idCol),
        col("__t").getField("n_bigrams").as("n_bigrams"),
        round(col("__t").getField("nll_sum") /
          col("__t").getField("n_bigrams"), roundTo).as("nll_target"),
        round(col("__r").getField("nll_sum") /
          col("__r").getField("n_bigrams"), roundTo).as("nll_raw"))
      .withColumn("w", col("nll_raw") - col("nll_target"))
      .withColumn("selected", coalesce(col("w") >= tau, lit(false)))
  }
}
