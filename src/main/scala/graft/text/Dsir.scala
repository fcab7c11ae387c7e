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
    val (target, raw) = trainPair(docs, textCol, targetPred, minCount)
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

  /**
   * Train the target AND raw models from ONE pass over the corpus — the
   * K-models-one-scan shape: two independent `LmScore.train` calls would
   * explode the corpus into bigrams twice (and the token stream twice for
   * the vocabularies), pure duplicated heavy work since the target slice
   * is a subset of the raw corpus. Instead one bigram explode aggregates
   * BOTH counts per (w1, w2) — raw = count(*), target = count where the
   * document satisfies `targetPred` — and one token explode computes both
   * vocabulary sizes via a conditional distinct. Prefix counts are row
   * sums of the unpruned bigram table per model (same
   * summed-before-pruning rule as `LmScore.train`). Results are exactly
   * the two independently-trained models (DsirSpec pins this against two
   * `LmScore` runs); the corpus-scale work halves, and everything after
   * the explode is vocabulary-bounded.
   */
  def trainPair(docs: DataFrame, textCol: String, targetPred: Column,
                minCount: Long = 1L): (LmScore.BigramModel, LmScore.BigramModel) = {
    import LmScore.BigramModel
    val base = docs.select(coalesce(targetPred, lit(false)).as("__is_t"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val bg = graft.operators.Dedup.persistTracked(
      base.select(col("__is_t"), explode(LmScore.bigramsOf(col("__toks"))).as("bg"))
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("c12_r"),
          sum(when(col("__is_t"), 1L).otherwise(0L)).as("c12_t")))
    val vRow = graft.operators.Dedup.persistTracked(
      base.select(col("__is_t"), explode(col("__toks")).as("w"))
        .agg(count_distinct(col("w")).as("v_r"),
          count_distinct(when(col("__is_t"), col("w"))).as("v_t")))
    val target = BigramModel(
      bg = bg.filter(col("c12_t") >= math.max(minCount, 1L))
        .select(col("w1"), col("w2"), col("c12_t").as("c12")),
      pfx = bg.groupBy("w1").agg(sum(col("c12_t")).as("c1"))
        .filter(col("c1") > 0),
      v = vRow.select(col("v_t").as("v")))
    val raw = BigramModel(
      bg = bg.filter(col("c12_r") >= minCount)
        .select(col("w1"), col("w2"), col("c12_r").as("c12")),
      pfx = bg.groupBy("w1").agg(sum(col("c12_r")).as("c1")),
      v = vRow.select(col("v_r").as("v")))
    (target, raw)
  }
}
