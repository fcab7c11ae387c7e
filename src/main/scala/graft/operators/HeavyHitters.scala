package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus heavy hitters with a Count-Min-Sketch audit — the sketch-family
 * member for frequent-items at 100 TB, certified the same way as the HLL
 * and approx-percentile rows (exact values + an error-bound VERDICT the
 * oracle expects to be true, so an estimator regression breaks the hash).
 *
 * Exact path: token explode → grouped count → top-k (plans as
 * TakeOrderedAndProject; the one shuffle carries (term, partial-count)
 * pairs). Sketch path: Spark's built-in `count_min_sketch` aggregate over
 * the SAME token stream — a mergeable fixed-size summary (width 2/eps ×
 * depth ln(1/δ) counters) that partial-aggregates map-side and costs one
 * scalar-subquery value at the plan's edge. At production scale the exact
 * grouped count is the expensive half (vocabulary-sized shuffle); the
 * sketch answers the same top-k frequencies in ONE narrow pass with
 * per-executor constant state, which is why it is the 100 TB path — here
 * both run so the verdict certifies the estimate against the truth.
 *
 * Everything is lazy, inside one plan: the sketch rides as a scalar
 * subquery into [[graft.expressions.SketchExpressions.cms_estimate]]
 * (deserialized once per task), so timed executions pay the full sketch
 * build — no driver-side precomputation.
 *
 * Verdict per term: `exact ≤ estimate ≤ exact + ⌈eps·N⌉` — the CMS
 * guarantee (one-sided overestimate, bounded by eps × stream length with
 * probability 1−δ per item; the seed is fixed, so the outcome is
 * deterministic and replayable).
 *
 * ORACLE-DETERMINISM CAVEAT (r6 advice): the DuckDB oracle hard-codes
 * `within_bound = true`, which the 1·eps·N bound only guarantees with
 * probability 1−δ PER ITEM (δ=0.01 ⇒ up to ~18% chance of at least one of
 * 20 probes exceeding it on FRESH data). The r7 verdict ordered the audit
 * QUERY widened to `boundFactor = 2` (Spark's CMS width is ⌈2/eps⌉, so
 * per-hash Markov gives P(excess ≥ 2·eps·N) ≤ 1/4 per row of depth —
 * ≈ (1/4)^7 ≈ 6e-5 per item at confidence 0.99, ~1e-3 across 20 probes on
 * regenerated data, vs ~18% at 1·eps). HeavyHittersSpec still pins the
 * exact 1·eps bound (boundFactor 1, the theoretical guarantee) on the
 * committed testdata, so estimator precision is asserted where determinism
 * is known; the oracle-hashed verdict carries the regeneration-proof bound.
 */
object HeavyHitters {

  /**
   * @param sketchFromGrouped when true, build the sketch from the
   *        vocabulary-bounded grouped count via WEIGHTED inserts
   *        ([[graft.expressions.CmsWeightedAgg]]; counters are additive, so
   *        the sketch bytes — and therefore the verdicts — are identical to
   *        sketching the raw stream, spec-pinned) instead of a second pass
   *        over the token stream. At 100 TB the grouped table is kilobytes
   *        where the corpus re-scan is the full IO bill, so the weighted
   *        form is the scale path for this AUDIT (which pays the grouped
   *        count regardless; a sketch-ONLY pipeline keeps the raw-stream
   *        aggregate and no vocabulary shuffle at all). Default false: at
   *        latency-bound local scale the two scans run CONCURRENTLY (the
   *        sketch is a subquery), which measures faster than serializing
   *        both consumers behind one materialized grouped count — the r7
   *        same-JVM A/B read 0.26 s concurrent vs 0.46 s shared at sf0.1.
   */
  def topTermsWithCmsVerdict(docs: DataFrame, textCol: String, k: Int = 20,
                             eps: Double = 1e-4, confidence: Double = 0.99,
                             seed: Int = 42,
                             sketchFromGrouped: Boolean = false,
                             boundFactor: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery
    val toks = docs.select(
      explode(graft.text.TextAnalysis.tokens(col(textCol))).as("w"))
    // On the sketchFromGrouped path the grouped count feeds TWO plans (the
    // sketch scalar subquery and the main top-k); exchange/subquery reuse is
    // not guaranteed across a scalar-subquery boundary (notably under AQE),
    // so the single-vocabulary-pass claim is made true by persisting the
    // kilobyte-scale grouped table rather than hoping the optimizer dedups
    // the scans (ADVICE r7). The concurrent default keeps the lazy def —
    // its two scans are intentional (see the param doc above).
    lazy val groupedPersisted =
      Dedup.persistTracked(toks.groupBy("w").agg(count(lit(1)).as("n")))
    def grouped =
      if (sketchFromGrouped) groupedPersisted
      else toks.groupBy("w").agg(count(lit(1)).as("n"))
    val skRow =
      if (sketchFromGrouped)
        grouped.agg(
          graft.expressions.SketchExpressions
            .cms_weighted(col("w"), col("n"), eps, confidence, seed).as("sk"),
          sum(col("n")).as("total"))
      else
        toks.agg(
          expr(s"count_min_sketch(w, ${eps}d, ${confidence}d, $seed)").as("sk"),
          count(lit(1)).as("total"))
    val sk: Column = scalarSubquery(
      skRow.select(struct(col("sk"), col("total")).as("s")))
    grouped
      .orderBy(col("n").desc, col("w")).limit(k)
      .withColumn("__est", graft.expressions.SketchExpressions
        .cms_estimate(sk.getField("sk"), col("w")))
      .select(col("w").as("term"), col("n"),
        (col("__est") >= col("n") &&
          col("__est") <= col("n") +
            ceil(lit(boundFactor * eps) * sk.getField("total")).cast("long"))
          .as("within_bound"))
      // k rows in one partition after the limit: in-partition sort, not a
      // range sort whose sampling pass re-executes the whole top-k child
      .coalesce(1).sortWithinPartitions(col("n").desc, col("term"))
  }
}
