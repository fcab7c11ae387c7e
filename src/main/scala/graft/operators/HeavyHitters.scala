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
 */
object HeavyHitters {

  def topTermsWithCmsVerdict(docs: DataFrame, textCol: String, k: Int = 20,
                             eps: Double = 1e-4, confidence: Double = 0.99,
                             seed: Int = 42): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery
    val toks = docs.select(
      explode(graft.text.TextAnalysis.tokens(col(textCol))).as("w"))
    val skRow = toks.agg(
      expr(s"count_min_sketch(w, ${eps}d, ${confidence}d, $seed)").as("sk"),
      count(lit(1)).as("total"))
    val sk: Column = scalarSubquery(
      skRow.select(struct(col("sk"), col("total")).as("s")))
    toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(k)
      .withColumn("__est", graft.expressions.SketchExpressions
        .cms_estimate(sk.getField("sk"), col("w")))
      .select(col("w").as("term"), col("n"),
        (col("__est") >= col("n") &&
          col("__est") <= col("n") +
            ceil(lit(eps) * sk.getField("total")).cast("long"))
          .as("within_bound"))
      .orderBy(col("n").desc, col("term"))
  }
}
