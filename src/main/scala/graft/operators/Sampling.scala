package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, reproducible sampling and splitting — the training-data
 * pipeline primitives where `rand()`-based sampling fails: a re-run (or a
 * retried task, or next month's incremental batch) must select the SAME
 * rows, or train/test contamination creeps in across pipeline versions.
 *
 * Mechanism: a row's first 8 md5 hex chars of its key act as a uniform
 * 32-bit bucket; selection compares that hex string against the threshold
 * string for `⌊fraction·2³²⌋` (8 hex chars, or the above-hex sentinel "g"
 * for fraction 1.0) — a pure string comparison, so the same rows
 * are chosen by any engine that can md5 (the DuckDB oracles replay the exact
 * selection). Narrow, codegen'd, no shuffle, no state; at 100 TB a sample is
 * a filter pushed right behind the scan.
 *
 * `salt` decorrelates independent samples over the same keys (e.g. a 1%
 * profiling sample that must not be a subset of the 10% training sample —
 * with equal salts, thresholded selections are nested by construction:
 * a p-sample ⊆ any q-sample for p ≤ q, which is itself useful for
 * growing-subset scaling experiments).
 */
object Sampling {

  /** First 8 md5 hex chars of (salt + key) — the row's uniform bucket. */
  def hexBucket(key: Column, salt: String = ""): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** The comparison threshold: `⌊fraction·2³²⌋` as 8 lowercase hex chars for
    * fraction < 1.0, or the single-char sentinel "g" for fraction 1.0 — NOT
    * a fixed-width hex string in that case.
    * Fraction 1.0 would clamp to "ffffffff", and the strict `<` selection
    * would silently drop rows whose bucket is exactly "ffffffff" (~2⁻³² of
    * rows); "g" sorts above every hex char in both Spark and DuckDB, so a
    * full-fraction sample keeps everything. */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0,1]")
    if (fraction >= 1.0) "g"
    else f"${math.floor(fraction * 4294967296.0).toLong}%08x"
  }

  /** Keep ~`fraction` of rows, keyed (and thus reproducible) by `keyCol`. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          salt: String = ""): DataFrame =
    df.filter(hexBucket(col(keyCol), salt) < lit(hexThreshold(fraction)))

  /**
   * Per-stratum fractions (absent strata keep nothing): the hash-threshold
   * comparison with a stratum-dependent threshold. One narrow pass — the
   * stratum column must be a row attribute (no pre-aggregation needed),
   * unlike frequency-balancing samplers that first count strata.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit("00000000")) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(hexBucket(col(keyCol), salt) < threshold)
  }

  /**
   * Deterministic per-group cap (domain balancing): keep at most `cap` rows
   * per group, chosen by hash rank — the "no domain exceeds N documents"
   * rule of web-corpus curation, stable across runs and engines (the hash
   * rank replaces `rand()` ordering). Secondary order on the key itself
   * breaks 8-hex-char bucket collisions deterministically.
   *
   * One shuffle on the group key; each group sorts within its partition. A
   * pathological mega-domain serializes into one task — for that shape set
   * `skewBuckets > 0`: the cap runs in two levels, first per
   * (group, hash-salt-bucket) — splitting the hot group across
   * `skewBuckets` tasks — then a final cap over the ≤ skewBuckets·cap
   * survivors per group. The global top-cap by a total order is contained
   * in the union of per-bucket top-caps, so the kept set is IDENTICAL to
   * the single-window form (`DedupSkewSpec` pins equivalence and the
   * partition-load bound); the trade is a second (tiny) shuffle, which is
   * why the narrow single-window plan stays the default for healthy
   * group-size distributions.
   */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, cap: Int,
                  salt: String = "", skewBuckets: Int = 0): DataFrame = {
    require(cap > 0, "cap must be positive")
    def ranked(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(hexBucket(col(keyCol), salt), col(keyCol))
      in.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= cap)
        .drop("__rk")
    }
    if (skewBuckets <= 0) ranked(df, Seq(col(groupCol)))
    else {
      val pre = ranked(
        df.withColumn("__sb",
          pmod(xxhash64(col(keyCol)), lit(skewBuckets.toLong))),
        Seq(col(groupCol), col("__sb")))
      ranked(pre.drop("__sb"), Seq(col(groupCol)))
    }
  }

  /**
   * Token-budget sampling (domain balancing by VOLUME, not document count):
   * walk each group's documents in deterministic hash order and keep a
   * document iff the tokens already admitted BEFORE it are under `budget` —
   * the "take N billion tokens per source" rule of pretraining-mix
   * construction, where domains differ 100× in document length and a
   * per-document cap ([[capPerGroup]]) would over-sample verbose domains.
   * Keeping on the PRE-sum (not the inclusive sum) admits the straddling
   * document — every non-empty group contributes at least one document, and
   * the admitted volume overshoots by strictly less than one document —
   * and is append-stable in the same sense as [[deterministicSample]]: a
   * kept document stays kept as long as no new document hashes ahead of it.
   *
   * Shape: one shuffle on the group key, then a running sum inside each
   * group — a window, because a cumulative admission rule is inherently
   * sequential per group. The skew escape is a PRE-CAP, not salting (a
   * prefix sum does not decompose over salt buckets): tokens are integral
   * and ≥ 1 per admissible document, so at most `budget` documents can ever
   * be admitted — a preliminary [[capPerGroup]] at `budget` (itself
   * salt-decomposable via `skewBuckets`) bounds every group to `budget`
   * rows before the sequential window sees them, which keeps the one
   * serialized task bounded by the budget rather than by the hot domain's
   * size. Rows with tokens ≤ 0 are dropped first (they would ride for free
   * and break the ≥ 1 token bound the pre-cap relies on).
   */
  def tokenBudgetPerGroup(df: DataFrame, keyCol: String, groupCol: String,
                          tokensCol: String, budget: Long,
                          salt: String = "", skewBuckets: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val positive = df.filter(col(tokensCol) > 0)
    val bounded =
      if (budget <= Int.MaxValue)
        capPerGroup(positive, keyCol, groupCol, budget.toInt, salt, skewBuckets)
      else positive // a > 2^31 budget admits any group whole; no pre-cap needed
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hexBucket(col(keyCol), salt), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bounded
      .withColumn("__tok_before",
        coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
      .filter(col("__tok_before") < budget)
      .drop("__tok_before")
  }

  /**
   * Adds a `split` column partitioning rows into train/valid/test by hash
   * range — disjoint, exhaustive, and stable under appends: a row's split
   * never changes when the corpus grows, the property that keeps eval sets
   * uncontaminated across dataset versions.
   */
  def withSplit(df: DataFrame, keyCol: String,
                trainFraction: Double = 0.8, validFraction: Double = 0.1,
                salt: String = ""): DataFrame = {
    require(trainFraction + validFraction <= 1.0, "train+valid must be <= 1")
    val b = hexBucket(col(keyCol), salt)
    df.withColumn("split",
      when(b < lit(hexThreshold(trainFraction)), "train")
        .when(b < lit(hexThreshold(trainFraction + validFraction)), "valid")
        .otherwise("test"))
  }
}
