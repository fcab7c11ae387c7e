package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deterministic weighted corpus mixing — the domain-mixing step of a
 * pretraining data recipe ("wiki ×2.3, books ×1.0, web ×0.25"): each source
 * contributes `weight` epochs of itself to the training stream, where the
 * fractional part is a reproducible subset, and the mixed stream then goes
 * through [[Shuffling]] for a reproducible global order.
 *
 * Mechanism, per source of weight w:
 *  - `floor(w)` FULL epochs — exact copies tagged `mix_epoch = 0..floor(w)-1`
 *    (repeating data across epochs is the standard way to up-weight a small
 *    high-quality corpus);
 *  - one PARTIAL epoch (`mix_epoch = floor(w)`) holding a
 *    [[Sampling.deterministicSample]] of fraction `w - floor(w)`, salted by
 *    (source, epoch) so different sources' partial epochs and different
 *    epochs of one source are uncorrelated.
 *
 * Everything is derived from md5 of stable keys: re-running the recipe, or
 * appending to a source, never changes which existing rows are in the mix
 * (append-stable, like every sampler here). The operator itself is NARROW —
 * per-source filters and a union, no shuffle; the one wide exchange of the
 * whole pipeline happens in [[Shuffling.shuffled]] on the composite
 * (source, epoch, id) key.
 */
object Mixing {

  /**
   * Union of all sources' epochs: input columns plus (`mix_source`,
   * `mix_epoch`). Sources must share a schema; `keyCol` is the per-source
   * stable row key the fractional epochs sample on.
   *
   * `scanOnce = true` (the default, and the 100 TB shape) replicates epochs
   * with one `explode` per source instead of unioning `⌈w⌉` scans of the
   * source: a weight-2.3 source is READ ONCE and its rows generated three
   * times, where the union form re-reads the full source per epoch —
   * scan I/O is the dominant cost at scale, so epoch count must not
   * multiply it. Row multisets are IDENTICAL either way (the partial
   * epoch's hash threshold and salt are shared; MixingSpec pins parity),
   * and `scanOnce = false` remains for engines/sinks that prefer plain
   * unions of scans.
   */
  def mixCorpora(sources: Seq[(String, DataFrame, Double)],
                 keyCol: String, scanOnce: Boolean = true): DataFrame = {
    require(sources.nonEmpty, "at least one source")
    require(sources.map(_._1).distinct.size == sources.size,
      "source names must be unique")
    // ':'-free source names keep every derived composite key injective (r11
    // review): the sampling salt here and mixShuffled's `__mix_key` are
    // ':'-joined (source, epoch, key) strings — with a ':'-free source name
    // and an integer epoch the first two fields parse unambiguously, so two
    // distinct (source, epoch, key) triples can never collide even when row
    // KEYS contain ':'. Without the guard, source "s:1" epoch 0 and source
    // "s" epoch 1 could produce identical keys — identical shuffle hash AND
    // tiebreaker, i.e. nondeterministic training order on a task retry.
    sources.map(_._1).foreach(n => require(!n.contains(":"),
      s"source name '$n' must not contain ':' — it is a field in the " +
        "':'-joined sampling salt and shuffle key"))
    // loud reserved-name guard (r13 review, the Shuffling/dedupByUrl rule):
    // withColumn would silently REPLACE an input column of the same name —
    // caller data lost AND the epoch filter would read the wrong values
    val reserved = Seq("mix_source", "mix_epoch", "__mix_bucket", "__mix_key")
    sources.foreach { case (name, df, _) =>
      val clash = df.columns.filter(reserved.contains)
      require(clash.isEmpty,
        s"source $name: column(s) ${clash.mkString(", ")} collide with " +
          s"Mixing's output/scratch schema (${reserved.mkString(", ")}) — rename them")
    }
    sources.flatMap { case (name, df, w) =>
      require(w > 0.0, s"source $name: weight must be positive, got $w")
      val fullEpochs = math.floor(w).toInt
      val frac = w - fullEpochs
      val salt = s"$name:$fullEpochs:"
      if (scanOnce) {
        val nEpochs = fullEpochs + (if (frac > 1e-12) 1 else 0)
        val epochs = explode(lit((0 until nEpochs).toArray))
        Seq(
          if (frac > 1e-12) {
            // full epochs pass unconditionally; the one partial epoch keeps
            // exactly deterministicSample's rows (same salt ⇒ same subset).
            // The hash is computed BEFORE the explode — once per source row,
            // not once per row-epoch — and rides through the Generate.
            df.withColumn("mix_source", lit(name))
              .withColumn("__mix_bucket", Sampling.hexBucket(col(keyCol), salt))
              .withColumn("mix_epoch", epochs)
              .filter(col("mix_epoch") < fullEpochs ||
                col("__mix_bucket") < lit(Sampling.hexThreshold(frac)))
              .drop("__mix_bucket")
          } else
            df.withColumn("mix_source", lit(name)).withColumn("mix_epoch", epochs))
      } else {
        val fulls = (0 until fullEpochs).map { e =>
          df.withColumn("mix_source", lit(name)).withColumn("mix_epoch", lit(e))
        }
        val partial =
          if (frac > 1e-12)
            Some(Sampling
              .deterministicSample(df, keyCol, frac, salt = salt)
              .withColumn("mix_source", lit(name))
              .withColumn("mix_epoch", lit(fullEpochs)))
          else None
        fulls ++ partial
      }
    }.reduce(_ unionByName _)
  }

  /**
   * Temperature-based mixture weights — the step that COMPUTES a recipe's
   * per-source weights before [[mixCorpora]] applies them (the multilingual
   * α-sampling rule: sample source g with probability
   * q_g = p_g^α / Σ_h p_h^α where p_g is its natural share; α < 1 flattens
   * the distribution, up-weighting small sources without drowning large
   * ones — the standard knob of multilingual-pretraining recipes).
   *
   * Returns one row per group: (groupCol, n_docs, share = p, temp_share =
   * q, up_weight = q/p — the factor you hand to [[mixCorpora]]).
   *
   * Cross-engine float determinism (this feeds a hash-compared oracle):
   *  - α = 0.5 (the default) computes p^α as `sqrt`, which IEEE 754
   *    requires to be CORRECTLY ROUNDED — bit-identical in any compliant
   *    engine, unlike `pow`, which libm implementations round differently
   *    in the last ulp (other α values use `pow` and carry that caveat);
   *  - the normalizer Σ p^α is folded in GROUP-SORTED order over a
   *    collected array (groups are a handful of sources — the collect is
   *    bounded by the recipe's source count, not the corpus), because a
   *    parallel aggregate's float addition order is nondeterministic and
   *    float addition does not associate. Any engine replaying the same
   *    sorted fold reproduces every output bit (the DuckDB oracle does).
   */
  def temperatureWeights(df: DataFrame, groupCol: String,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    // the same loud guard as every sibling operator (r13 review): a
    // groupCol named like an output column would be silently REPLACED by
    // withColumn — weights with no group identity
    val twReserved = Seq("n_docs", "share", "temp_share", "up_weight",
      "__gs", "__N", "__Z")
    require(!twReserved.contains(groupCol),
      s"temperatureWeights: group column $groupCol collides with the " +
        s"output/scratch schema (${twReserved.mkString(", ")}) — rename it")
    def pa(p: org.apache.spark.sql.Column) =
      if (alpha == 0.5) sqrt(p) else pow(p, alpha)
    // NULL group keys excluded (r13 advice; the CorpusDiff/Sessionize house
    // rule): a null source label addresses no corpus, and letting it into
    // the group-sorted normalizer fold would break the documented bit-
    // reproducibility — Spark's struct-null sort position differs from SQL
    // engines' NULLS LAST, so the fold order (hence every Σ p^α bit) would
    // diverge cross-engine. Null-label rows are a DQ finding, not a source.
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val scalars = counts
      .agg(collect_list(struct(col(groupCol), col("n_docs"))).as("__gs"),
        sum("n_docs").as("__N"))
      .select(col("__N"),
        aggregate(array_sort(col("__gs")), lit(0.0), (acc, x) =>
          acc + pa(x.getField("n_docs").cast("double") /
            col("__N").cast("double"))).as("__Z"))
    counts.crossJoin(broadcast(scalars)) // 1-row scalar carrier
      .withColumn("share",
        col("n_docs").cast("double") / col("__N").cast("double"))
      .withColumn("temp_share", pa(col("share")) / col("__Z"))
      .withColumn("up_weight", col("temp_share") / col("share"))
      .drop("__N", "__Z")
  }

  /**
   * The full recipe: mix, then assign the reproducible shard-major training
   * order over the composite key — one wide exchange total. Returns the
   * mixed columns plus (`shard`, `pos`).
   */
  def mixShuffled(sources: Seq[(String, DataFrame, Double)], keyCol: String,
                  seed: String, nShards: Int,
                  scanOnce: Boolean = true): DataFrame = {
    val mixed = mixCorpora(sources, keyCol, scanOnce)
      .withColumn("__mix_key",
        concat_ws(":", col("mix_source"), col("mix_epoch"), col(keyCol)))
    // Window form deliberately: the r10 A/B measured the one-exchange
    // shuffledLocalRank variant ~10% SLOWER here (isolated min 0.56 vs
    // 0.50 s, twice, same windows) — an in-plan consumer saves no exchange
    // (the ranking exchange exists either way) and pays the local-rank
    // pass's row ser/de outside codegen. writeShuffled, whose second
    // exchange the fused form genuinely deletes, uses shuffledLocalRank.
    Shuffling.shuffled(mixed, "__mix_key", seed, nShards).drop("__mix_key")
  }
}
