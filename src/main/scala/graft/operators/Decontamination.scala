package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/**
 * Train-set decontamination: measure word-shingle overlap between a training
 * corpus and an evaluation corpus, so benchmark passages leaking into
 * training data can be found and dropped — the k-gram-overlap check the
 * large-LM training pipelines run before every pretraining job.
 *
 * Scale shape (the 100 TB case): the eval side — benchmarks, typically
 * 10³-10⁶ short documents — reduces to a DISTINCT shingle set and is
 * broadcast; the training corpus then streams through a narrow
 * explode + broadcast-join + re-aggregate pipeline keyed on its own doc id:
 * only (doc_id, shingle) pairs exist in flight and the one shuffle is the
 * per-doc count aggregation (partial map-side combine applies). The train
 * corpus is never collected, re-read, or joined against itself. If the eval
 * set ever outgrows broadcast, remove the hint and the same plan degrades
 * gracefully to a shuffled join on the shingle key.
 */
object Decontamination {

  /** (idCol, shingle) rows, one per DISTINCT k-token shingle per document.
    * Tokens are staged as a materialized column first — see
    * [[Dedup.shinglesOfTokens]] for why inline subtrees inside
    * higher-order functions are O(len²) traps. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        explode(Dedup.shinglesOfTokens(col("__toks"), k)).as("shingle"))

  /**
   * Per-training-document contamination report: total distinct shingles,
   * how many also occur anywhere in the eval corpus, and their ratio.
   * Deterministic (no sketches), so exactly reproducible by any engine —
   * the driver query's DuckDB oracle replays it verbatim.
   */
  def contaminationReport(train: DataFrame, evalCorpus: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 3): DataFrame = {
    val evalShingles = shingleRows(evalCorpus, idCol, textCol, k)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    // left join against the deduplicated eval set cannot multiply rows, so
    // one pass computes both the denominator and the overlap count
    shingleRows(train, idCol, textCol, k)
      .join(broadcast(evalShingles), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_overlap"))
      .withColumn("contamination",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /**
   * [[contaminationReport]] with a Bloom-filter pre-filter — the path for
   * when the eval shingle set outgrows an exact broadcast (a full benchmark
   * suite can run to 10⁸⁺ distinct shingles; a 1% -fpp Bloom filter holds
   * 10⁸ entries in ~120 MB where the exact string set needs many GB).
   *
   * Plan shape: the filter is built distributed (`stat.bloomFilter`
   * aggregates per-partition filters and merges — only the fixed-size bit
   * array ever reaches the driver) and ships to executors inside the
   * expression via the per-stage task-binary broadcast. The train corpus
   * then streams through ONE pass (round 7 — the pre-r7 shape exploded it
   * twice, once for the denominator and once for the overlap branch, and
   * stitched them with an outer join): the Bloom probe nulls out every
   * non-candidate's JOIN KEY, and null keys never probe the exact join's
   * hash table — so the expensive membership lookups shrink from
   * |train shingles| to |survivors| (true overlaps plus the fpp tail)
   * while the same rows still feed the denominator count. The exact join
   * kills false positives. With survivors small the exact join can stay a
   * broadcast here; if the eval set ever outgrows broadcast, don't just
   * swap in a shuffled join — hash partitioning sends every null key to
   * ONE reducer — split the non-candidates out first (they need no join),
   * shuffle only the survivors, and re-aggregate the two legs.
   *
   * The Bloom stage is a PRE-FILTER only: false positives are removed by
   * the exact join, so the output is row-for-row identical to
   * [[contaminationReport]] — the same DuckDB oracle certifies both, and
   * DecontaminationSpec pins bloom ≡ exact.
   */
  def contaminationReportBloom(train: DataFrame, evalCorpus: DataFrame,
                               idCol: String, textCol: String,
                               k: Int = 3,
                               expectedEvalShingles: Long = 1L << 20,
                               fpp: Double = 0.01): DataFrame = {
    val evalShingles = shingleRows(evalCorpus, idCol, textCol, k)
      .select(col("shingle")).distinct()
    val bf = evalShingles.stat.bloomFilter("shingle", expectedEvalShingles, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // Bloom has no false negatives, so a non-candidate can never be an
    // eval member: nulling its key loses nothing, and a left join on a
    // null key matches nothing while the row still counts below
    shingleRows(train, idCol, textCol, k)
      .withColumn("__k", when(graft.expressions.SketchExpressions
        .bloom_might_contain(col("shingle"), bytes), col("shingle")))
      .join(broadcast(evalShingles.select(col("shingle").as("__k"))
        .withColumn("__hit", lit(1))), Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).as("n_overlap"))
      .withColumn("contamination",
        col("n_overlap").cast("double") / col("n_shingles"))
  }

  /** The training rows whose contamination exceeds `maxContamination` —
    * the drop list a pipeline feeds back into an anti-join. */
  def contaminatedIds(train: DataFrame, evalCorpus: DataFrame,
                      idCol: String, textCol: String,
                      k: Int = 3, maxContamination: Double = 0.5): DataFrame =
    contaminationReport(train, evalCorpus, idCol, textCol, k)
      .filter(col("contamination") > maxContamination)
      .select(col(idCol))
}
