package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 (Okapi) relevance scoring of a corpus against a fixed term query —
 * the lexical-retrieval primitive of data-curation search ("pull the
 * documents most relevant to this probe query" for targeted corpus audits,
 * eval-set mining, or quality-by-topic sampling). Beyond the reference,
 * which has no text-retrieval surface at all.
 *
 * Formula (standard Okapi, e.g. Robertson & Zaragoza 2009):
 *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
 *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
 *
 * Plan shape, 100 TB first:
 * - Scoring is a NARROW per-document pass: the token array is computed once
 *   per row and each query term's tf is an `array filter + size` over it —
 *   no explode, no (doc, term) row blow-up, no shuffle. Query terms are a
 *   handful of literals, so the per-term columns stay inside whole-stage
 *   codegen.
 * - Corpus statistics (N, avgdl, one df per term) ride as ONE scalar
 *   subquery producing a single struct value: the stats aggregation runs
 *   inside every execution as its own subquery stage (one extra corpus
 *   scan — the honest prepared-statement boundary, nothing precomputed),
 *   and the resulting ~few-hundred-byte struct ships once per task, never
 *   per row (the broadcast-join-copy pathology recorded in NOTES_r6 §5).
 * - Top-k consumption composes as `orderBy(desc).limit(k)` →
 *   TakeOrderedAndProject: per-partition heaps, no global sort.
 *
 * Cross-engine determinism: tf/df/N are exact integers; the only float
 * steps are the final per-term ratio and `ln`, rounded to `roundTo`
 * decimals (same pattern as [[LmScore]] — absorbs last-ulp libm and
 * summation-order differences while certifying every meaningful digit).
 */
object Bm25 {

  /**
   * Per-document BM25 scores for `queryTerms` (matched against the
   * lower-cased whitespace tokens of `textCol`): (idCol, n_terms_matched,
   * bm25). Documents matching no term score 0.0 and are kept — the caller
   * chooses between audit mode (full distribution) and retrieval mode
   * (`.filter($"n_terms_matched" > 0)` or top-k).
   */
  def scoreAgainstTerms(df: DataFrame, idCol: String, textCol: String,
                        queryTerms: Seq[String],
                        k1: Double = 1.2, b: Double = 0.75,
                        roundTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val terms = queryTerms.map(_.toLowerCase)
    require(terms.distinct == terms, "query terms must be distinct")
    import org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery

    def tf(toks: Column, term: String): Column =
      coalesce(size(filter(toks, x => x === lit(term))), lit(0))

    def withTfs(in: DataFrame): DataFrame = {
      val toks = TextAnalysis.tokens(col(textCol))
      val dl = TextAnalysis.tokenCount(col(textCol)).cast("double").as("__dl")
      val tfs = terms.zipWithIndex.map { case (t, i) => tf(toks, t).as(s"__tf$i") }
      in.select(col("*") +: dl +: tfs: _*)
    }

    // One struct-valued scalar subquery: N, avgdl, df per term. Exact
    // integer stats; avgdl is the only float (identical aggregate in the
    // oracle).
    val statsRow = withTfs(df).agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("__dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).cast("double").as(s"df$i"))): _*)
      .select(struct(
        col("n_docs") +: col("avgdl") +:
          terms.indices.map(i => col(s"df$i")): _*))
    val stats = scalarSubquery(statsRow)

    val nDocs = stats.getField("n_docs")
    val avgdl = stats.getField("avgdl")
    val perTerm = terms.indices.map { i =>
      val tfc = col(s"__tf$i").cast("double")
      val dfc = stats.getField(s"df$i")
      val idf = log(lit(1.0) + (nDocs - dfc + 0.5) / (dfc + 0.5))
      when(col(s"__tf$i") > 0,
        idf * (tfc * (k1 + 1.0)) /
          (tfc + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / avgdl)))
        .otherwise(0.0)
    }
    val matched = terms.indices
      .map(i => (col(s"__tf$i") > 0).cast("int")).reduce(_ + _)

    withTfs(df).select(
      col(idCol),
      matched.cast("long").as("n_terms_matched"),
      round(perTerm.reduce(_ + _), roundTo).as("bm25"))
  }
}
