package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language identification, and document
 * fingerprinting. All pure `Column` expressions (whole-stage codegen'd, no
 * UDFs) — each scales as a narrow per-row map over the corpus.
 */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased text — one imperative pass
    * ([[graft.expressions.WhitespaceTokensExpr]], r15), bit-identical to the
    * `split(trim(lower(text)), "\\s+")` chain kept below as [[tokensHof]]
    * (TokensExprSpec pins the equivalence over adversarial whitespace; the
    * DuckDB oracles replay the chain's semantics in SQL). */
  def tokens(text: Column): Column =
    graft.expressions.SketchExpressions.tokens_ws(text)

  /** The operator chain [[tokens]] replaced in r15 — kept as the equivalence
    * oracle for TokensExprSpec: the one-pass expression must stay
    * bit-identical to this chain, whose semantics every external replay
    * (DuckDB oracle SQL) implements. The chain pays a lowercase copy, a
    * UTF-16 toString, a regex-engine scan and a per-field re-encode per row
    * — measured r14/r15 as the leading per-row scalar on every text path. */
  private[graft] def tokensHof(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count of a precomputed token array (blank/null text
    * → 0: `tokens("")` is the single-element `[""]`, so the text-side guard
    * is still required). */
  def tokenCountOf(text: Column, toks: Column): Column =
    when(trim(text) === "" || text.isNull, 0).otherwise(size(toks))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = tokenCountOf(text, tokens(text))

  /**
   * BPE-ish token count: word pieces + standalone punctuation
   * (`\w+|[^\w\s]` occurrences) — the usual cheap proxy for LLM token counts.
   */
  def bpeIshTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[\\w]+|[^\\w\\s]")), lit(0))

  /** English-ish stopwords used by the quality score (deterministic literal set). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this")

  /** Stopword fraction of a precomputed token array (0.0 when `nToks` is 0)
    * — the ONE definition of the metric (r11 review: [[qualityMetrics]] and
    * [[FilterCascade.gopherRecipe]] each carried an identical private copy,
    * which could silently drift and make the audit metric and the filter
    * decision disagree). */
  def stopwordRatioOf(toks: Column, nToks: Column): Column =
    when(nToks > 0,
      graft.expressions.SketchExpressions.count_in_set(toks, stopwords)
        .cast("double") / nToks)
      .otherwise(0.0)

  /**
   * Quality metrics: char/token counts, mean token length, stopword ratio,
   * punctuation ratio, uppercase ratio — the length/punct/stopword heuristics
   * of C4/Gopher-style filters, plus a combined [0,1] score.
   */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    // tokenCount semantics, not a bare size() (r11 review): tokens("") is
    // [""], so the unguarded count reported n_tokens = 1 for blank docs —
    // internally contradictory with n_chars = 0 and with tokenCount in this
    // same file. (The derived ratios already guarded on nToks > 0.)
    val nToks = when(t.isNull || trim(t) === "", lit(0)).otherwise(size(toks))
    df
      .withColumn("n_chars", length(t))
      .withColumn("n_tokens", nToks)
      .withColumn("mean_token_len",
        when(nToks > 0, (length(regexp_replace(trim(t), "\\s+", "")).cast("double")) / nToks)
          .otherwise(0.0))
      .withColumn("stopword_ratio", stopwordRatioOf(toks, nToks))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          coalesce(regexp_count(t, lit("[^\\w\\s]")), lit(0)).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("upper_ratio",
        when(length(t) > 0,
          coalesce(regexp_count(t, lit("[A-Z]")), lit(0)).cast("double") / length(t))
          .otherwise(0.0))
      .withColumn("quality_score",
        // in-range indicators, Gopher-flavored: each contributes 0.25
        (when(col("n_tokens").between(10, 100000), 0.25).otherwise(0.0) +
         when(col("mean_token_len").between(2.0, 12.0), 0.25).otherwise(0.0) +
         when(col("stopword_ratio") > 0.01, 0.25).otherwise(0.0) +
         when(col("punct_ratio") < 0.3, 0.25).otherwise(0.0)))
  }

  /**
   * n-gram-heuristic language ID: score each candidate language by its
   * marker-token hit count; argmax wins, ties broken by language code order.
   * Markers are tiny high-frequency function-word sets — the classic cheap
   * n-gram/stopword language detector. Returns 'und' when nothing matches.
   */
  val languageMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "por", "con", "una"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "que", "une", "pour", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "von"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这", "中", "不"))

  /** One pass over the tokens via [[graft.expressions.LanguageIdExpr]]: the
    * per-language `filter(toks, array_contains(markers, tk))` formulation
    * evaluated interpreted — |langs| × |tokens| × |markers| expression-tree
    * walks per document. */
  def languageId(text: Column): Column = languageIdOfTokens(tokens(text))

  /** [[languageId]] over a precomputed token array — stage `tokens(text)`
    * once per pipeline and pass it here (see [[FilterCascade.gopherRecipe]]). */
  def languageIdOfTokens(toks: Column): Column =
    graft.expressions.SketchExpressions.language_id(
      toks, languageMarkers.toSeq)

  /**
   * Document fingerprint: content-defined rolling-hash flavor — the minimum
   * 64-bit hash over 3-token shingles (a 1-permutation MinHash). Two documents
   * sharing their rarest shingle collide; robust to small edits at the ends.
   */
  def fingerprintOfTokens(toks: Column): Column =
    // one-pass shingles (r14) + one-pass xxhash64 array (r15; the transform
    // lambda evaluated interpreted per shingle); the min is invariant to the
    // expression's array_distinct semantics — duplicate shingles share a hash
    array_min(graft.expressions.SketchExpressions.xxhash64_array(
      graft.expressions.SketchExpressions.shingles_of_tokens(toks, 3)))

  /** Convenience for tiny frames. For scale, stage `tokens(text)` into its
    * own column first (see [[graft.operators.Dedup.shinglesOfTokens]]). */
  def fingerprint(text: Column): Column = fingerprintOfTokens(tokens(text))

  /**
   * Gopher-style repetition metrics over word n-grams (the "repetitious
   * documents are low quality" family of filters): per document, the
   * fraction of n-gram occurrences that are repeats of an earlier
   * occurrence (`dup_ngram_frac`), and the fraction taken by the single
   * most frequent n-gram (`top_ngram_frac`). A narrow shuffle-free per-row
   * map over the corpus. Both fractions derive from one
   * [[graft.expressions.TermCountsExpr]] pass over the n-gram array
   * (distinct count = map size, top frequency = max map value) — O(total)
   * per row, replacing the O(distinct × total) interpreted
   * `transform(distinct, g => count(filter))` formulation.
   */
  def repetitionMetrics(df: DataFrame, textCol: String, n: Int = 2): DataFrame =
    repetitionMetricsOfTokens(df, tokens(col(textCol)), n)

  /** [[repetitionMetrics]] over a precomputed token expression — lets a
    * cascade that also needs the tokens elsewhere tokenize ONCE
    * (r12 review: [[FilterCascade.gopherRecipe]] was re-splitting the full
    * text four times per row across its metrics). */
  def repetitionMetricsOfTokens(df: DataFrame, toks: Column,
                                n: Int = 2): DataFrame = {
    // internal names are __rm_-prefixed so a caller-staged token column
    // (e.g. gopherRecipe's __toks) is never captured by the drop below
    val staged = df
      .withColumn("__rm_toks", toks)
      .withColumn("__rm_grams", graft.expressions.SketchExpressions
        .ngrams_of_tokens(col("__rm_toks"), n, emitShortDoc = true))
      .withColumn("__rm_gmap",
        graft.expressions.SketchExpressions.term_counts(col("__rm_grams")))
      .withColumn("__rm_gcounts", map_values(col("__rm_gmap")))
      .withColumn("__rm_gentries", map_entries(col("__rm_gmap")))
    // Character-mass twins (r12 review): the published Gopher thresholds
    // (Rae et al. Table A1) are defined over CHARACTERS, not gram slots —
    // a document whose duplicated grams are long words carries more
    // character mass than gram-count mass. Mass of gram g = count(g) ×
    // length(g) over the occurrence stream (the paper's doc-char
    // denominator is ill-defined for overlapping grams; the occurrence
    // mass is the self-consistent reproduction — deviation documented).
    // The count fractions stay primary (the cascade thresholds were tuned
    // to them); both families ride the same one term_counts pass.
    def mass(e: Column): Column =
      e.getField("value").cast("long") * length(e.getField("key")).cast("long")
    val totalMass = aggregate(col("__rm_gentries"), lit(0L), (acc, e) => acc + mass(e))
    val dupMass = aggregate(col("__rm_gentries"), lit(0L),
      (acc, e) => acc + when(e.getField("value") > 1, mass(e)).otherwise(lit(0L)))
    val topMass = coalesce(
      array_max(transform(col("__rm_gentries"), e => mass(e))), lit(0L))
    staged
      .withColumn("n_ngrams", size(col("__rm_grams")))
      .withColumn("dup_ngram_frac",
        when(col("n_ngrams") > 0,
          (col("n_ngrams") - size(col("__rm_gcounts"))).cast("double")
            / col("n_ngrams"))
          .otherwise(0.0))
      .withColumn("top_ngram_frac",
        when(col("n_ngrams") > 0,
          array_max(col("__rm_gcounts")).cast("double") / col("n_ngrams"))
          .otherwise(0.0))
      .withColumn("__rm_total_mass", totalMass)
      .withColumn("dup_ngram_char_frac",
        when(col("__rm_total_mass") > 0,
          dupMass.cast("double") / col("__rm_total_mass"))
          .otherwise(0.0))
      .withColumn("top_ngram_char_frac",
        when(col("__rm_total_mass") > 0,
          topMass.cast("double") / col("__rm_total_mass"))
          .otherwise(0.0))
      .drop("__rm_toks", "__rm_grams", "__rm_gmap", "__rm_gcounts",
        "__rm_gentries", "__rm_total_mass")
  }

  /**
   * PII redaction patterns, applied in order (emails before URLs is
   * irrelevant for disjoint matches but the order is part of the contract —
   * any engine replaying these patterns in sequence produces identical
   * output; all four are plain RE2-and-Java-regex-compatible). Each is the
   * conventional training-data scrub shape: emails, URLs, North-American
   * phone numbers, dotted-quad IPs.
   */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b" -> "<IP>")

  /** Redact PII spans with typed placeholders — a narrow, codegen'd chain of
    * `regexp_replace`, no shuffle: at 100 TB this runs at scan speed. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-category PII match counts (for corpus audits / drop thresholds). */
  def piiCounts(df: DataFrame, textCol: String): DataFrame =
    Seq("email" -> piiPatterns(0)._1, "url" -> piiPatterns(1)._1,
      "phone" -> piiPatterns(2)._1, "ip" -> piiPatterns(3)._1)
      .foldLeft(df) { case (d, (name, pat)) =>
        d.withColumn(s"n_$name", coalesce(regexp_count(col(textCol), lit(pat)), lit(0)))
      }

  /**
   * Per-document salient terms: the k terms with the highest in-document
   * frequency, rarest-in-corpus first among ties — a tf-idf ranking
   * expressed entirely in integers (tf DESC, document-frequency ASC, term
   * ASC), so the selection is exactly reproducible across engines with no
   * floating-point log in the comparison path.
   *
   * Scale shape: tf is computed entirely map-side by
   * [[graft.expressions.TermCountsExpr]] (one imperative pass per document
   * building `map<term, count>`), so the plan never shuffles token
   * occurrences — the explode emits one row per DISTINCT (doc, term) pair
   * with tf already final. Document frequency is then a `count` window over
   * the term (tf has exactly one row per (doc, term), so rows-per-term IS
   * the distinct-doc count) and the ranking a `row_number` window over the
   * doc: two exchanges total, both moving deduplicated pairs, versus the
   * four of the explode→groupBy→groupBy→join formulation.
   */
  def salientTerms(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame = {
    val tf = df
      .select(col(idCol),
        explode(graft.expressions.SketchExpressions
          .term_counts(tokens(col(textCol)))).as(Seq("term", "tf")))
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("__rk", row_number().over(wDoc))
      .filter(col("__rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("__rk").as("rank"))
  }

  /** All analyses as one projection over (idCol, textCol). */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityMetrics(df, textCol)
      .withColumn("bpe_ish_tokens", bpeIshTokenCount(col(textCol)))
      .withColumn("lang_id", languageId(col(textCol)))
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("fingerprint", fingerprintOfTokens(col("__toks")))
      .select(col(idCol), col("n_chars"), col("n_tokens"), col("bpe_ish_tokens"),
        col("mean_token_len"), col("stopword_ratio"), col("punct_ratio"),
        col("upper_ratio"), col("quality_score"), col("lang_id"), col("fingerprint"))
}
