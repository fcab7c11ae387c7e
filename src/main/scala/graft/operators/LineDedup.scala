package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cross-document exact LINE deduplication — the C4-style "keep one copy of
 * every duplicated line in the corpus" pass that strips boilerplate
 * (navigation bars, licence blocks, cookie banners) which whole-document
 * near-dup never touches: the documents differ, their lines repeat.
 *
 * Semantics: split each document on `\n`; across the whole corpus keep only
 * the FIRST occurrence of each distinct line (order = (document id, line
 * position) — deterministic and engine-portable); reassemble each document
 * from its surviving lines in original order; documents whose lines all
 * lose are dropped. Blank lines are structure, not content — they bypass
 * dedup and are always kept (`minChars` widens that bypass to short lines
 * generally, e.g. `minChars = 20` to stop deduping "Introduction").
 *
 * Scale shape: the first occurrence per line is `min(struct(doc, pos))`
 * grouped by the line key — an ordinary partial+final aggregate, NOT a
 * row_number window. The difference is what survives skew: web corpora have
 * single lines repeated billions of times ("Home"), and a window formulation
 * hash-partitions every copy of that line into ONE task's sort; the
 * aggregate collapses each partition's copies to one candidate map-side, so
 * the shuffle carries at most (distinct lines × partitions) rows no matter
 * how hot a line is. Exchanges: one on the line key (winners), one back on
 * the document id (reassembly) — plus, in hashed mode, the semi-join of
 * winner (doc, pos) pairs back onto a narrow re-explode to pick up text.
 *
 * `hashedKeys` (the 100 TB default) groups on xxhash64(line) — 8-byte keys
 * instead of full line text on the wide shuffle. A 64-bit key collides two
 * DIFFERENT lines with birthday probability ~n²/2⁶⁵ — at ~2³² distinct
 * lines (~4 billion) collisions appear and each one wrongly drops a line; at
 * that corpus size either accept the ~ppb text loss or use
 * `hashedKeys = false`, which shuffles the raw line once and needs no
 * join-back (the winner rows already carry their text). The exact mode is
 * also what an external engine replays (the DuckDB oracle does; a spec pins
 * hashed ≡ exact).
 */
object LineDedup {

  /**
   * Returns one row per SURVIVING document: (idCol, textCol deduped,
   * `n_lines` original line count, `n_lines_kept`).
   */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 minChars: Int = 1, hashedKeys: Boolean = true): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val bypass = length(trim(col("__line"))) < minChars

    // first global occurrence per distinct line: min(struct(doc, pos)) ==
    // lexicographic minimum == earliest (document, position). Partial agg
    // collapses repeated lines map-side — a billion-copy boilerplate line
    // shuffles one candidate per partition, not a billion rows into one task.
    val content = lines.filter(!bypass)
    val keptContent =
      if (hashedKeys) {
        val winners = content
          .groupBy(xxhash64(col("__line")).as("__key"))
          .agg(min(struct(col("__doc"), col("__pos"))).as("__occ"))
          .select(col("__occ.__doc").as("__doc"), col("__occ.__pos").as("__pos"))
        // (doc, pos) is unique: semi-join the winners back onto a narrow
        // re-explode to pick the text up (it never rode the wide shuffle)
        content.join(winners, Seq("__doc", "__pos"), "left_semi")
      } else {
        // exact mode: the winner rows already carry the line — no join-back
        content
          .groupBy(col("__line"))
          .agg(min(struct(col("__doc"), col("__pos"))).as("__occ"))
          .select(col("__occ.__doc").as("__doc"), col("__occ.__pos").as("__pos"),
            col("__line"))
      }

    val kept = keptContent.unionByName(lines.filter(bypass))
    kept.groupBy(col("__doc"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          "\n").as("__text"),
        count(lit(1)).as("n_lines_kept"))
      .join(
        lines.groupBy("__doc").agg(count(lit(1)).as("n_lines")), Seq("__doc"))
      .select(col("__doc").as(idCol), col("__text").as(textCol),
        col("n_lines"), col("n_lines_kept"))
  }

  /**
   * WITHIN-document line dedup — the Gopher/MassiveText intra-document
   * repetition excision (Rae et al. 2021 §A.1.2 flag `dup_line_frac`; this
   * is the REWRITE the flag motivates): inside each document, keep only the
   * first occurrence of every distinct line, preserving order. Cross-doc
   * boilerplate is [[dedupLines]]' job; this one kills the within-page
   * repetition (infinite-scroll stutter, templated list spam) that
   * document-level and corpus-level passes both leave behind.
   *
   * Lines shorter than `minChars` after trimming bypass the dedup and are
   * always kept (blank lines are structure; "minChars = 5" also spares
   * list bullets and headings that legitimately repeat).
   *
   * Scale shape: a pure PROJECTION — split → `filter((x, i) =>
   * first-index(x) == i)` → rejoin, all per-row array algebra: NO shuffle,
   * no explode, no state, and the identical formulation replays in any
   * engine with list lambdas (the DuckDB oracle does, 1-based indexes
   * there). The first-occurrence test is `array_position`, making the
   * filter O(lines²) per document — right for web pages (tens to hundreds
   * of lines, evaluated at scan speed with zero movement). Above
   * `quadraticMaxLines` the row switches to
   * [[graft.expressions.DedupLinesWithinExpr]] — ONE imperative pass with a
   * hash set, O(lines) — so a pathological million-line crawl document
   * costs milliseconds instead of stalling a task for hours (r13 verdict
   * item; a spec pins branch equality on the crossover and bounded time at
   * 10⁵ lines). Both branches are per-row projections: no shuffle, no
   * explode, no row-identity requirement on the caller's schema. Higher-
   * order array functions evaluate outside whole-stage codegen, but there
   * is no UDF and no serialization boundary — the expression tree stays in
   * Tungsten rows. (The oracle-replayable HOF branch remains the one
   * engines without imperative extensions can replay; the fixture corpus
   * sits entirely under the gate, so oracle certification exercises the
   * HOF branch and the spec pins the expression branch against it.)
   */
  def dedupLinesWithinDoc(docs: DataFrame, textCol: String,
                          minChars: Int = 1,
                          quadraticMaxLines: Int = 4096): DataFrame = {
    require(Seq("n_lines", "n_lines_kept", "__ldw_text")
        .forall(!docs.columns.contains(_)),
      "dedupLinesWithinDoc: input already carries n_lines / n_lines_kept / __ldw_text")
    require(quadraticMaxLines >= 0,
      s"dedupLinesWithinDoc: quadraticMaxLines must be >= 0, got $quadraticMaxLines")
    val arr = split(col(textCol), "\n")
    val keptArr = filter(arr, (x, i) =>
      length(trim(x)) < lit(minChars) || array_position(arr, x) === i + lit(1))
    // the size gate: CaseWhen evaluates branches lazily per row, so small
    // docs never pay the imperative pass and large docs never pay the
    // quadratic HOF. (gated appears in two output columns; like the HOF
    // formulation before it, the projection may evaluate it twice — both
    // branches are linear except the HOF one, which the gate size-bounds.)
    val gated = when(size(arr) <= lit(quadraticMaxLines),
        struct(array_join(keptArr, "\n").as("kept_text"),
          size(keptArr).as("n_kept")))
      .otherwise(graft.expressions.LineExpressions
        .dedup_lines_within(col(textCol), minChars))
    // One select resolving everything against the INPUT text, with the
    // rewrite under a TEMP name. Aliasing it straight to textCol would put
    // an alias named `textCol` in the same projection that still references
    // `textCol` — and lateral-column-alias resolution then binds the later
    // size()/filter() references inconsistently (the outer filter input to
    // the rewritten alias, the lambda's array_position to the input column:
    // observed as n_lines_kept counting a mixed-semantics array). The
    // rename afterwards is metadata-only and keeps the column position.
    docs.select(docs.columns.map {
      case c if c == textCol => gated.getField("kept_text").as("__ldw_text")
      case c => col(c)
    } :+ size(arr).cast("bigint").as("n_lines")
      :+ gated.getField("n_kept").cast("bigint").as("n_lines_kept"): _*)
      .withColumnRenamed("__ldw_text", textCol)
  }
}
