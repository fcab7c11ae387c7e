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
}
