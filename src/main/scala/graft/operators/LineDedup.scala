package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
 * Scale shape — two wide exchanges, both unavoidable in any formulation:
 *   1. hash-partition on the line key to find each line's global first
 *      occurrence (one `row_number` per line group, no self-join, map-side
 *      nothing to combine but also nothing quadratic);
 *   2. hash-partition back on the document id to reassemble.
 * With `hashedKeys` (the 100 TB default) exchange 1 carries
 * (xxhash64(line), doc, pos) — 8-byte keys instead of full line text — and
 * the surviving (doc, pos) winners join back onto a narrow re-explode of
 * the corpus to pick up the text for reassembly; the join key (doc, pos) is
 * unique on both sides. `hashedKeys = false` partitions on the raw line so
 * an external engine can replay the query exactly (the DuckDB oracle does;
 * a spec pins hashed ≡ exact). A 64-bit key collides two DIFFERENT lines
 * with birthday probability ~n²/2⁶⁵ — at ~2³² distinct lines (~4 billion)
 * collisions appear and each one wrongly drops a line; at that corpus size
 * either accept the ~ppb text loss or switch to the exact mode's full-line
 * keys at double shuffle width.
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

    // global first occurrence per distinct line; bypassed lines always win
    val lineKey = if (hashedKeys) xxhash64(col("__line")) else col("__line")
    val w = Window.partitionBy(col("__key")).orderBy(col("__doc"), col("__pos"))
    val ranked =
      (if (hashedKeys)
        lines.select(col("__doc"), col("__pos"), bypass.as("__bypass"),
          lineKey.as("__key"))                      // 8-byte keys, no text
      else
        lines.select(col("__doc"), col("__pos"), bypass.as("__bypass"),
          lineKey.as("__key"), col("__line")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__bypass") || col("__rn") === 1)

    val kept =
      if (hashedKeys)
        // (doc, pos) is unique: re-explode narrowly and join text back on it
        ranked.select("__doc", "__pos")
          .join(lines, Seq("__doc", "__pos"))
      else ranked.select("__doc", "__pos", "__line")

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
