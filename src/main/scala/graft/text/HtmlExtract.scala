package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction — the boilerplate-strip step that turns crawled
 * pages into trainable text (the WET-file transform of a web-corpus
 * pipeline). Deliberately regex-based, not a DOM parser: the pipeline
 * contract is a deterministic, engine-replayable transform that runs at
 * scan speed (a narrow codegen'd `regexp_replace` chain, no shuffle, no
 * UDF), and the DuckDB oracle replays the exact same chain, so every
 * pattern and its order is part of the certified semantics.
 *
 * Order matters twice and both orders are load-bearing:
 *  - script/style/comment BLOCKS go first (their bodies may contain `<`
 *    that is not markup; removing tags first would leak JS/CSS into text);
 *  - entity decode runs AFTER tag removal, with `&amp;` LAST (decoding it
 *    earlier would double-decode `&amp;lt;` into a live `<`).
 *
 * All patterns are RE2-and-Java-regex compatible (inline `(?is)` flags,
 * lazy quantifiers, no backreferences).
 */
object HtmlExtract {

  /** Container blocks whose CONTENT must be dropped, not just their tags. */
  val blockPatterns: Seq[String] = Seq(
    "(?is)<script\\b[^>]*>.*?</script>",
    "(?is)<style\\b[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** Entity decode table, applied in order; `&amp;` intentionally last. */
  val entityDecodes: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Visible text of an HTML column: blocks out, tags → space, entities
    * decoded, whitespace collapsed. */
  def extractText(html: Column): Column = {
    val noBlocks = blockPatterns.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = entityDecodes.foldLeft(noTags) {
      case (c, (entity, repl)) => replace(c, lit(entity), lit(repl))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
