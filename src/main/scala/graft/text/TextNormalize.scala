package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.UnicodeExpressions

/**
 * Unicode text normalization — the canonicalization pass that runs BEFORE
 * tokenization/fingerprinting in a corpus pipeline, so that byte-different
 * but visually-identical text (decomposed accents, curly quotes, zero-width
 * joiners, NBSP) cannot split dedup clusters or inflate the vocabulary.
 *
 * Steps, in order (each order-dependence is real):
 *  1. Unicode NFC (composed form) — [[graft.expressions.UnicodeNormalizeExpr]];
 *  2. zero-width/BOM characters removed (they survive NFC by design);
 *  3. control characters stripped, except \n and \t (document structure);
 *  4. typographic quotes/dashes/NBSP folded to ASCII.
 *
 * Everything after the NFC expression is a literal `replace`/`regexp_replace`
 * chain — narrow, scan-speed, and replayed verbatim by the DuckDB oracle
 * (`nfc_normalize` + the same chains, generated from these Seqs).
 *
 * Special characters are constructed from hex code points, never written
 * literally — invisible code points in source are an editing hazard.
 */
object TextNormalize {

  private def cp(codePoint: Int): String =
    new String(Character.toChars(codePoint))

  /** Zero-width + BOM code points removed outright (NFC keeps them):
    * ZWSP, ZWNJ, ZWJ, BOM/ZWNBSP. */
  val zeroWidth: Seq[String] =
    Seq(0x200B, 0x200C, 0x200D, 0xFEFF).map(cp)

  /** Control characters except \t (09) and \n (0A) — RE2- and
    * Java-regex-compatible explicit ranges (no char-class intersection,
    * which RE2 lacks). \r (0D) IS stripped (r11 review: the original range
    * skipped it, so a CRLF document and its LF twin normalized to
    * byte-different outputs — exactly the cluster-splitting difference this
    * module exists to remove). The oracle SQL is generated from this same
    * constant, so both engines move together. */
  val controlPattern: String = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"

  /** Typographic → ASCII folds, applied in order: curly single/double
    * quotes, en/em dash, no-break space. */
  val asciiFolds: Seq[(String, String)] = Seq(
    0x2018 -> "'", 0x2019 -> "'",
    0x201C -> "\"", 0x201D -> "\"",
    0x2013 -> "-", 0x2014 -> "-",
    0x00A0 -> " ").map { case (c, to) => cp(c) -> to }

  /** The full normalization chain over a string column. */
  def normalizeText(c: Column, form: String = "NFC"): Column = {
    val nfc = UnicodeExpressions.unicode_normalize(c, form)
    val noZw = zeroWidth.foldLeft(nfc)((acc, z) => replace(acc, lit(z), lit("")))
    val noCtl = regexp_replace(noZw, controlPattern, "")
    asciiFolds.foldLeft(noCtl) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }
}
