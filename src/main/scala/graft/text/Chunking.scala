package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document chunking — split long documents into fixed-token windows with a
 * stride (overlap = chunkSize − stride), the preprocessing step that turns
 * a corpus into context-window-sized training/retrieval units.
 *
 * Windowing rule: starts are 1, 1+stride, 1+2·stride, …, continuing while
 * the previous window has not yet covered the document's end — i.e. the
 * start sequence stops at `max(len − chunkSize, 0) + stride`. Every token
 * is covered, the final window may be short, and a document never emits a
 * window that begins past its end.
 *
 * Scale shape: a narrow per-row transform + one posexplode — NO shuffle;
 * at 100 TB chunking runs at scan speed and the output count is
 * len/stride-linear. The DuckDB oracle replays the start arithmetic and
 * list slicing exactly.
 */
object Chunking {

  /** Array of (chunk_text, n_tokens) structs for a token array. */
  def chunksOf(toks: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(stride > 0 && stride <= chunkSize,
      "stride must be in [1, chunkSize] (stride > chunkSize would skip tokens)")
    val len = size(toks)
    val starts = sequence(lit(1),
      greatest(len - chunkSize, lit(0)) + stride, lit(stride))
    transform(starts, st => struct(
      concat_ws(" ", slice(toks, st, lit(chunkSize))).as("chunk_text"),
      least(lit(chunkSize), len - st + 1).as("n_tokens")))
  }

  /** One row per (document, window): `(idCol, chunk_idx, chunk_text,
    * n_tokens)`, chunk_idx 1-based in document order. Null/empty/blank
    * documents emit ZERO rows (r11 review): `tokens("")` is `[""]`, so the
    * unguarded window arithmetic produced one phantom ("", n_tokens = 1)
    * chunk per blank doc, silently corrupting downstream token accounting. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, stride: Int): DataFrame =
    df.select(col(idCol),
        posexplode(when(TextAnalysis.tokenCount(col(textCol)) > 0,
            chunksOf(TextAnalysis.tokens(col(textCol)), chunkSize, stride))
          .otherwise(array().cast(
            "array<struct<chunk_text:string,n_tokens:int>>")))
          .as(Seq("i", "c")))
      .select(col(idCol), (col("i") + 1).as("chunk_idx"),
        col("c.chunk_text").as("chunk_text"),
        col("c.n_tokens").as("n_tokens"))
}
