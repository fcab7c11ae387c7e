package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Trained byte-pair-encoding tokenizer: the learn-merges / apply-merges
 * pair that completes the token-accounting story for packing and chunking
 * (which count whitespace tokens; a trained subword inventory is what a
 * real LM data pipeline budgets with).
 *
 * **Learn** (Sennrich-style, on the word-frequency table): the corpus is
 * reduced ONCE to `(word, count)` — the only corpus-wide shuffle — then
 * capped to the `vocabCap` most frequent words (deterministic tie-break:
 * count DESC, word ASC), and the merge loop runs on that vocab-bounded
 * table locally: each round counts adjacent symbol pairs (weighted by word
 * count, every position counted), picks the max (ties → lexicographically
 * smallest pair), and merges all its occurrences greedily left-to-right in
 * every word. This mirrors how trained tokenizers are actually produced —
 * the model is driver-side like [[graft.operators.SimilaritySearch]]'s IVF
 * centroids: bounded by construction (`vocabCap` rows), never by the
 * corpus. At 100 TB the word-count reduce is one map-side-combined shuffle
 * of (word, partial count) pairs; the cap keeps the collect constant-size.
 *
 * Words are gated to printable ASCII for training (`^[\x21-\x7e]+$`): the
 * tie-break must order identically in every engine, and ASCII is where
 * UTF-16 (JVM), UTF-8 byte (DuckDB), and code-point orders coincide — the
 * same engine-portability regime boundary as the SimHash length gate.
 * Apply ([[graft.expressions.BpeSegmentExpr]]) handles any word.
 *
 * **Apply** is a narrow per-row expression — no join against a vocabulary
 * table, no shuffle; the rank-ordered merge list rides in the plan.
 *
 * The DuckDB oracle replays BOTH halves end-to-end (generated stage SQL:
 * pair counts → argmax → islands-and-parity merge, once per rank, then the
 * same machinery applies the learned merges to every corpus word), so the
 * driver row certifies training determinism AND application — no
 * circularity, the oracle never sees Spark's merge table.
 */
object BpeTokenizer {

  /** Training words: printable-ASCII gate, see class doc. */
  val TrainableWord = "^[\\x21-\\x7e]+$"

  /** The `(word, count)` table: the one corpus-wide reduce of training. */
  def wordCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(TrainableWord))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /**
   * Learn `nMerges` merges from the corpus. Returns the rank-ordered merge
   * list (may be shorter than `nMerges` if the vocabulary exhausts —
   * every word reduced to one symbol). Deterministic: same corpus, same
   * output, any engine.
   */
  def learn(corpus: DataFrame, textCol: String,
            nMerges: Int = 24, vocabCap: Int = 2000): Seq[(String, String)] = {
    val top = wordCounts(corpus, textCol)
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(vocabCap)
      .collect()
    // symbols per code point (training words are ASCII, so = chars)
    val words: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      top.map { r =>
        val w = r.getString(0)
        (scala.collection.mutable.ArrayBuffer(w.map(_.toString): _*),
          r.getLong(1))
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count; ties -> lexicographically smallest (a, b)
        val (a, b) = pairCounts.toSeq.minBy { case ((a, b), c) =>
          (-c, a, b)
        }._1
        merges += ((a, b))
        words.foreach { case (syms, _) =>
          var out = 0
          var in = 0
          while (in < syms.length) {
            if (in + 1 < syms.length && syms(in) == a && syms(in + 1) == b) {
              syms(out) = a + b
              in += 2
            } else {
              syms(out) = syms(in)
              in += 1
            }
            out += 1
          }
          syms.remove(out, syms.length - out)
        }
        round += 1
      }
    }
    merges.toSeq
  }

  /** struct(text_bpe, n_subwords): segment a token-array column under a
    * trained merge list — narrow, plan-resident model, scan-speed. */
  def segment(tokens: Column, merges: Seq[(String, String)]): Column =
    graft.expressions.BpeExpressions.bpe_segment(tokens, merges)

  /** The learned merge table as a frame (rank, a, b) — the model artifact
    * itself, queryable/publishable like any other table. */
  def mergesFrame(spark: SparkSession,
                  merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong + 1L, a, b) }
      .toDF("rank", "a", "b")
  }

  /**
   * Per-document segmentation of `df` under a model learned from `train`:
   * (idCol, n_tokens, n_subwords, text_bpe). One narrow pass over `df`
   * after the bounded training reduce.
   */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("n_tokens"),
        segment(col("__toks"), merges).as("__seg"))
      .select(col(idCol), col("n_tokens"),
        col("__seg.n_subwords").as("n_subwords"),
        col("__seg.text_bpe").as("text_bpe"))
}
