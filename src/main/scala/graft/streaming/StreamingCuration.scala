package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.text.{FilterCascade, LmScore}

/**
 * Streaming corpus curation — the continuous version of the batch
 * curation pipeline: documents arrive on a stream; each micro-batch runs
 * the heuristic filter cascade and is scored against an OFFLINE-TRAINED
 * bigram LM ([[LmScore.train]] over a reference corpus, the production
 * shape: models retrain on a schedule, the stream applies the frozen
 * model); survivors append to a curated parquet sink, rejects append to an
 * audit sink WITH their drop reason / score, so the curation log the batch
 * pipeline produces exists for streamed ingestion too.
 *
 * foreachBatch rather than raw stream operators for one load-bearing
 * reason: the LM score is an aggregation (per-doc mean over exploded
 * bigrams), which as a native stream aggregation would accrete state-store
 * entries per document forever; inside foreachBatch it is a bounded BATCH
 * aggregation over the micro-batch, with the model tables broadcast —
 * exactly the batch operator's plan, applied incrementally. Same
 * at-least-once append contract as [[StreamingDedup]] (two sinks, one
 * checkpointed source; repair = idempotent re-append + dropDuplicates on
 * the id).
 */
object StreamingCuration {

  /** One micro-batch: cascade → frozen-model LM score → split keep/drop.
    * Factored out of the closure so batch semantics are testable without a
    * streaming harness. Returns (kept, dropped-with-reason). */
  private[streaming] def curateBatch(
      batch: DataFrame, idCol: String, textCol: String,
      model: LmScore.BigramModel, maxNll: Double): (DataFrame, DataFrame) = {
    val decided = FilterCascade.gopherRecipe(batch, textCol)
    val cascadeDrop = decided.filter(!col("kept"))
      .select(col(idCol), col(textCol),
        col("drop_reason"), lit(null).cast("double").as("nll"))
    val survivors = decided.filter(col("kept"))
      .select(batch.columns.map(col): _*)
    val scored = LmScore.score(survivors, idCol, textCol, model,
      maxNll = maxNll)
    val kept = survivors.join(
      scored.filter(col("kept")).select(idCol), Seq(idCol), "left_semi")
    val lmDrop = survivors
      .join(scored.filter(!col("kept")).select(col(idCol), col("nll")),
        Seq(idCol), "inner")
      .select(col(idCol), col(textCol),
        lit("high_perplexity").as("drop_reason"), col("nll"))
    (kept, cascadeDrop.unionByName(lmDrop))
  }

  /** Start the stream: curated docs → `keptPath`, audit rows (id, text,
    * drop_reason, nll) → `droppedPath`. */
  def start(newDocs: DataFrame, idCol: String, textCol: String,
            model: LmScore.BigramModel, keptPath: String, droppedPath: String,
            checkpoint: String, maxNll: Double = 6.0,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (kept, dropped) = curateBatch(batch, idCol, textCol, model, maxNll)
        kept.write.mode("append").parquet(keptPath)
        dropped.write.mode("append").parquet(droppedPath)
      }
      .start()
}
