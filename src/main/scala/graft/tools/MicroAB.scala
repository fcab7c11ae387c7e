package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.text.TextAnalysis

/** Micro A/B: stagewise cost of the MinHash sketch pipeline over the 10×
  * near-dup corpus, portable (md5-60) vs production (xxhash64) hashing —
  * isolates which expression the sketch second actually goes to. */
object MicroAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the CANONICAL corpus builder (r14 advice: the hand-rolled copy here
    // had already drifted — suffix concat vs the per-token rewrite — so the
    // tool was measuring a different workload than the declared queries)
    val corpus = graft.coverage.LlmOpQueries.nearDupCorpus10x(spark, sfDir)
    println(s"corpus rows: ${corpus.count()}")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String, df: DataFrame, reps: Int = 5): Unit = {
      run(df)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(df); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-34s min=${ts.head}%.3f p50=${ts(reps / 2)}%.3f")
    }

    val toks = corpus.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val sh = toks.select(col("doc_id"), Dedup.shinglesOfTokens(col("toks")).as("sh"))
    time("tokens", toks)
    time("tokens+shingles", sh)
    time("sh+xxhash64", sh.select(col("doc_id"), transform(col("sh"), x => xxhash64(x)).as("h")))
    time("sh+md5", sh.select(col("doc_id"), transform(col("sh"), x => md5(x)).as("h")))
    time("sh+portableHash60", sh.select(col("doc_id"), transform(col("sh"), x => Dedup.portableHash60(x)).as("h")))
    time("sig32 xxhash", sh.select(col("doc_id"),
      graft.expressions.SketchExpressions.minhash_signature(
        transform(col("sh"), x => xxhash64(x)), 32).as("sig")))
    time("sig32 portable", sh.select(col("doc_id"),
      graft.expressions.SketchExpressions.minhash_signature(
        transform(col("sh"), x => Dedup.portableHash60(x)), 32).as("sig")))
    // band rows on top (portable band key = raw comma-joined strings)
    val sigP = sh.select(col("doc_id").as("id"), col("sh"),
      graft.expressions.SketchExpressions.minhash_signature(
        transform(col("sh"), x => Dedup.portableHash60(x)), 32).as("sig"))
    time("sig32 portable + bandstr", sigP.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4)))))))
    spark.stop()
  }
}
