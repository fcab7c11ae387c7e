package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch same-JVM interleaved A/B for round-8 verdict item 3 (deleted
  * after the experiment; numbers land in NOTES_r8.md). Variant A = current
  * shape, variant B = candidate. Interleaved A,B,A,B… over N rounds, min +
  * p50 per variant — the only timing signal this noisy host respects. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = args.headOption.getOrElse("hll")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def hllRollup(hint: Boolean): DataFrame = {
      val ev = graft.coverage.OperatorQueries.T(spark, sfDir, "events")
        .select(col("ts").cast("date").as("d"), hour(col("ts")).as("h"),
          col("user_id"))
      val hourly = ev.groupBy("d", "h")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val daily = hourly.groupBy("d")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("__est"))
      val exact = ev.groupBy("d")
        .agg(count_distinct(col("user_id")).as("n_exact"))
      exact.join(if (hint) broadcast(daily) else daily, Seq("d"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("event_date"),
          col("n_exact"),
          (abs(col("__est") - col("n_exact")) / col("n_exact") <= 0.08)
            .as("within_bound"))
        .coalesce(1).sortWithinPartitions(col("event_date"))
    }

    import org.apache.spark.sql.expressions.Window

    // w_sessionize_salted with phase 1 (local per-(key,bucket) sessions)
    // computed as a session_window AGGREGATION instead of sort+window+agg
    def saltedSessionWindow(): DataFrame = {
      val keyCol = "user_id"; val tsCol = "ts"
      val gapSeconds = 4L * 3600; val bucketSpanSeconds = 24L * 3600
      val df = graft.coverage.OperatorQueries.T(spark, sfDir, "events")
      val bk = (unix_micros(col(tsCol)) / lit(bucketSpanSeconds * 1000000L))
        .as("__bk")
      val local = df.withColumn("__bk", bk)
        .groupBy(col(keyCol), col("__bk"),
          session_window(col(tsCol), s"$gapSeconds seconds"))
        .agg(count(lit(1)).as("n_events"),
          min(tsCol).as("session_start"), max(tsCol).as("session_end"))
        .drop("session_window", "__bk")
      val w2 = Window.partitionBy(keyCol).orderBy(col("session_start"))
      val prevEnd = lag(unix_micros(col("session_end")), 1).over(w2)
      val isNewSess = when(prevEnd.isNull ||
        unix_micros(col("session_start")) - prevEnd >= gapSeconds * 1000000L, 1L)
        .otherwise(0L)
      local
        .withColumn("session_seq", sum(isNewSess).over(
          w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col(keyCol), col("session_seq"))
        .agg(sum("n_events").as("n_events"),
          min("session_start").as("session_start"),
          max("session_end").as("session_end"))
        .withColumn("duration_us",
          unix_micros(col("session_end")) - unix_micros(col("session_start")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          max("n_events").as("max_session_events"),
          max("duration_us").as("max_session_duration_us"))
        .repartition(1).sortWithinPartitions(col("user_id"))
    }

    def saltedCurrent(): DataFrame =
      graft.operators.Sessionize
        .sessionStatsSalted(graft.coverage.OperatorQueries.T(spark, sfDir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 4L * 3600,
          bucketSpanSeconds = 24L * 3600)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("n_events"),
          max("n_events").as("max_session_events"),
          max("duration_us").as("max_session_duration_us"))
        .repartition(1).sortWithinPartitions(col("user_id"))

    def dsir(share: Boolean): DataFrame =
      graft.operators.Dedup.persistTracked(
        graft.text.Dsir.importanceScores(
          graft.coverage.LlmOpQueries.docs(spark, sfDir), "doc_id", "text",
          targetPred = col("lang") === "en", tau = 0.0, k = 0.5,
          shareTokenize = share))
        .orderBy("doc_id")

    // t_lm_perplexity: A = r7's single merged-chain model subquery;
    // B = the three-subquery relational model (bigram map, prefix map,
    // vocab row CONCURRENT — the shape that wins for Dsir's two models)
    def lm(merged: Boolean): DataFrame = {
      val d = graft.coverage.LlmOpQueries.docs(spark, sfDir)
      val model = graft.text.LmScore.train(
        d.filter(col("lang") === "en"), "text", minCount = 1L)
      val m = if (merged) model else model.copy(combined = None)
      graft.operators.Dedup.persistTracked(
        graft.text.LmScore.score(d, "doc_id", "text", m, k = 0.5,
          maxNll = 3.40)).orderBy("doc_id")
    }

    val (a, b): (() => DataFrame, () => DataFrame) = which match {
      case "hll" => (() => hllRollup(false), () => hllRollup(true))
      case "salted" => (() => saltedCurrent(), () => saltedSessionWindow())
      case "dsir" => (() => dsir(false), () => dsir(true))
      case "lm" => (() => lm(true), () => lm(false))
      case other => sys.error(s"unknown experiment $other")
    }

    val reset = sys.env.get("SPARK_GRAFT_RESET").contains("true")
    def run(mk: () => DataFrame): Double = {
      if (reset) graft.coverage.LlmOpQueries.resetDerivedCaches()
      val df = mk()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    run(a); run(b)
    val n = 10
    val ta = collection.mutable.ArrayBuffer[Double]()
    val tb = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) { ta += run(a); tb += run(b) }
    def stats(ts: Seq[Double]) =
      f"min=${ts.min}%.3f p50=${ts.sorted.apply(ts.size / 2)}%.3f"
    println(s"A(current): ${stats(ta.toSeq)}")
    println(s"B(candidate): ${stats(tb.toSeq)}")
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("true")) {
      println("==== A plan ===="); a().explain("formatted")
      println("==== B plan ===="); b().explain("formatted")
    }
    spark.stop()
  }
}
