package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: consecutive events of one key belong to the same
 * session while the inter-event gap stays strictly below `gapSeconds`; a gap
 * of `gapSeconds` or more opens a new session. (The strict-< merge rule is
 * Spark's `session_window` semantics — the window spans `[first, last+gap)`
 * exclusive of the right edge — so the batch path below and the built-in
 * streaming session window partition events identically; SessionizeSpec
 * asserts the equivalence.)
 *
 * Batch plan shape: one shuffle on the key, then two stacked window
 * functions over the same (key)-partitioned sort — a lag to flag session
 * starts, a running count of flags to number sessions. Catalyst plans both
 * over a single sort (same partitioning + ordering), so sessionizing 100 TB
 * costs exactly one exchange of (key, ts, id) plus per-partition sorts; no
 * self-join, no collect. Skewed keys (one user = one partition's worth of
 * events) are the operator's intrinsic limit — mitigate upstream by salting
 * the key with a coarse time bucket when a single key exceeds a partition.
 *
 * Streaming path: `sessionWindowAgg` — `session_window` groupBy, usable
 * under a watermark in Structured Streaming for incremental sessionization
 * with state cleanup (`EventStreamIngest` wires the streaming variant).
 */
object Sessionize {

  private def sortKeys(tsCol: String, idCol: String): Seq[Column] =
    Seq(col(tsCol), col(idCol))

  /**
   * Defensive input normalization: `unix_micros` only accepts TIMESTAMP, but
   * parquet written without timezone annotation arrives as TIMESTAMP_NTZ
   * (exactly how the round-5 testdata regeneration broke this operator at
   * analysis time). Under a UTC session — every graft entry point pins
   * `spark.sql.session.timeZone=UTC` — the NTZ→TIMESTAMP cast preserves both
   * wall-clock and instant, so session boundaries are bit-identical.
   */
  private def normalizeTs(df: DataFrame, tsCol: String): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  /**
   * Adds `session_seq` (1-based per key, in time order). `idCol` breaks
   * ordering ties — equal-timestamp events are gap-0 and land in the same
   * session either way, but a total order keeps downstream row-level output
   * deterministic.
   */
  def withSessionIds(df0: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, gapSeconds: Long): DataFrame = {
    val df = normalizeTs(df0, tsCol)
    val w = Window.partitionBy(keyCol).orderBy(sortKeys(tsCol, idCol): _*)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev >= gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("__is_new", isNew)
      .withColumn("session_seq",
        sum(col("__is_new")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__is_new")
  }

  /** Per-session stats: event count, start/end, duration. Duration stays in
    * exact integer microseconds — a `/ 1e6` here would be a double division
    * whose floor can disagree with an engine's integer division by one ulp. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, gapSeconds: Long): DataFrame =
    withSessionIds(df, keyCol, tsCol, idCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"))

  /**
   * The same session partitioning via the built-in `session_window` — the
   * form that runs incrementally under Structured Streaming (group state =
   * open sessions, closed by the watermark). In batch it is an alternative
   * plan for [[sessionStats]]' counts: groupBy(key, session_window) with
   * map-side partial merge instead of a window sort.
   */
  def sessionWindowAgg(df0: DataFrame, keyCol: String, tsCol: String,
                       gapSeconds: Long): DataFrame = {
    val df = normalizeTs(df0, tsCol)
    df.groupBy(col(keyCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"), col("n_events"))
  }
}
