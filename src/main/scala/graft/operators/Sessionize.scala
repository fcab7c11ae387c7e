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
 * events) are this form's intrinsic limit — [[sessionStatsSalted]] is the
 * salt-by-time-bucket variant that spreads a hot key over its time range
 * and repairs bucket boundaries on per-session rows.
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
   *
   * Null keys and null timestamps are EXCLUDED (r12 review — the
   * [[AsOfJoin]] null-guard rationale): a null timestamp sorts first in its
   * key's window and the next real event's gap test evaluates
   * `micros − NULL = NULL`, which the `otherwise(0)` branch silently turns
   * into "same session" — the phantom row inflates n_events and an all-null
   * key emits a garbage session with null start/end. A null KEY would fuse
   * unrelated events into one pseudo-user's sessions (groupBy treats NULL
   * as a value). Neither row can belong to a well-defined session, so both
   * are dropped up front, uniformly across the plain, salted, and
   * session_window entry points.
   */
  private def normalizeTs(df: DataFrame, keyCol: String,
                          tsCol: String): DataFrame =
    TimeNorm.toTimestamp(df, tsCol)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)

  /**
   * Adds `session_seq` (1-based per key, in time order). `idCol` breaks
   * ordering ties — equal-timestamp events are gap-0 and land in the same
   * session either way, but a total order keeps downstream row-level output
   * deterministic.
   */
  def withSessionIds(df0: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, gapSeconds: Long): DataFrame = {
    val df = normalizeTs(df0, keyCol, tsCol)
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
   * Skew-safe [[sessionStats]] — the salt-by-time-bucket mitigation the
   * plain form's scaladoc promises, implemented: when ONE key's events
   * exceed a partition (a bot account, a monitoring client), the plain
   * window puts them all on one reducer. Here the heavy shuffle carries
   * (key, time-bucket) — a hot key spreads over its time range — and each
   * bucket sessionizes locally; a second pass then repairs the bucket
   * boundaries by gap-merging adjacent PER-SESSION rows (volume = sessions,
   * not events — the whole point: the only full-data shuffle is the salted
   * one).
   *
   * Correctness argument: `bucketSpanSeconds ≥ gapSeconds` (required) means
   * two events separated by an empty bucket are ≥ bucketSpan ≥ gap apart —
   * never one session — so merges only ever join sessions from the SAME or
   * ADJACENT buckets, and chained spans (a session crossing many buckets)
   * resolve because gap-merging per-session intervals is associative in
   * time order. The repair is itself a sessionization of sessions: a
   * session starts where `start − prev_end ≥ gap`. SessionizeSpec pins
   * bit-equality with [[sessionStats]] on planted cross-boundary and
   * multi-bucket-spanning sessions.
   */
  def sessionStatsSalted(df0: DataFrame, keyCol: String, tsCol: String,
                         idCol: String, gapSeconds: Long,
                         bucketSpanSeconds: Long): DataFrame = {
    require(bucketSpanSeconds >= gapSeconds,
      "bucketSpanSeconds must be >= gapSeconds (an empty bucket between two " +
        "events must certify a session break)")
    val df = normalizeTs(df0, keyCol, tsCol)
    val bk = (unix_micros(col(tsCol)) / lit(bucketSpanSeconds * 1000000L))
      .as("__bk")
    // phase 1: local sessions per (key, bucket) — the SALTED shuffle
    val w = Window.partitionBy(col(keyCol), col("__bk"))
      .orderBy(sortKeys(tsCol, idCol): _*)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - prev >= gapSeconds * 1000000L, 1L).otherwise(0L)
    val local = df.withColumn("__bk", bk)
      .withColumn("__ln", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__bk"), col("__ln"))
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).as("session_start"), max(tsCol).as("session_end"))
    // phase 2: gap-merge the per-session intervals across buckets — shuffle
    // volume is one row per LOCAL session, ordered by start time (two
    // sessions of one key can never share a start: they cannot overlap)
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
      .select(col(keyCol), col("session_seq"), col("n_events"),
        col("session_start"), col("session_end"), col("duration_us"))
  }

  /**
   * The same session partitioning via the built-in `session_window` — the
   * form that runs incrementally under Structured Streaming (group state =
   * open sessions, closed by the watermark). In batch it is an alternative
   * plan for [[sessionStats]]' counts: groupBy(key, session_window) with
   * map-side partial merge instead of a window sort.
   */
  def sessionWindowAgg(df0: DataFrame, keyCol: String, tsCol: String,
                       gapSeconds: Long): DataFrame = {
    val df = normalizeTs(df0, keyCol, tsCol)
    df.groupBy(col(keyCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"), col("n_events"))
  }
}
