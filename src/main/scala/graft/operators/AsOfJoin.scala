package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join (time-series point-in-time join): for every left row, attach
 * the most recent right row with the same key whose time is ≤ the left
 * row's time (backward direction; `strict` makes it <).
 *
 * Spark has no native ASOF JOIN (DuckDB/Pandas do), and the naive
 * formulation — a range join `l.t >= r.t` + "latest per pair" — degenerates
 * to an O(|L|·|R|) BroadcastNestedLoop/cartesian per key. This operator is
 * the (a)-tier composition instead: tag and UNION both sides, then one
 * window pass ordered by (time, side) per key carries the last seen right
 * row forward onto each left row. Cost: ONE shuffle + sort of |L|+|R| rows
 * on the join key — the same shape as a sort-merge join, which is what an
 * as-of join is at heart. At 100 TB: no broadcast, no quadratic blowup;
 * skewed keys behave like any other hot groupBy key (salt upstream if one
 * key dominates).
 *
 * The right payload rides as ONE struct through the window (`last` with
 * ignoreNulls), so a NULL field inside a matched right row stays NULL
 * instead of borrowing from an older row. Right-side times must be unique
 * per (key, time) — pre-aggregate ties deterministically (e.g. `max` of the
 * payload); `AsOfJoinSpec` pins this contract.
 */
object AsOfJoin {

  /**
   * @param left      probe side (all its columns are preserved)
   * @param right     build side (its payload columns get attached)
   * @param leftKey   equi-join key on the left
   * @param leftTime  left event-time column name
   * @param rightKey  equi-join key on the right
   * @param rightTime right event-time column name
   * @param rightCols right columns to attach (default: all but key/time)
   * @param strict    true → match strictly-before (`<`); false → `<=`
   */
  def asofBackward(
      left0: DataFrame, leftKey: String, leftTime: String,
      right0: DataFrame, rightKey: String, rightTime: String,
      rightCols: Seq[String] = Seq.empty,
      strict: Boolean = false): DataFrame = {

    // The two sides' time columns are unioned into one `__t` — normalize
    // both to TIMESTAMP up front ([[TimeNorm]]: a mixed TIMESTAMP/
    // TIMESTAMP_NTZ union would fail coercion or silently coerce one side).
    val left = TimeNorm.toTimestamp(left0, leftTime)
    // Join semantics for NULLs (r11 review): a right row with a NULL key or
    // NULL time can never match any left row — SQL equi-joins don't match
    // NULL=NULL and a NULL time compares UNKNOWN — but the window
    // formulation below would group null keys into one partition (and sort
    // null times first), FABRICATING matches a real ASOF join never
    // produces. Excluding those rows up front restores join semantics;
    // null-key/null-time LEFT rows then naturally attach nothing (their
    // partition holds no right rows / sorts ahead of all of them).
    val right = TimeNorm.toTimestamp(right0, rightTime)
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)

    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(c => c == rightKey || c == rightTime)
    val leftCols = left.columns.toSeq

    // Loud name guards (r13 review): the tag columns would otherwise
    // produce duplicate names inside the tagged selects (ambiguity errors
    // deep in the window plan, far from the cause), and a carry column
    // sharing a left column's name would emit DUPLICATE output columns
    // that throw only when something downstream references them.
    val tags = Seq("__k", "__t", "__side", "__r")
    val tagClash = (leftCols ++ carry).filter(tags.contains)
    require(tagClash.isEmpty,
      s"asofBackward: column(s) ${tagClash.distinct.mkString(", ")} collide " +
        s"with the operator's tag columns (${tags.mkString(", ")}) — rename them")
    val outClash = carry.filter(leftCols.contains)
    require(outClash.isEmpty,
      s"asofBackward: right column(s) ${outClash.mkString(", ")} would " +
        "duplicate left output columns — rename them or narrow rightCols")

    // One unioned stream of (key, time, side, left payload…, right struct).
    // At equal time, side orders right rows BEFORE left rows (side 0) so
    // `<=` matching falls out of the sort; strict mode orders them AFTER
    // (side 2) so a right row at exactly t is invisible to that instant.
    val lTagged = left.select(
      col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__side") +:
        leftCols.map(col) :+ lit(null).as("__r"): _*)
    val rTagged = right.select(
      col(rightKey).as("__k") +: col(rightTime).as("__t") +:
        lit(if (strict) 2 else 0).as("__side") +:
        leftCols.map(c => lit(null).as(c)) :+
        struct(carry.map(col): _*).as("__r"): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col("__r").getField(c).as(c)): _*)
  }
}
