package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Slowly-Changing-Dimension Type 2 maintenance — the versioned-dimension
 * merge every warehouse pipeline needs once a dimension's attributes drift
 * (the reference's dbt models rebuild dimensions from scratch each run,
 * e.g. `dim_customer.sql`; SCD2 is the incremental, history-preserving
 * form of the same surface). A dimension row carries (business key,
 * attributes, valid_from, valid_to, is_current); applying an update batch
 * closes changed open rows at the batch's effective time, inserts new
 * versions, and passes unchanged rows and closed history through.
 *
 * Semantics per batch (effective time `asOf`, one winner per key):
 * - update matches an open row, any attribute differs (null-safe
 *   comparison) → the open row closes (valid_to = asOf, is_current =
 *   false) and a new open version inserts (valid_from = asOf);
 * - update matches, all attributes identical → no-op (idempotent replay);
 * - update for an unseen key → new open row;
 * - open row without an update → unchanged. Closed history never changes.
 *
 * Duplicate keys inside one batch resolve deterministically BEFORE the
 * merge: the max of struct(attrs…) per key wins (a total order over the
 * attribute tuple — engine- and run-independent, unlike "last row wins").
 *
 * Scale shape: ONE shuffle join on the business key between the OPEN slice
 * and the (deduped) batch; the closed-history slice is a pass-through
 * union that never shuffles. At 100 TB the open slice is the dimension's
 * live cardinality (a fraction of total history), and both sides of the
 * key join partial-aggregate/partition on the same key — bucketing the
 * stored dimension by the key makes the join zero-Exchange
 * ([[graft.layout.TableLayout]] pattern). Output row count =
 * |history| + |open| + |changed ∪ new| — nothing driver-side.
 */
object ScdMerge {

  /** The initial SCD2 snapshot from a plain dimension: every row open as of
    * `asOf`. `valid_to` is a null timestamp (open-ended). Null business
    * keys are excluded — see the [[scd2Apply]] null-key note. */
  def scd2Init(snapshot: DataFrame, keyCol: String, attrCols: Seq[String],
               asOf: Column): DataFrame =
    snapshot.filter(col(keyCol).isNotNull).select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        asOf.cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current")): _*)

  /**
   * Apply one update batch (`updates`: keyCol + attrCols) effective at
   * `asOf` to an SCD2 `current` table (schema of [[scd2Init]]). `asOf`
   * must be later than every open row's valid_from (CDC batches are
   * time-ordered; an out-of-order batch would need history splicing, a
   * different operator).
   */
  def scd2Apply(current: DataFrame, updates: DataFrame, keyCol: String,
                attrCols: Seq[String], asOf: Column): DataFrame = {
    val k = col(keyCol)

    // Null business keys are EXCLUDED from the batch (r12 review — the
    // [[AsOfJoin]] null-guard rationale): the full-outer equi-join below
    // can never match NULL against NULL, so a malformed null-key update
    // would insert a fresh open null-key version EVERY batch while all
    // prior ones pass through untouched — after N batches the dimension
    // holds N `is_current` rows for a key that addresses no member,
    // silently breaking the one-open-row-per-key invariant. A row whose
    // business key is unknown cannot version anything; drop it up front
    // ([[scd2Init]] applies the same rule to the initial snapshot).
    // one deterministic winner per key: max over the attribute-tuple order
    val upd = updates
      .filter(k.isNotNull)
      .groupBy(k)
      .agg(max(struct(attrCols.map(col): _*)).as("__u"))
      .select(k +: attrCols.map(a => col(s"__u.$a").as(a)): _*)

    val open = current.filter(col("is_current"))
    val history = current.filter(!col("is_current"))

    // null-safe "any attribute differs"
    def changed(l: String, r: String): Column = attrCols
      .map(a => !(col(s"$l.$a") <=> col(s"$r.$a")))
      .reduce(_ || _)

    // presence marker: tag the update side before joining so "has an
    // update" never depends on attribute null patterns
    val updMarked = upd.withColumn("__upd_marker", lit(true))
    val j = open.as("o")
      .join(updMarked.as("u"), Seq(keyCol), "full_outer")

    val hasOpen = col("o.is_current").isNotNull
    val hasUpd = col("__upd_marker").isNotNull
    val diff = changed("o", "u")
    val closes = hasUpd && diff

    // ONE pass over the joined rows: each emits 0–2 version structs via an
    // array + explode. A filter-per-branch union here would let Catalyst
    // split the full-outer join into three filtered joins, re-shuffling the
    // open slice once per branch (observed: LeftOuter + Inner + RightOuter
    // with only partial exchange reuse).
    def version(side: String, vf: Column, vt: Column, cur: Column): Column =
      struct(attrCols.map(a => col(s"$side.$a").as(a))
        :+ vf.as("valid_from") :+ vt.as("valid_to") :+ cur.as("is_current"): _*)

    // open row passes through (valid_to stays null) or closes at asOf
    val keptOrClosed = when(hasOpen,
      version("o", col("o.valid_from"),
        when(closes, asOf.cast("timestamp")).otherwise(col("o.valid_to")),
        !closes))
    // changed keys and brand-new keys open a version at asOf
    val openedNow = when(hasUpd && (!hasOpen || diff),
      version("u", asOf.cast("timestamp"),
        lit(null).cast("timestamp"), lit(true)))

    val merged = j
      .select(k, explode(filter(array(keptOrClosed, openedNow),
        x => x.isNotNull)).as("__v"))
      .select(k +: attrCols.map(a => col(s"__v.$a").as(a))
        :+ col("__v.valid_from").as("valid_from")
        :+ col("__v.valid_to").as("valid_to")
        :+ col("__v.is_current").as("is_current"): _*)

    history.select(merged.columns.map(col): _*).unionByName(merged)
  }
}
