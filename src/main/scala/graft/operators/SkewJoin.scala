package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys: when one join key holds a disproportionate
 * share of the large side's rows, a plain shuffle join lands that key's entire
 * row set on ONE reducer — the straggler that dominates the stage at 100 TB.
 *
 * The classic remedy, expressed declaratively:
 *  - large side: append a uniform salt in `[0, saltFactor)` — derived from a
 *    per-row xxhash64 over the row's columns, not from the key (salting by the
 *    key would map each key to one salt and change nothing);
 *  - small side: replicate each row once per salt value (`explode` of a
 *    literal range — a `saltFactor`× blowup of the SMALL side only);
 *  - join on (key, salt): each formerly-hot key now spreads over
 *    `saltFactor` reducers.
 *
 * The result set is identical to the unsalted join (every large row still
 * meets every matching small row exactly once — SkewJoinSpec proves equality
 * and the driver query is oracle-checked against the plain SQL join).
 *
 * This is the manual form; Spark's AQE skew-join (`skewJoin.enabled`) does
 * the same split adaptively from runtime stats and should be preferred when
 * sizes are unknown. The manual operator wins when the skew is KNOWN and
 * stable (AQE only splits post-shuffle partitions of sort-merge joins, and
 * only after the skewed partition has already been written out by the map
 * side) — and it composes with any join type Spark plans.
 */
object SkewJoin {

  /**
   * Inner equi-join `large ⋈ small` on `largeKey = smallKey`, salted
   * `saltFactor` ways. Column sets must be disjoint (as with a plain join);
   * the salt columns are internal and dropped.
   */
  def saltedJoin(large: DataFrame, largeKey: String,
                 small: DataFrame, smallKey: String,
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // Any per-row salt assignment yields the same join RESULT; hashing the
    // row's own columns keeps it deterministic for a given row (plan-order
    // independent, unlike monotonically_increasing_id).
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(saltFactor)).cast("int"))
    // shuffle_hash on the replicated dim: a sort-merge join would sort BOTH
    // shuffled sides; hashing the (still small·saltFactor) side skips both
    // sorts. Broadcast would defeat the exercise — a broadcast join never
    // skews in the first place; this operator exists for dims past the
    // broadcast threshold.
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
      .hint("shuffle_hash")
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(largeKey) === replicated(smallKey))
      .drop("__salt")
  }
}
