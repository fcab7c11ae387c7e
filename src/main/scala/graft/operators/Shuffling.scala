package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic global shuffle + sharding — the "randomize training order"
 * step of a training-data pipeline, made reproducible and cluster-shaped.
 *
 * `orderBy(rand())` fails twice at 100 TB: the order changes on every run
 * (and every task retry — a non-deterministic sort key can violate Spark's
 * retry semantics), and a single total sort range-shuffles the full corpus
 * through one global ordering. This operator instead derives everything from
 * `md5(seed : key)`:
 *
 *  - `shard` — the first 4 hex chars (a uniform 16-bit bucket) mod
 *    `nShards`. Narrow, engine-portable (any md5-capable engine assigns the
 *    identical shard — the DuckDB oracle replays it with string arithmetic),
 *    and stable under corpus appends: a row's shard never changes when the
 *    corpus grows. Residue bias is ≤ nShards/65536 (< 0.1% for nShards ≤ 64;
 *    shard counts at 100 TB are ~thousands, still < 3% at 2048).
 *  - `pos` — the row's position WITHIN its shard, by hash order (ties broken
 *    on the key): one `row_number` per shard partition, all shards ranked in
 *    parallel. No global sort ever happens; the only wide exchange is the
 *    hash partition on `shard`, which is exactly the write layout.
 *
 * Downstream a trainer reads shard files in index order and rows in `pos`
 * order and sees a reproducible global permutation (shard-major). Re-shuffle
 * for another epoch = a different `seed`, same plan.
 */
object Shuffling {

  /** The row's 32-hex-char shuffle key: md5 of "seed:key". */
  def shuffleKey(key: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), key.cast("string")))

  /** Shard assignment from a shuffle-key column: value of the first 4 hex
    * chars (0..65535) mod nShards. `conv` is Spark-side; the engine-portable
    * definition is plain per-digit arithmetic (see the DuckDB oracle). */
  def shardOf(shuffleKey: Column, nShards: Int): Column =
    pmod(conv(substring(shuffleKey, 1, 4), 16, 10).cast("long"), lit(nShards.toLong))

  /**
   * Adds (`shard`, `pos`) to `df`: a reproducible shard-major global
   * permutation keyed by `keyCol`. One shuffle (hash on `shard`), per-shard
   * window ranking — shards rank concurrently across the cluster.
   */
  def shuffled(df: DataFrame, keyCol: String, seed: String,
               nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val k = shuffleKey(col(keyCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__sk"), col(keyCol))
    df.withColumn("__sk", k)
      .withColumn("shard", shardOf(col("__sk"), nShards))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__sk")
  }

  /**
   * Write the shuffled corpus as `nShards` shard directories, rows sorted in
   * shuffle order inside each file: `repartition(nShards, shard)` +
   * `sortWithinPartitions` — the exchange that the ranking already paid IS
   * the write layout, so the sort is partition-local (no range exchange, no
   * global barrier). Trainers stream shard k's file(s) sequentially.
   */
  def writeShuffled(df: DataFrame, keyCol: String, seed: String,
                    nShards: Int, path: String): Unit =
    shuffled(df, keyCol, seed, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
