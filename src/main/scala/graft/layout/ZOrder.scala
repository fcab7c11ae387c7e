package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) layout — multi-dimensional data skipping for the scan
 * layer. Range-partitioning by a single column gives perfect file pruning
 * on THAT column and none on any other; interleaving the bits of two
 * columns and range-writing by the interleaved key gives useful pruning on
 * EITHER column (a box query touches ~the files whose space-filling-curve
 * cell intersects the box). This is how large lakehouse tables serve
 * point-ish predicates on two independent dimensions without duplicating
 * the data per sort order.
 *
 * Everything here is a narrow codegen'd integer-arithmetic expression —
 * no UDF, no shuffle beyond the one range-exchange at WRITE time, which is
 * precisely the trade: pay one shuffle once, skip row groups forever.
 * `ZOrderSpec` machine-checks the skipping claim by comparing per-file
 * min/max envelopes of a z-written layout against a single-column sort.
 */
object ZOrder {

  /** Clamp-and-scale a numeric column onto the 16-bit grid [0, 65535] given
    * fixed domain bounds (out-of-domain values clamp to the edge cells, so
    * approximate bounds are safe). Pure double arithmetic + floor —
    * engine-replayable exactly. */
  def scaleTo16Bit(c: Column, min: Double, max: Double): Column =
    least(lit(65535), greatest(lit(0),
      floor((c.cast("double") - min) / (max - min) * 65536.0).cast("int")))

  /** 32-bit Morton code: bit i of `a` → bit 2i+1, bit i of `b` → bit 2i.
    * A flat 32-term shift/mask tree — whole-stage-codegen folds it into
    * straight-line JVM integer ops. Inputs must already be in [0, 65535].
    * Computed in LONG: bit 31 of the result is live (a=65535 sets it), and
    * int arithmetic would wrap it negative in Spark while DuckDB raises —
    * a long keeps the key positive and engine-identical. */
  def interleave16(a: Column, b: Column): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until 16).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Morton key of two bounded numeric columns. */
  def zValue(a: Column, aMin: Double, aMax: Double,
             b: Column, bMin: Double, bMax: Double): Column =
    interleave16(scaleTo16Bit(a, aMin, aMax), scaleTo16Bit(b, bMin, bMax))

  /** Write `df` z-ordered by (`a`, `b`): one range exchange on the Morton
    * key, sorted within partitions so parquet row-group min/max envelopes
    * are tight on BOTH columns. */
  def writeZOrdered(df: DataFrame, outDir: String,
                    a: String, aMin: Double, aMax: Double,
                    b: String, bMin: Double, bMax: Double,
                    numFiles: Int): Unit = {
    val z = zValue(col(a), aMin, aMax, col(b), bMin, bMax)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file [min,max] envelope of two columns — the skipping statistics a
    * scan consults; used to measure how many files a box query must read. */
  def fileEnvelopes(df: DataFrame, a: String, b: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("a_min"), max(col(a)).as("a_max"),
           min(col(b)).as("b_min"), max(col(b)).as("b_max"))
}
