package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Symmetric per-vector int8 quantization for embedding columns — the storage
 * path that makes a 100 TB ANN corpus tractable: float32 → int8 is a 4×
 * shrink of the dominant column, and bucketed candidate generation
 * (sign-LSH / IVF) is rank-invariant under per-vector scaling, so the
 * quantized corpus serves search with the full-precision copy left in cold
 * storage for the final re-rank.
 *
 * Determinism contract (the driver query is DuckDB-oracle-checked): the
 * quantizer uses only IEEE-exact operations — abs/max, one double division,
 * `floor(x + 0.5)` (not `round`, whose negative-half behavior differs
 * between engines), clamp — so any engine reproduces the exact codes.
 *
 * Everything is a narrow projection (whole-stage codegen, no shuffle, no
 * UDF); arrays are staged as materialized columns before entering
 * higher-order functions (interpreted-lambda rule, see
 * [[Dedup.shinglesOfTokens]]).
 */
object VectorQuantization {

  /** `max(|x|)/127` as the per-vector scale; 1.0 for all-zero vectors (their
    * codes are all zero either way, and 0 would poison the division). */
  private def scaleOf(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x))).cast("double")
    when(mx > 0.0, mx / 127.0).otherwise(1.0)
  }

  /**
   * Adds `scale` (double) and `qvec` (array of int8 codes in [-127, 127],
   * stored as tinyint — 1 byte/dim on the parquet side).
   */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    // loud output-name guard (r13 review): withColumn would silently
    // replace an input `scale`, and qvec would quantize by the WRONG scale
    val clash = df.columns.filter(Seq("scale", "qvec").contains)
    require(clash.isEmpty,
      s"quantizeInt8: column(s) ${clash.mkString(", ")} collide with the " +
        "output schema (scale, qvec) — rename them")
    df.withColumn("scale", scaleOf(col(vecCol)))
      .withColumn("qvec", transform(col(vecCol), x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / col("scale") + 0.5))).cast("byte")))
  }

  /** Reconstructed doubles `q · scale` (the re-rank-side dequantization). */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Per-element |dequant − original| maximum — the reconstruction-error
    * audit column; ≤ scale/2 by construction for unclamped codes. */
  def maxAbsError(df: DataFrame, vecCol: String): DataFrame = {
    require(!df.columns.contains("max_abs_err"),
      "maxAbsError: input already carries max_abs_err — rename it")
    val q = quantizeInt8(df, vecCol)
    q.withColumn("max_abs_err",
      array_max(zip_with(col("qvec"), col(vecCol), (qc, x) =>
        abs(qc.cast("double") * col("scale") - x.cast("double")))))
  }
}
