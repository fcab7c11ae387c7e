package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Custom Catalyst expressions for the sketch hot paths.
 *
 * The pure-`functions._` formulations of MinHash/SimHash fold 32-64
 * per-bit/per-function lambdas over the token-hash array; higher-order
 * functions evaluate interpreted, so every element costs an expression-tree
 * walk × numHashes. These expressions make one imperative pass over the
 * unboxed long array per row — O(n + k) with primitive arithmetic — the
 * (b) tier of the extension-point ladder (custom `Expression` before custom
 * physical operators).
 *
 * `CodegenFallback` is deliberate: the expression is evaluated once per row
 * and its internal loop is ordinary JVM code, so codegen would only inline
 * the call; the interpreted-lambda tax it replaces was per-element.
 */

/**
 * One-permutation MinHash signature from an `array<long>` of element hashes:
 * hash space is partitioned into `numHashes` buckets (h mod k); the
 * signature entry is the bucket minimum, with circular-rotation
 * densification for empty buckets (identical sets ⇒ identical signatures;
 * the collision-probability ≈ Jaccard property is preserved).
 *
 * Cost: one pass over the hashes — numHashes× cheaper than evaluating k
 * independent hash functions per element.
 */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = numHashes
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val b = ((h % k) + k) % k
      if (h < sig(b.toInt)) sig(b.toInt) = h
      i += 1
    }
    // densify: empty buckets borrow the next non-empty value (circular) —
    // deterministic in the set alone, so equal sets stay equal
    var b = 0
    while (b < k) {
      if (sig(b) == Long.MaxValue) {
        var j = 1
        while (j < k && sig((b + j) % k) == Long.MaxValue) j += 1
        if (j < k) sig(b) = sig((b + j) % k)
      }
      b += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 64-bit SimHash from an `array<long>` of element hashes: bit b of the
 * sketch is set when more than half the elements have bit b set. One pass,
 * 64 counters, no per-bit lambda.
 */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var sk = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sk |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sk)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Sign-LSH sketch of an `array<float>` vector: `nBits` sign bits of
 * projections onto pseudo-random hyperplanes derived from a splitmix64 mix of
 * (table, bit, dim) — deterministic, no fitted model. One imperative pass over
 * dims × bits replaces nBits × dim interpreted `zip_with` lambda evals.
 */
case class SignLshSketchExpr(child: Expression, table: Int, nBits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_sketch"

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private lazy val elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false   // array<double> (e.g. post-normalization)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    var sk = 0L
    var b = 0
    while (b < nBits) {
      val seed = table.toLong * 0x100000001B3L + b
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val comp = mix(seed * 0x9E3779B1L + d).toDouble / Long.MaxValue
        val x = if (elementIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        proj += x * comp
        d += 1
      }
      if (proj >= 0.0) sk |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sk)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: OPH MinHash signature of an array<long> hash column. */
  def minhash_signature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(hashes), numHashes))

  /** Column wrapper: 64-bit SimHash of an array<long> hash column. */
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(hashes)))

  /** Column wrapper: sign-LSH sketch of an array<float> vector column. */
  def sign_lsh_sketch(vec: Column, table: Int, nBits: Int): Column =
    ColumnBridge.column(
      SignLshSketchExpr(ColumnBridge.expression(vec), table, nBits))

  /** SQL registration: `SELECT minhash_signature(hashes, 32), simhash64(hashes)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_signature",
      exprs => MinHashSignatureExpr(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "scala_udf")
  }
}
