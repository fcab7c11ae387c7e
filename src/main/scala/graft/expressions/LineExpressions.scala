package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Within-document line dedup as ONE imperative pass — the size-gated
 * fallback branch of [[graft.operators.LineDedup.dedupLinesWithinDoc]]
 * (r13 verdict item: the HOF formulation's first-occurrence test is
 * `array_position`, O(lines²) per document, and a pathological million-line
 * crawl document would stall a task for hours; this expression is
 * O(lines) with a hash set).
 *
 * Semantics are EXACTLY the HOF branch's (a spec pins equality on the
 * crossover): split on every `\n` byte (regex `\n` with limit -1 — no
 * collapsing, trailing empties kept); a line whose space-trimmed (0x20
 * only, Spark `trim` semantics) character count is `< minChars` bypasses
 * dedup and is always kept; otherwise the line is kept iff it is the first
 * occurrence of its RAW (untrimmed) text within the document. Returns
 * `struct(kept_text string, n_kept int)`; null text → null struct, matching
 * the HOF branch's null propagation.
 *
 * Why an Expression and not explode + per-doc min(struct): the aggregate
 * shape pays two Exchanges and needs a row identity the operator's API
 * does not have (it preserves arbitrary caller columns) — while this stays
 * a pure projection evaluated at scan speed, same as the small-doc branch.
 * O(total line bytes) work and one byte-array copy per document; the seen
 * set holds zero-copy UTF8String views into that array.
 *
 * `CodegenFallback` per the package convention ([[SketchExpressions]]):
 * once-per-row expressions with an internal JVM loop gain nothing from
 * codegen, and the surrounding CaseWhen/HOF projection is interpreted
 * anyway.
 */
case class DedupLinesWithinExpr(child: Expression, minChars: Int)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  require(minChars >= 0,
    s"dedup_lines_within: minChars must be >= 0, got $minChars")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] =
    Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("kept_text", StringType, nullable = true),
    StructField("n_kept", IntegerType, nullable = false)))
  override def prettyName: String = "dedup_lines_within"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[UTF8String]()
    val keepStart = new scala.collection.mutable.ArrayBuffer[Int]()
    val keepLen = new scala.collection.mutable.ArrayBuffer[Int]()
    var outBytes = 0
    var kept = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        val len = i - start
        // space-trimmed char count (Spark trim: 0x20 only)
        var t0 = start; var t1 = start + len
        while (t0 < t1 && bytes(t0) == 0x20) t0 += 1
        while (t1 > t0 && bytes(t1 - 1) == 0x20) t1 -= 1
        var chars = 0
        var j = t0
        while (j < t1) { if ((bytes(j) & 0xC0) != 0x80) chars += 1; j += 1 }
        val keep =
          if (chars < minChars) true
          else seen.add(UTF8String.fromBytes(bytes, start, len))
        if (keep) {
          keepStart += start; keepLen += len
          outBytes += len; kept += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](outBytes + math.max(0, kept - 1))
    var pos = 0
    var k = 0
    while (k < kept) {
      if (k > 0) { out(pos) = '\n'; pos += 1 }
      System.arraycopy(bytes, keepStart(k), out, pos, keepLen(k))
      pos += keepLen(k)
      k += 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromBytes(out), kept))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LineExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: one-pass within-document line dedup —
    * `struct(kept_text, n_kept)`. */
  def dedup_lines_within(text: Column, minChars: Int): Column =
    ColumnBridge.column(
      DedupLinesWithinExpr(ColumnBridge.expression(text), minChars))
}
