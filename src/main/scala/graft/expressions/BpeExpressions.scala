package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * BPE subword segmentation of an `array<string>` token column against a
 * TRAINED merge list (see [[graft.text.BpeTokenizer.learn]]), applied as a
 * narrow once-per-row expression — the tokenize side of the learn/apply
 * pair. No shuffle, no join: the merge list rides in the plan (it is
 * vocab-bounded and tiny — the rank-ordered output of training), so at
 * 100 TB this is scan-speed work like the other text expressions.
 *
 * Apply semantics, per token (word): symbols start as Unicode code points;
 * for each merge (a, b) in RANK ORDER, one greedy left-to-right pass
 * replaces every non-overlapping adjacent (a, b) with the concatenation
 * `ab` (in `aaa` with merge (a,a): positions 0-1 merge, position 2 stays —
 * the standard left-to-right convention, chosen because an external engine
 * can replay it with islands-and-parity arithmetic; the DuckDB oracle
 * does, stage by stage). Output is a struct:
 * `(text_bpe, n_subwords)` — tokens joined by one space, subwords within a
 * token joined by `@@`, plus the total subword count (counted directly, so
 * no separator-collision ambiguity).
 *
 * `CodegenFallback` per the file-level rationale in
 * [[SketchExpressions]]: the internal loop is plain JVM code evaluated
 * once per row.
 */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("text_bpe", StringType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false)))
  override def prettyName: String = "bpe_segment"

  @transient private lazy val mergeList: Array[(String, String)] = merges.toArray

  private def segmentWord(word: String): Array[String] = {
    // symbols = code points
    var syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var n = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    var len = n
    var m = 0
    while (m < mergeList.length && len > 1) {
      val (a, b) = mergeList(m)
      // greedy left-to-right single pass, in place
      var out = 0
      var in = 0
      while (in < len) {
        if (in + 1 < len && syms(in) == a && syms(in + 1) == b) {
          syms(out) = a + b
          in += 2
        } else {
          syms(out) = syms(in)
          in += 1
        }
        out += 1
      }
      len = out
      m += 1
    }
    java.util.Arrays.copyOf(syms, len)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nTok = arr.numElements()
    val sb = new java.lang.StringBuilder
    var total = 0
    var emitted = false
    var t = 0
    while (t < nTok) {
      val w = arr.getUTF8String(t)
      // the separator is appended only when THIS token emits subwords (r11
      // review): null/empty tokens contribute nothing, and appending the
      // space unconditionally produced leading/double spaces — text_bpe
      // could then not be split on single spaces to recover the subword
      // groups n_subwords counts. (The tokenizer emits neither, so the
      // certified rows are byte-identical.)
      if (w != null) {
        val subs = segmentWord(w.toString)
        if (subs.length > 0) {
          if (emitted) sb.append(' ')
          emitted = true
          total += subs.length
          var s = 0
          while (s < subs.length) {
            if (s > 0) sb.append("@@")
            sb.append(subs(s))
            s += 1
          }
        }
      }
      t += 1
    }
    InternalRow(UTF8String.fromString(sb.toString), total)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: struct(text_bpe, n_subwords) BPE segmentation of an
    * array<string> token column under a trained rank-ordered merge list. */
  def bpe_segment(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeSegmentExpr(ColumnBridge.expression(tokens), merges))
}
