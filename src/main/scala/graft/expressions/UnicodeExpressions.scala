package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode normalization as a Catalyst expression. Spark has no built-in
 * normalizer function, and the alternative — a Scala UDF — would box every
 * row through the encoder; this is the same (b)-tier extension choice as
 * the sketch expressions, with the same `CodegenFallback` rationale: it is
 * a ONCE-PER-ROW call whose body (`java.text.Normalizer`, ICU-equivalent
 * for the standard forms) is ordinary JVM code that codegen would only
 * inline.
 *
 * The canonical corpus-cleaning form is NFC (composed; what utf8proc-based
 * engines like DuckDB produce via `nfc_normalize`, which is exactly how the
 * oracle replays it). NFKC additionally folds compatibility characters
 * (ligatures, full-width forms) — stronger canonicalization for dedup keys,
 * at the cost of changing visible text.
 */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  // validate the form at CONSTRUCTION (plan time, r11 review): deferring the
  // enum lookup to the lazy val meant a typo'd form ("nfc") launched the job
  // and then failed per-task on executors, with Spark retrying 4 times
  require(java.text.Normalizer.Form.values.exists(_.name == form),
    s"unicode_normalize: unknown form '$form' " +
      s"(expected one of ${java.text.Normalizer.Form.values.mkString(", ")})")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, f)) input // common case: no copy
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: normalize a string column to the given Unicode form
    * ("NFC", "NFD", "NFKC", "NFKD"). */
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(
      UnicodeNormalizeExpr(ColumnBridge.expression(c), form))
}
