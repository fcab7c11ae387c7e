package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeMapData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

/**
 * Fused bigram-NLL scoring (round-5 verdict item 5): per document, the
 * total add-k-smoothed negative log-likelihood of the token array against a
 * broadcast bigram model, in ONE pass over the tokens — no per-bigram
 * explode, no joins, no aggregation. The join-based formulation
 * ([[graft.text.LmScore.scoreExploded]], kept as the semantic reference)
 * materializes |tokens| rows per document and pushes them through two
 * broadcast hash joins and a partial aggregate; at 10× corpus scale that
 * explode stream (~3M rows at sf1) dominated `t_lm_perplexity`'s wall
 * clock. Here the model rides as single-row MAP columns cross-joined via
 * broadcast — so model training stays inside the measured execution (each
 * bench pass rebuilds the broadcast), and scoring runs at scan speed.
 *
 * The model maps arrive as Catalyst [[MapData]], whose `element_at` lookup
 * is a linear scan — unusable per bigram. The expression instead builds a
 * `java.util.HashMap` view once per task and caches it keyed on the
 * broadcast buffer's identity (same backing bytes ⇒ same model), so the
 * per-row cost is pure hash lookups. The bigram map is NESTED
 * (`w1 → (w2 → c12)`) rather than a separator-joined flat key — tokens are
 * whitespace-split and may contain any non-space byte, so no separator is
 * collision-free.
 *
 * Score math is identical to the exploded path, term for term:
 * `-ln((c12 + k) / (c1 + k·V))` summed left-to-right over adjacent pairs;
 * `< 2` tokens (or null text) yields `(0, null)` — no evidence, matching
 * `explode_outer`'s null-row semantics. LmScoreSpec pins fused ≡ exploded
 * on real data.
 */
case class BigramNllExpr(tokens: Expression, bgMap: Expression,
                         pfxMap: Expression, vocab: Expression, k: Double)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, bgMap, pfxMap, vocab)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nll_sum", DoubleType, nullable = true)))
  override def prettyName: String = "bigram_nll"

  // Per-task hash views of the broadcast model maps. Identity key: the
  // UnsafeMapData's backing buffer + offset — every row of a task reads the
  // same broadcast bytes, so the view builds once per task, not per row.
  @transient private var bgKey: (AnyRef, Long) = _
  @transient private var bgView:
    java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]] = _
  @transient private var pfxKey: (AnyRef, Long) = _
  @transient private var pfxView: java.util.HashMap[String, java.lang.Long] = _

  private def identityOf(m: MapData): (AnyRef, Long) = m match {
    case u: UnsafeMapData => (u.getBaseObject, u.getBaseOffset)
    case other => (other, 0L)
  }

  private def buildFlat(m: MapData): java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long](m.numElements() * 2)
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      h.put(ks.getUTF8String(i).toString, vs.getLong(i))
      i += 1
    }
    h
  }

  private def buildNested(m: MapData)
      : java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]] = {
    val h = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]](
      m.numElements() * 2)
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      h.put(ks.getUTF8String(i).toString, buildFlat(vs.getMap(i)))
      i += 1
    }
    h
  }

  private def strAt(a: ArrayData, i: Int): String = {
    val u = a.getUTF8String(i)
    if (u == null) "" else u.toString
  }

  override def eval(input: InternalRow): Any = {
    val toksAny = tokens.eval(input)
    if (toksAny == null) return InternalRow(0L, null)
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 2) return InternalRow(0L, null)

    val bgData = bgMap.eval(input).asInstanceOf[MapData]
    val bgId = identityOf(bgData)
    if (bgView == null || bgKey != bgId) { bgView = buildNested(bgData); bgKey = bgId }
    val pfxData = pfxMap.eval(input).asInstanceOf[MapData]
    val pfxId = identityOf(pfxData)
    if (pfxView == null || pfxKey != pfxId) { pfxView = buildFlat(pfxData); pfxKey = pfxId }
    val v = vocab.eval(input) match {
      case null => 0L
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }

    var sum = 0.0
    var w1 = strAt(toks, 0)
    var i = 0
    while (i < n - 1) {
      val w2 = strAt(toks, i + 1)
      val inner = bgView.get(w1)
      val c12 = if (inner == null) 0L else {
        val x = inner.get(w2); if (x == null) 0L else x.longValue()
      }
      val c1o = pfxView.get(w1)
      val c1 = if (c1o == null) 0L else c1o.longValue()
      sum += -Math.log((c12 + k) / (c1 + k * v))
      w1 = w2
      i += 1
    }
    InternalRow((n - 1).toLong, sum)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), bgMap = newChildren(1),
      pfxMap = newChildren(2), vocab = newChildren(3))
}

object LmExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: struct(n_bigrams, nll_sum) for a token array scored
    * against broadcast model maps `w1→(w2→c12)` (nested) and `w1→c1`. */
  def bigram_nll(tokens: Column, bgMap: Column, pfxMap: Column,
                 vocab: Column, k: Double): Column =
    ColumnBridge.column(BigramNllExpr(
      ColumnBridge.expression(tokens), ColumnBridge.expression(bgMap),
      ColumnBridge.expression(pfxMap), ColumnBridge.expression(vocab), k))
}
