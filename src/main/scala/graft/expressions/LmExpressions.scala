package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeMapData}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Identity key of a broadcast [[MapData]]'s backing buffer — the cache key
  * the view-building expressions ([[BigramNllExpr]], [[NbSumLogExpr]]) share:
  * every row of a task reads the same broadcast bytes, so equal identity ⇒
  * same model ⇒ the per-task hash view can be reused. One definition, so the
  * two caches can never drift on what "same model" means. */
private[expressions] object MapViewKey {
  def identityOf(m: MapData): (AnyRef, Long) = m match {
    case u: UnsafeMapData => (u.getBaseObject, u.getBaseOffset)
    case other => (other, 0L)
  }
}

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
    extends Expression with CodegenFallback with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(tokens, bgMap, pfxMap, vocab)
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] = Seq(
    ArrayType(StringType),
    MapType(StringType, MapType(StringType, LongType)),
    MapType(StringType, LongType),
    org.apache.spark.sql.graftbridge.TypeBridge.oneOf(LongType, IntegerType))
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nll_sum", DoubleType, nullable = true)))
  override def prettyName: String = "bigram_nll"

  // Per-task hash views of the broadcast model maps, with the per-term NLL
  // contributions PRE-COMPUTED at view-build time (round 7): the stored
  // value for a seen (w1,w2) is the full `-ln((c12+k)/(c1+k·v))` double,
  // the per-w1 fallback is the unseen-w2 term `-ln(k/(c1+k·v))`, and
  // `globalFallback` covers unseen w1 — so the per-bigram cost is a lookup
  // chain plus one add, zero `ln` calls on the hot path. `StrictMath.log`,
  // not `Math.log` (r11 review): Spark's `log` function evaluates via
  // StrictMath, and the bit-identity with the exploded sum(log(…))
  // formulation that LmScoreSpec pins requires the same ulps on EVERY
  // platform — Math.log's intrinsic is allowed to differ by 1 ulp, which
  // would break the pin (and the oracle hash) on a JVM where it does. Same
  // invariant [[NbSumLogExpr]] documents. Views are keyed by UTF8String —
  // content-hashed, so probes on the hot loop below compare the scan's raw
  // bytes with ZERO per-token String allocation; build-time keys are
  // cloned out of the broadcast buffer (vocab-bounded copies).
  // Identity key: the UnsafeMapData's backing buffer + offset — every row
  // of a task reads the same broadcast bytes, so views build once per task,
  // not per row ([[MapViewKey]]).
  @transient private var viewKey: (AnyRef, Long, AnyRef, Long, Long) = _
  @transient private var bgView:
    java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Double]] = _
  @transient private var pfxView: java.util.HashMap[UTF8String, java.lang.Double] = _
  @transient private var globalFallback: Double = _

  private def buildViews(bg: MapData, pfx: MapData, v: Long): Unit = {
    val kv = k * v
    // raw prefix counts first: the bigram NLLs need c1 per w1
    val c1s = new java.util.HashMap[UTF8String, java.lang.Long](pfx.numElements() * 2)
    val pks = pfx.keyArray(); val pvs = pfx.valueArray()
    var i = 0
    while (i < pfx.numElements()) {
      c1s.put(pks.getUTF8String(i).clone(), pvs.getLong(i))
      i += 1
    }
    pfxView = new java.util.HashMap[UTF8String, java.lang.Double](pfx.numElements() * 2)
    val it = c1s.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      pfxView.put(e.getKey,
        -StrictMath.log((0L + k) / (e.getValue.longValue() + kv)))
    }
    globalFallback = -StrictMath.log((0L + k) / (0L + kv))
    bgView = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Double]](
      bg.numElements() * 2)
    val ks = bg.keyArray(); val vs = bg.valueArray()
    i = 0
    while (i < bg.numElements()) {
      val w1 = ks.getUTF8String(i).clone()
      val c1o = c1s.get(w1)
      val c1 = if (c1o == null) 0L else c1o.longValue()
      val inner = vs.getMap(i)
      val h = new java.util.HashMap[UTF8String, java.lang.Double](inner.numElements() * 2)
      val iks = inner.keyArray(); val ivs = inner.valueArray()
      var j = 0
      while (j < inner.numElements()) {
        h.put(iks.getUTF8String(j).clone(),
          -StrictMath.log((ivs.getLong(j) + k) / (c1 + kv)))
        j += 1
      }
      bgView.put(w1, h)
      i += 1
    }
  }

  // null tokens normalize to "" — the [[BigramCountsExpr]] training
  // convention, so training and scoring can never disagree on such an input
  private def strAt(a: ArrayData, i: Int): UTF8String = {
    val u = a.getUTF8String(i)
    if (u == null) UTF8String.EMPTY_UTF8 else u
  }

  override def eval(input: InternalRow): Any = {
    val toksAny = tokens.eval(input)
    if (toksAny == null) return InternalRow(0L, null)
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < 2) return InternalRow(0L, null)

    val bgData = bgMap.eval(input).asInstanceOf[MapData]
    val pfxData = pfxMap.eval(input).asInstanceOf[MapData]
    val v = vocab.eval(input) match {
      case null => 0L
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    val bgId = MapViewKey.identityOf(bgData)
    val pfxId = MapViewKey.identityOf(pfxData)
    val key = (bgId._1, bgId._2, pfxId._1, pfxId._2, v)
    if (bgView == null || viewKey != key) { buildViews(bgData, pfxData, v); viewKey = key }

    var sum = 0.0
    var w1 = strAt(toks, 0)
    var i = 0
    while (i < n - 1) {
      val w2 = strAt(toks, i + 1)
      val inner = bgView.get(w1)
      val hit = if (inner == null) null else inner.get(w2)
      if (hit != null) sum += hit.doubleValue()
      else {
        val f = pfxView.get(w1)
        sum += (if (f == null) globalFallback else f.doubleValue())
      }
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

/**
 * Per-document bigram counts from an `array<string>` token column:
 * `array<struct<w1,w2,cnt>>` of the document's DISTINCT adjacent pairs with
 * their occurrence counts, built in one imperative pass (round-6 verdict
 * item 1, the [[TermCountsExpr]] pattern applied to LM training). The
 * explode→groupBy training aggregation materializes one row per bigram
 * OCCURRENCE through the partial hash aggregate — the dominant cost of
 * training inside the query. Exploding this array instead emits one row per
 * distinct per-doc bigram with its count already final, so the partial
 * aggregate (and the exchange behind it) sees the collapsed stream;
 * `sum(cnt)` downstream reproduces `count(*)` over occurrences exactly.
 * `< 2` tokens (or a null array) yields an empty array — same no-bigram
 * semantics as [[graft.text.LmScore.bigramsOf]]. Null array elements cannot
 * occur (the tokenizer never produces them); if a non-tokenizer caller ever
 * supplies one it is NORMALIZED to "" — the same convention the scorers
 * ([[BigramNllExpr]]/[[NbSumLogExpr]]) apply, so training and scoring can
 * never disagree on such an input (a null key would also collide with the
 * model builders' null-tagged vocabulary entries and poison
 * `map_from_entries`).
 */
case class BigramCountsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bigram_counts"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.LinkedHashMap[(UTF8String, UTF8String), Long](
      math.max(16, n))
    def at(i: Int): UTF8String = {
      val u = arr.getUTF8String(i)
      if (u == null) UTF8String.EMPTY_UTF8 else u   // scorer convention
    }
    var prev = at(0)
    var i = 1
    while (i < n) {
      val cur = at(i)
      val key = (prev, cur)
      val c = counts.get(key)
      if (c == 0L) {
        // clone on first insert: the UTF8Strings may point into a reused
        // scan/row buffer, and the map keys must outlive this row
        counts.put((prev.clone(), cur.clone()), 1L)
      } else counts.put(key, c + 1L)
      prev = cur
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(
        Array[Any](e.getKey._1, e.getKey._2, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Fused multinomial-Naive-Bayes evidence sums (round-6 verdict item 1
 * applied to the NB score path): per document, `n_tokens` and the per-class
 * `Σ_t ln(count(c,t) + 1)` over the token array in ONE pass against a
 * broadcast token→class-counts model — no per-token explode, no broadcast
 * join, no per-document aggregation. Accumulation order is left-to-right
 * over token occurrences, per class — exactly the order the exploded
 * formulation's partial aggregate saw (a document's exploded rows are
 * contiguous in one partition), so sums are BIT-IDENTICAL to the join-based
 * path (NaiveBayesSpec pins this). Unseen tokens contribute `ln(0+1) = 0`
 * per class, matching the left join's coalesce-to-0. Empty/null token
 * arrays yield `(0, [0.0…])` — the same all-zero evidence the explode_outer
 * placeholder row produced.
 *
 * The model map arrives as Catalyst [[MapData]] (linear-scan lookups); a
 * `java.util.HashMap` view builds once per task, cache-keyed on the
 * broadcast buffer's identity — the [[BigramNllExpr]] mechanism. Like all
 * view-caching expressions here, one instance must be evaluated by a single
 * thread (Spark's task model guarantees this).
 */
case class NbSumLogExpr(tokens: Expression, model: Expression, nClasses: Int)
    extends Expression with CodegenFallback with ExpectsInputTypes {

  import org.apache.spark.sql.catalyst.util.GenericArrayData

  require(nClasses >= 1, s"nClasses must be >= 1, got $nClasses")

  override def children: Seq[Expression] = Seq(tokens, model)
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.TypeBridge.AbstractType] = Seq(
    ArrayType(StringType),
    MapType(StringType, ArrayType(LongType)))
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "nb_sum_log"

  @transient private var modelKey: (AnyRef, Long) = _
  @transient private var modelView: java.util.HashMap[UTF8String, Array[Double]] = _

  // The view stores each token's per-class `ln(count+1)` contributions
  // PRE-COMPUTED (round 7) — StrictMath.log, not Math.log: Spark's `log`
  // function evaluates via StrictMath, and bit-identity with the exploded
  // sum(log(…)) formulation (r6's certified output) requires the same ulps.
  // Unseen tokens contribute ln(0+1) = +0.0 per class, which never changes
  // a sum that starts at +0.0 and only ever adds non-negative terms, so the
  // hot loop skips them entirely. UTF8String keys (content-hashed): probes
  // compare the scan's raw bytes, zero per-token String allocation; the
  // vocab-bounded build clones its keys out of the broadcast buffer.
  private def buildView(m: MapData): java.util.HashMap[UTF8String, Array[Double]] = {
    val h = new java.util.HashMap[UTF8String, Array[Double]](m.numElements() * 2)
    val ks = m.keyArray(); val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val cs = vs.getArray(i).toLongArray()
      val ls = new Array[Double](cs.length)
      var c = 0
      while (c < cs.length) { ls(c) = StrictMath.log(cs(c) + 1.0); c += 1 }
      h.put(ks.getUTF8String(i).clone(), ls)
      i += 1
    }
    h
  }

  override def eval(input: InternalRow): Any = {
    val sums = new Array[Double](nClasses)
    val toksAny = tokens.eval(input)
    var n = 0
    if (toksAny != null) {
      val mData = model.eval(input).asInstanceOf[MapData]
      val mId = MapViewKey.identityOf(mData)
      if (modelView == null || modelKey != mId) {
        modelView = buildView(mData); modelKey = mId
      }
      val toks = toksAny.asInstanceOf[ArrayData]
      val len = toks.numElements()
      var i = 0
      // Null elements are SKIPPED — excluded from n_tokens and from the
      // model lookup — matching the exploded formulation exactly:
      // `count(col("t"))` ignores nulls and a null join key never matches.
      // (The tokenizer never emits nulls, but the fused path must not
      // silently diverge for a caller that does — ADVICE r7.)
      while (i < len) {
        val u = toks.getUTF8String(i)
        if (u != null) {
          n += 1
          val ls = modelView.get(u)
          if (ls != null) {
            var c = 0
            while (c < nClasses) { sums(c) += ls(c); c += 1 }
          }
        }
        i += 1
      }
    }
    InternalRow(n.toLong,
      new GenericArrayData(sums.map(d => java.lang.Double.valueOf(d): Any)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), model = newChildren(1))
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

  /** Column wrapper: array<struct<w1,w2,cnt>> of a token array's distinct
    * adjacent pairs with occurrence counts (map-side bigram collapse). */
  def bigram_counts(tokens: Column): Column =
    ColumnBridge.column(BigramCountsExpr(ColumnBridge.expression(tokens)))

  /** Column wrapper: struct(n_tokens, sums) — per-class Σ ln(count+1) of a
    * token array against a broadcast `token → array<class-count>` model. */
  def nb_sum_log(tokens: Column, model: Column, nClasses: Int): Column =
    ColumnBridge.column(NbSumLogExpr(
      ColumnBridge.expression(tokens), ColumnBridge.expression(model), nClasses))
}
