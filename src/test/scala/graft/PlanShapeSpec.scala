package graft

import graft.coverage.OperatorQueries
import graft.models.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/**
 * Physical-plan shape assertions — the scale contract, machine-checked:
 * filters and projections reach the parquet scan, dims broadcast, top-k
 * fuses, and nothing silently degrades to a cartesian/nested-loop join.
 * (A plan that passes correctness but loses these properties would still
 * "work" at sf0.01 and melt at 100 TB.)
 */
class PlanShapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val p = plan(OperatorQueries.p3ConjunctiveFilter(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull"), p)
    // pruned read schema: only the two projected + filtered columns
    assert(!p.contains("l_extendedprice"), "column pruning lost: " + p)
  }

  test("the 5-way role-playing join is all broadcast hash joins") {
    val p = plan(OperatorQueries.j2RolePlayingJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dim join degraded to SMJ: " + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("top-k fuses into TakeOrderedAndProject (no global sort)") {
    val p = plan(OperatorQueries.o3TopK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("fact_event: six left joins, every one broadcast at reference scale") {
    // other suites may have cached this same plan — a CacheManager hit would
    // render an InMemoryRelation (whose stored plan double-counts the joins)
    spark.catalog.clearCache()
    val raw = spark.read.parquet(fixturePath("raw_logistics.parquet"))
    val w = Warehouse.fromRaw(raw)
    val p = plan(w.factEvent)
    // status/carrier are hinted; order/time/location×2 carry no hint but
    // auto-broadcast here because planner stats say they fit the threshold
    assert(!p.contains("SortMergeJoin"), "a dim join fell back to SMJ: " + p)
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 6, s"expected 6 broadcast joins, got $bhj: " + p)
  }

  test("fact_event: outgrown order/time/location dims degrade to SMJ, bounded dims stay broadcast") {
    // Simulate dim_order/dim_time/dim_location outgrowing broadcast range
    // (all three are linear-ish in the fact — dim_location is 1,234 rows for
    // 617 facts in the reference fixture) by disabling auto-broadcast: the
    // unhinted joins must fall back to a shuffle join, while the size-gated
    // explicit hints on status/carrier keep those broadcast regardless.
    spark.catalog.clearCache()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val raw = spark.read.parquet(fixturePath("raw_logistics.parquet"))
      val w = Warehouse.fromRaw(raw)
      val p = plan(w.factEvent)
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      assert(bhj == 2, s"expected the 2 hinted broadcasts to survive, got $bhj: " + p)
      assert(smj >= 4,
        s"expected order+time+location×2 joins to shuffle-join, got $smj: " + p)
      assert(!p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fact_event: bucketed fact+dim_order join is SMJ with zero shuffle") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.catalog.clearCache()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val raw = spark.read.parquet(fixturePath("raw_logistics.parquet"))
      val w = Warehouse.fromRaw(raw)
      graft.layout.TableLayout.writeBucketed(w.valid, "valid_b", "order_id", buckets = 8)
      graft.layout.TableLayout.writeBucketed(
        w.dimOrder, "dim_order_b", "order_id", buckets = 8)
      val fact = graft.models.Facts.factEvent(
        spark.table("valid_b"), spark.table("dim_order_b"),
        w.dimTime, w.dimStatus, w.dimLocation, w.dimCarrier)
      // unwrap AQE's root (its wrapped plan is not a child for collect)
      val root = fact.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      val orderJoins = root.collect {
        case smj: SortMergeJoinExec
            if smj.leftKeys.exists(_.references.exists(_.name == "order_id")) => smj
      }
      assert(orderJoins.nonEmpty, "order join did not plan as SMJ:\n" + root)
      val shuffles = orderJoins.head.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        "bucketed order join still shuffles:\n" + orderJoins.head)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS valid_b")
      spark.sql("DROP TABLE IF EXISTS dim_order_b")
    }
  }

  test("runtime bloom-filter pruning injects on a selective dim-filtered shuffle join") {
    // The 100 TB lever for non-broadcast joins: when a dim carries a
    // selective filter but the join must shuffle (dim outgrew broadcast),
    // Catalyst's InjectRuntimeFilter builds a bloom filter over the dim's
    // surviving keys and applies it to the fact scan BEFORE the fact-side
    // Exchange — the shuffle then carries only rows that can match. Default
    // size thresholds (10 MB creation side / 10 GB probe-side scan) exist
    // precisely because the win only pays at scale; lower them here to pin
    // that the mechanism engages on our join shape. Production sessions
    // keep the defaults — this is a planner capability check, not a bench
    // tweak.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must fit UNDER this bound; probe-side scan must
      // exceed its threshold — relax both so the sf0.001 shapes qualify
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_totalprice")
      val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      val p = plan(lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(org.apache.spark.sql.functions.sum("l_quantity")))
      assert(p.toLowerCase.contains("bloomfilter"),
        "runtime bloom filter not injected: " + p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("anti-join dedup broadcasts the key set (no full shuffle of incoming)") {
    val p = plan(OperatorQueries.s7AntiJoinDedup(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("grouped aggregation is partial + final (map-side combine)") {
    val p = plan(OperatorQueries.a1GroupMultiAgg(spark, dir))
    assert(p.contains("partial_"), "no partial aggregation: " + p)
  }

  test("deterministic sampling is a shuffle-free narrow filter") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Sampling.deterministicSample(docs, "doc_id", 0.1))
    assert(!p.contains("Exchange"), "sampling must not shuffle: " + p)
    assert(p.contains("Filter"), p)
  }

  test("int8 quantization is a shuffle-free narrow projection") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = plan(graft.operators.VectorQuantization.quantizeInt8(embs, "embedding"))
    assert(!p.contains("Exchange"), "quantization must not shuffle: " + p)
  }

  test("decontamination broadcasts the eval shingle set, never SMJ-ing the train side") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Decontamination.contaminationReport(
      docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"),
      "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "train side fell into a sort-merge join: " + p)
    // the only exchange is the per-doc count aggregation (+ broadcast build)
    assert(p.contains("partial_"), "overlap count lost map-side combine: " + p)
  }

  test("corpus top-terms fuses its top-20 into TakeOrderedAndProject") {
    val p = plan(graft.coverage.LlmOpQueries.tTopTerms(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    // per-doc dedup happens map-side (term_counts map keys): the only
    // exchange carries (term, partial count) pairs for the final agg
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges: " + p)
  }

  test("salient terms: tf is map-side, exactly two exchanges, no join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.TextAnalysis.salientTerms(docs, "doc_id", "text", 1))
    // term_counts finalizes tf before any shuffle; the only exchanges are
    // the df window (by term) and the rank window (by doc)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected exactly 2 hash exchanges, got $exchanges: " + p)
    assert(p.contains("term_counts"), "map-side tf expression missing: " + p)
    assert(!p.contains("Join"), "tf-idf must not plan a join: " + p)
  }

  test("filter cascade decides in one narrow pass (no exchange, no join)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.FilterCascade.gopherRecipe(docs, "text"))
    assert(!p.contains("Exchange"), "the decision itself must not shuffle: " + p)
    assert(!p.contains("Join"), p)
  }

  test("LM scoring: model rides as scalar subqueries, score path fused and shuffle-free") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scored = graft.text.LmScore.perplexityFilter(
      docs, "doc_id", "text", org.apache.spark.sql.functions.col("lang") === "en")
    val p = plan(scored)
    // model (nested bigram map, prefix map, vocab scalar) rides as scalar
    // subqueries whose training aggregations live inside the projection's
    // subquery EXPRESSIONS; collecting the operator tree's node names gives
    // the per-document score path alone — it must contain no join and no
    // explode. A broadcast JOIN of the map would copy model bytes into
    // every output row (the sf1-10× super-linearity found in round 6).
    assert(p.contains("bigram_nll"), "fused scoring expression missing: " + p)
    assert(p.contains("Subquery"), "model must ride as subqueries: " + p)
    val root = scored.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    val banned = root.collect { case n => n.nodeName }
      .filter(n => n.contains("Join") || n.contains("Generate"))
    assert(banned.isEmpty, s"score path must not join/explode, found $banned in: $p")
  }

  test("HTML extraction and z-order keys are shuffle-free narrow projections") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ph = plan(docs.select(
      graft.text.HtmlExtract.extractText(org.apache.spark.sql.functions.col("text"))))
    assert(!ph.contains("Exchange"), "html strip must run at scan speed: " + ph)
    val pz = plan(docs.select(graft.layout.ZOrder.zValue(
      org.apache.spark.sql.functions.col("doc_id"), 0, 1e6,
      org.apache.spark.sql.functions.col("n_chars"), 0, 1e4)))
    assert(!pz.contains("Exchange"), "morton key must be narrow: " + pz)
    // "*(1)" is executedPlan.toString's WholeStageCodegen span marker: the
    // whole 32-term shift/mask tree compiles into one codegen'd projection
    assert(pz.contains("*(1) Project"), "morton projection fell out of codegen: " + pz)
  }

  test("chunking is a shuffle-free narrow explode") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.text.Chunking.chunkByTokens(docs, "doc_id", "text", 32, 24))
    assert(!p.contains("Exchange"), "chunking must not shuffle: " + p)
    assert(p.contains("Generate"), "expected the posexplode Generate node: " + p)
  }

  test("bounded aggregate outputs plan no range partitioning (no sampling double-execution)") {
    // orderBy's RangePartitioning SAMPLES its child by executing the plan
    // once before the real shuffle — for key-domain-bounded outputs the
    // round-6 contract is coalesce(1)/repartition(1) + in-partition sort.
    // Regressing any of these back to orderBy roughly doubles the query.
    val qs = Seq(
      OperatorQueries.a5TwoKeyCount(spark, dir),
      OperatorQueries.a6ConditionalAgg(spark, dir),
      OperatorQueries.j1LeftJoinAgg(spark, dir),
      OperatorQueries.j7AggAggJoin(spark, dir),
      OperatorQueries.aRollup(spark, dir),
      OperatorQueries.wSessionize(spark, dir),
      OperatorQueries.wRowNumberLatest(spark, dir))
    for (q <- qs) {
      val p = plan(q)
      assert(!p.contains("rangepartitioning"),
        "bounded output regressed to a global range sort: " + p)
    }
    // the window-holding queries keep their width: the 1-partition exchange
    // must sit ABOVE the window, not collapse it
    val pw = plan(OperatorQueries.wSessionize(spark, dir))
    assert(pw.contains("Window"), pw)
    assert(pw.contains("SinglePartition") || pw.contains("Exchange"),
      "expected the bounded-result barrier exchange: " + pw)
  }

  test("per-domain cap shuffles once on the group key") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Sampling.capPerGroup(docs, "doc_id", "source", 5))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges: " + p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }
}
