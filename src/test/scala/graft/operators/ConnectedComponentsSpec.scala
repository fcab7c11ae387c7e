package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSuite {

  /** Driver-side union-find reference (test oracle only). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    // canonical label = min id in component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def toDf(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  private def collectLabels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    collectLabels(ConnectedComponents.components(toDf(edges), "src", "dst"))

  test("mixed graph: pairs, a triangle, a chain — labels match union-find") {
    val edges = Seq(
      (1L, 2L),                     // pair
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L), (21L, 22L), (22L, 23L), // chain (A≈B≈C≈D, no shortcut)
      (31L, 30L)                    // reversed direction
    )
    assert(run(edges) == unionFind(edges))
  }

  test("long path converges via pointer jumping (diameter 300 ≫ maxIters)") {
    val edges = (0L until 300L).map(i => (i, i + 1))
    val labels = run(edges)
    assert(labels.size == 301)
    assert(labels.values.forall(_ == 0L))
  }

  test("unrolled variant matches union-find and the convergent variant") {
    val edges = Seq(
      (1L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L) // diameter-4 path
    )
    val unrolled = collectLabels(
      ConnectedComponents.componentsUnrolled(toDf(edges), "src", "dst", rounds = 3))
    assert(unrolled == unionFind(edges))
    assert(unrolled == run(edges))
  }

  test("unrolled rounds=2 covers diameter 3 (the r15 declared-query setting)") {
    val edges = Seq((20L, 21L), (21L, 22L), (22L, 23L)) // diameter-3 path
    val unrolled = collectLabels(
      ConnectedComponents.componentsUnrolled(toDf(edges), "src", "dst", rounds = 2))
    assert(unrolled == unionFind(edges))
  }

  test("unrolled rounds=k does NOT cover diameter k+2 (the silent boundary, pinned)") {
    // r14 advice: the coverage guarantee weakened from ~2^rounds (with the
    // pointer jump) to rounds+1 (hash-min only) under the same parameter —
    // pin that the NEW bound is tight so the suite documents it: a
    // diameter-5 chain under rounds=3 under-merges (labels ≠ union-find).
    val edges = (0L to 4L).map(i => (i, i + 1)) // diameter-5 path, nodes 0..5
    val unrolled = collectLabels(
      ConnectedComponents.componentsUnrolled(toDf(edges), "src", "dst", rounds = 3))
    assert(unrolled != unionFind(edges),
      "rounds=3 unexpectedly covered diameter 5 — tighten the spec if the bound improved")
    // node 5 is rounds+1 = 4 hops from 0: it must still carry a non-0 label
    assert(unrolled(5L) != 0L)
  }

  test("assertConverged raises loudly where plain unrolling under-merges silently") {
    val edges = (0L to 4L).map(i => (i, i + 1)) // diameter 5 > rounds+1 = 4
    val df = ConnectedComponents.componentsUnrolled(toDf(edges), "src", "dst",
      rounds = 3, assertConverged = true)
    val e = intercept[Exception](df.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("labels still changing")), e.toString)
    // and on a COVERED graph the assert mode passes with identical labels
    val covered = Seq((1L, 2L), (2L, 3L)) // diameter 2 ≤ rounds+1
    val loud = collectLabels(ConnectedComponents.componentsUnrolled(
      toDf(covered), "src", "dst", rounds = 3, assertConverged = true))
    assert(loud == unionFind(covered))
  }

  test("duplicate and self edges are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))
    val labels = run(edges)
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 3L)
  }

  test("empty edge list yields empty labels") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(ConnectedComponents.components(df, "src", "dst").count() == 0)
  }

  test("nearDuplicateClusters: chain components collapse to one keeper each") {
    val s = spark
    import s.implicits._
    // 1↔2 near-dup, 2↔3 near-dup, 1↔3 similar but it does not matter:
    // the cluster must contain all three regardless; 4 is a singleton.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra more"),
      (4L, "completely different content about spark catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L)
    val convergent = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unrolled = Dedup.nearDuplicateClusters(docs, "doc_id", "text",
      threshold = 0.5, unrolledRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(convergent == expected)
    assert(unrolled == expected)
  }

  test("simhashVerifiedPairs matches the exact all-pairs jaccard decision") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank extra"),
      (3L, "unrelated text about columnar storage formats and predicate pushdown"),
      (4L, "unrelated text about columnar storage formats and predicate pushdown also")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashVerifiedPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact decision over all pairs
    val toks = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), Dedup.shinglesOfTokens(col("t")).as("sh"))
    val exact = toks.as("a").join(toks.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)))
  }

  test("string node ids are rejected loudly (silent long-cast would null labels)") {
    val s = spark
    import s.implicits._
    val e = intercept[IllegalArgumentException](
      ConnectedComponents.components(
        Seq(("a", "b")).toDF("src", "dst"), "src", "dst"))
    assert(e.getMessage.contains("integral node ids"), e.getMessage)
  }
}
