package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Registry consistency guard: the driver records a weaker rows-only check
 * for any query missing from `oracleSql`, so a rename or a forgotten oracle
 * entry silently DOWNGRADES certification instead of failing. Pin the
 * rows-only set to exactly the three documented-by-construction queries
 * (the IVF recall-gated rows — their candidate generation is driver-side
 * trained centroids, not replayable digit arithmetic — plus the
 * embedding-cosine scale row whose exact oracle is O((10N)²); the
 * embedding path itself is oracle-certified by the bounded-subsample twin
 * `dedup_embedding_cosine_10x_verified`, and `sim_lsh_recall` gained a
 * full candidate-set replay oracle in r14 via portable md5-derived
 * hyperplanes) — adding a query without an oracle, or orphaning an oracle
 * entry, fails here by name.
 */
class SparkEntrySpec extends AnyFunSuite {

  private val documentedRowsOnly = Set(
    "sim_ivf_recall", "sim_ivf_indexed",
    "dedup_embedding_cosine_10x")

  test("every query is oracle-backed except the documented rows-only three") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == documentedRowsOnly,
      s"rows-only set drifted: ${(q -- o).toSeq.sorted.mkString(", ")}")
  }

  test("no orphaned oracle entries (oracle without a query is dead weight)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
