package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSuite {
  import spark.implicits._

  private def src(n: Int, tag: String) =
    (0 until n).map(i => (i.toLong, s"$tag doc $i")).toDF("id", "text")

  test("integer weights repeat the source exactly, tagged by epoch") {
    val out = Mixing.mixCorpora(Seq(("a", src(100, "a"), 2.0)), "id")
    assert(out.count() === 200)
    assert(out.groupBy("mix_epoch").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap === Map(0 -> 100L, 1 -> 100L))
    // epoch 1 is an exact copy of epoch 0's rows
    val e0 = out.filter($"mix_epoch" === 0).select("id", "text")
    val e1 = out.filter($"mix_epoch" === 1).select("id", "text")
    assert(e0.exceptAll(e1).isEmpty && e1.exceptAll(e0).isEmpty)
  }

  test("fractional weight keeps roughly that share, in a dedicated partial epoch") {
    val out = Mixing.mixCorpora(Seq(("a", src(1000, "a"), 1.4)), "id")
    val byEpoch = out.groupBy("mix_epoch").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byEpoch(0) === 1000L)
    assert(byEpoch(1) > 300L && byEpoch(1) < 500L, s"epoch 1 = ${byEpoch(1)}")
    // and the partial epoch is the deterministic sample — rerun is identical
    val again = Mixing.mixCorpora(Seq(("a", src(1000, "a"), 1.4)), "id")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("partial epochs of different sources/epochs are salted independently") {
    // same underlying ids in two sources with the same weight: the sampled
    // id sets must differ (no correlated selection across the recipe)
    val out = Mixing.mixCorpora(
      Seq(("a", src(1000, "a"), 0.3), ("b", src(1000, "b"), 0.3)), "id")
    val aIds = out.filter($"mix_source" === "a").select("id").as[Long].collect().toSet
    val bIds = out.filter($"mix_source" === "b").select("id").as[Long].collect().toSet
    assert(aIds !== bIds)
  }

  test("append-stable: growing a source never changes which old rows are mixed") {
    val before = Mixing.mixCorpora(Seq(("a", src(500, "a"), 0.5)), "id")
      .select("id").as[Long].collect().toSet
    val after = Mixing.mixCorpora(Seq(("a", src(1000, "a"), 0.5)), "id")
      .filter($"id" < 500).select("id").as[Long].collect().toSet
    assert(before === after)
  }

  test("scanOnce ≡ union form, row-identical; and it reads each source once") {
    // the 100 TB shape: epoch replication by explode must produce the exact
    // multiset of the union-of-scans form (full epochs AND the salted
    // partial), while referencing the source once instead of ⌈w⌉ times
    val sources = Seq(("a", src(1000, "a"), 2.3), ("b", src(500, "b"), 0.25))
    val once = Mixing.mixCorpora(sources, "id", scanOnce = true)
    val union = Mixing.mixCorpora(sources, "id", scanOnce = false)
    assert(once.exceptAll(union).isEmpty && union.exceptAll(once).isEmpty)

    val planOnce = once.queryExecution.executedPlan.toString
    val planUnion = union.queryExecution.executedPlan.toString
    def scans(p: String) = "LocalTableScan".r.findAllIn(p).size
    assert(scans(planOnce) === 2, s"scanOnce must read each source once:\n$planOnce")
    assert(scans(planUnion) === 4, "union form: 2+1 epochs of a, 1 of b")
    assert(planOnce.contains("Generate explode"), planOnce)
  }

  test("mixShuffled assigns a complete (shard, pos) order over the mixture") {
    val out = Mixing.mixShuffled(
      Seq(("a", src(300, "a"), 1.5), ("b", src(300, "b"), 0.5)),
      "id", seed = "e0", nShards = 4).cache()
    val n = out.count()
    assert(n > 520 && n < 680, s"n=$n") // 300 + ~150 + ~150
    out.groupBy("shard")
      .agg(count(lit(1)).as("cnt"), min("pos").as("lo"), max("pos").as("hi"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") === 1L && r.getAs[Long]("hi") === r.getAs[Long]("cnt"))
      }
    // duplicate ids from full epochs land at distinct stream positions
    assert(out.select("shard", "pos").distinct().count() === n)
    out.unpersist()
  }

  test("source names with ':' are rejected (composite-key injectivity)") {
    val e = intercept[IllegalArgumentException](
      Mixing.mixCorpora(Seq(("s:1", src(3, "a"), 1.0)), "id"))
    assert(e.getMessage.contains("':'"), e.getMessage)
  }

  test("reserved-name guard: a source carrying mix_epoch is rejected loudly") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, 0)).toDF("id", "mix_epoch")
    val e = intercept[IllegalArgumentException](
      Mixing.mixCorpora(Seq(("a", bad, 1.0)), "id"))
    assert(e.getMessage.contains("mix_epoch"), e.getMessage)
  }

  test("temperatureWeights: alpha=0.5 flattens shares; alpha=1 is identity") {
    val s = spark
    import s.implicits._
    // 90/10 split: sqrt-flattening must up-weight the small source
    val df = ((1 to 90).map(i => (i, "big")) ++ (1 to 10).map(i => (i, "small")))
      .toDF("id", "src")
    val w = Mixing.temperatureWeights(df, "src", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (nb, pb, qb, ub) = w("big"); val (ns, ps, qs, us) = w("small")
    assert(nb == 90L && ns == 10L)
    assert(math.abs(pb - 0.9) < 1e-12 && math.abs(ps - 0.1) < 1e-12)
    assert(math.abs(qb + qs - 1.0) < 1e-12)   // temp shares normalize
    assert(qs > ps && qb < pb)                // flattening direction
    assert(us > 1.0 && ub < 1.0)
    // exact values: q_small = sqrt(.1)/(sqrt(.9)+sqrt(.1))
    val z = math.sqrt(0.9) + math.sqrt(0.1)
    assert(math.abs(qs - math.sqrt(0.1) / z) < 1e-15)
    // alpha = 1: the mix is untouched (up_weight 1 for every source)
    Mixing.temperatureWeights(df, "src", alpha = 1.0)
      .collect().foreach(r => assert(math.abs(r.getDouble(4) - 1.0) < 1e-12))
  }

  test("temperatureWeights excludes NULL group keys (bit-reproducibility rule)") {
    val s = spark
    import s.implicits._
    // r13 advice: a null source label must not enter the group-sorted
    // normalizer fold — Spark's struct-null sort position differs from SQL
    // engines' NULLS LAST, so its presence would silently break the
    // documented cross-engine bit-exactness. House rule (CorpusDiff,
    // Sessionize): null keys are a DQ finding, excluded from the operator.
    val df = ((1 to 90).map(i => (i, "big")) ++ (1 to 10).map(i => (i, "small"))
      ++ (1 to 5).map(i => (i, null: String))).toDF("id", "src")
    val w = Mixing.temperatureWeights(df, "src", alpha = 0.5).collect()
    assert(w.length === 2, "null group must not surface as a source")
    assert(w.forall(r => !r.isNullAt(0)))
    // shares renormalize over the NON-null rows only (100, not 105)
    val shares = w.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(shares("big") - 0.9) < 1e-12)
    assert(math.abs(shares("small") - 0.1) < 1e-12)
  }

  test("temperatureWeights rejects a group column named like an output column") {
    val s = spark
    import s.implicits._
    val bad = Seq((1, "x")).toDF("n", "share")
    val e = intercept[IllegalArgumentException](
      Mixing.temperatureWeights(bad, "share"))
    assert(e.getMessage.contains("share"), e.getMessage)
  }
}
