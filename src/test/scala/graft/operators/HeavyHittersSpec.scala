package graft.operators

import graft.SparkSuite
import graft.expressions.SketchExpressions
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("cms_estimate round-trips the count_min_sketch aggregate exactly when wide") {
    // width 2/eps = 2000 cells for 4 distinct items → no collisions, so
    // every estimate must equal the true count (CMS is exact sans collision)
    val df = (Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c", "d")).toDF("w")
    val sk = df.agg(expr("count_min_sketch(w, 0.001d, 0.99d, 42)").as("sk"))
    val est = df.distinct()
      .crossJoin(sk)
      .select(col("w"), SketchExpressions.cms_estimate(col("sk"), col("w")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("a" -> 7L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
  }

  test("estimates never undercount, even with a deliberately tiny sketch") {
    // eps 0.9 → width 3: collisions guaranteed over 50 distinct items; the
    // one-sided CMS guarantee (estimate ≥ truth) must still hold for all
    val df = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"tok$i")).toDF("w")
    val sk = df.agg(expr("count_min_sketch(w, 0.9d, 0.5d, 7)").as("sk"))
    val truth = df.groupBy("w").count()
    val bad = truth.crossJoin(sk)
      .select(col("w"), col("count"),
        SketchExpressions.cms_estimate(col("sk"), col("w")).as("est"))
      .filter(col("est") < col("count"))
    assert(bad.count() === 0)
  }

  test("top-k verdict query: exact counts, all within the eps bound on real docs") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "a cat and a dog")).toDF("doc_id", "text")
    val out = HeavyHitters.topTermsWithCmsVerdict(docs, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.head === (("the", 3L, true)))
    assert(out.forall(_._3), s"verdict tripped: ${out.mkString(", ")}")
    // top-3 by (count desc, term): the=3, then a/cat/dog/sat at 2 → a, cat
    assert(out.map(_._1).toSeq === Seq("the", "a", "cat"))
  }
}
