package graft.expressions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * Proves the per-pair vector expressions really generate compilable code:
 * `spark.sql.codegen.fallback=false` turns a codegen compile error from a
 * silent interpreted fallback into a test failure, and the results are
 * cross-checked against independently computed values (same float→double
 * per-element widening, same accumulation order → exact doubles).
 */
class VectorExprCodegenSpec extends SparkSuite {
  import spark.implicits._

  private def vec(i: Int): Array[Float] =
    Array.tabulate(16)(d => (i * d + 1).toFloat / 7f)

  test("vector_dot / vector_norm compile under codegen with fallback disabled") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // repartition keeps ConvertToLocalRelation from pre-evaluating the
      // projection driver-side (which would bypass codegen entirely)
      val df = (0 until 100).map(i => (i, vec(i))).toDF("id", "v").repartition(4)
      val out = df.select(col("id"),
        SketchExpressions.vector_dot(col("v"), col("v")).as("dot"),
        SketchExpressions.vector_norm(col("v")).as("norm"))
      val rows = out.collect()
      assert(rows.length === 100)
      // the projection stayed inside a WholeStageCodegen span — AQE's plan
      // string marks codegen stages with a "*(n)" prefix; assert it landed
      // on the Project carrying the vector expressions (post-execution: the
      // final plan is only materialized once stages run)
      val planStr = out.queryExecution.executedPlan.toString
      assert("""\*\(\d+\) Project \[id""".r.findFirstIn(planStr).isDefined, planStr)
      rows.foreach { r =>
        val v = vec(r.getInt(0))
        var acc = 0.0
        v.foreach(x => acc += x.toDouble * x.toDouble)
        assert(r.getDouble(1) === acc, s"dot mismatch id=${r.getInt(0)}")
        assert(r.getDouble(2) === math.sqrt(acc), s"norm mismatch id=${r.getInt(0)}")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("null vectors stay null through the generated code") {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1, Some(vec(1))), (2, None)).toDF("id", "v").repartition(2)
      val out = df.select(col("id"),
        SketchExpressions.vector_dot(col("v"), col("v")).as("dot"),
        SketchExpressions.vector_norm(col("v")).as("norm"))
        .collect().sortBy(_.getInt(0))
      assert(!out(0).isNullAt(1) && !out(0).isNullAt(2))
      assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("codegen and interpreted eval agree on double-typed (normalized) vectors") {
    val df = (0 until 50).map(i => (i, vec(i))).toDF("id", "v")
      .select(col("id"), SketchExpressions.normalize_vector(col("v")).as("nv"))
    // array<double> path of the element accessor
    val dots = df.select(SketchExpressions.vector_dot(col("nv"), col("nv")).as("d"))
      .as[Double].collect()
    dots.foreach(d => assert(math.abs(d - 1.0) < 1e-12, s"unit vector dot=$d"))
  }
}
