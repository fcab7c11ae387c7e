package graft.layout

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableLayoutSpec extends SparkSuite {

  test("compaction collapses a many-small-files table into few files, losslessly") {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"
    // simulate the reference's one-file-per-50-events bronze: 20 tiny files
    (1 to 20).foreach { b =>
      (1 to 50).map(i => (b * 1000 + i).toLong).toDF("id")
        .coalesce(1).write.mode("append").parquet(in)
    }
    assert(TableLayout.dataFileCount(spark, in) == 20)
    TableLayout.compactSmallFiles(spark, in, out)
    assert(TableLayout.dataFileCount(spark, out) == 1)   // 20 files ≪ 128MB
    assert(spark.read.parquet(out).count() == 1000)
    assert(spark.read.parquet(out).agg(sum("id")).head().getLong(0) ==
      spark.read.parquet(in).agg(sum("id")).head().getLong(0))
  }

  test("bucketed tables join and aggregate without a shuffle on the bucket key") {
    val s = spark
    import s.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val facts = (1 to 10000).map(i => (i.toLong % 500, i.toDouble)).toDF("k", "v")
      val dims = (0 until 500).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
      TableLayout.writeBucketed(facts, "facts_b", "k", buckets = 8)
      TableLayout.writeBucketed(dims, "dims_b", "k", buckets = 8)
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join still shuffled:\n" + plan)
      assert(joined.count() == 10000)
      // groupBy on the bucket key: no exchange either
      val agg = spark.table("facts_b").groupBy("k").agg(sum("v"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        "bucketed aggregation still shuffled")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
