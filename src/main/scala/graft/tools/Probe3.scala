package graft.tools

import org.apache.spark.sql.SparkSession

/** Splits per-query cost into plan (analysis+optimization+physical planning)
  * vs execute, to size the prepared-statement opportunity. */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "6")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("j2_role_playing_join", "a1_group_multi_agg", "a2_distinct",
      "p6_case_label", "a4_daily_count", "a8_count_distinct", "p3_conjunctive_filter",
      "a_rollup", "w_row_number_latest", "f_datetime_extract")
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count()) // warm

    for (n <- names) {
      val fn = graft.SparkEntry.queries(n)
      val reps = 8
      val plans = new Array[Double](reps)
      val execs = new Array[Double](reps)
      for (i <- 0 until reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val _ = df.queryExecution.executedPlan // force plan
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        plans(i) = (t1 - t0) / 1e9
        execs(i) = (t2 - t1) / 1e9
      }
      println(f"$n%-26s plan_min=${plans.min}%.3f exec_min=${execs.min}%.3f")
    }
    spark.stop()
  }
}
