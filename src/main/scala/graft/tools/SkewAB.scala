package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Isolated A/B probe for the `j_skew_salted` bench row (r12/r13 verdict
 * item: the largest absolute >2× row — show the cost is the detection
 * sample + the salting the planted skew requires, or collapse it).
 *
 * Variants, all ending in the identical priority aggregation:
 *  - `full`      — the driver query: [[graft.operators.SkewJoin.saltedJoinTargeted]]
 *                  (sample → hot-key detect → broadcast mark → salted join)
 *  - `nodetect`  — targeted salting with the hot-key list precomputed once
 *                  OUTSIDE the timed plan (isolates the detection chain's cost)
 *  - `blanket`   — [[graft.operators.SkewJoin.saltedJoin]] (no detection,
 *                  every key salted: pays 4× dim replication instead)
 *  - `plain`     — the unsalted shuffle join (the stage-collapse variant:
 *                  what the operator's machinery costs over doing nothing)
 *  - `plainshj`  — unsalted but with the same shuffle_hash hint (separates
 *                  SMJ-vs-SHJ choice from the salting machinery)
 *
 * Methodology mirrors [[Probe]]: same session trims, noop sink, warmup
 * pass, min/median of SPARK_GRAFT_REPS interleaved repetitions.
 */
object SkewAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.broadcast.compress", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def T(name: String): DataFrame =
      graft.coverage.OperatorQueries.T(spark, sfDir, name)

    def skewedFact: DataFrame = T("lineitem")
      .select(
        when(pmod(col("l_orderkey"), lit(5)) === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("l_orderkey"),
        col("l_extendedprice"))
    def dim: DataFrame = T("orders").select("o_orderkey", "o_orderpriority")

    def agg(j: DataFrame): DataFrame = j
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
      .repartition(1).sortWithinPartitions(col("o_orderpriority"))

    // nodetect: the hot list is computed ONCE here (outside any timed run)
    // and joins the plan as a literal-backed broadcast frame — the same
    // mark/salt/join machinery as `full`, minus the in-plan detection.
    val hotKeys: Array[Long] = skewedFact
      .sample(withReplacement = false, 0.01, seed = 42L)
      .groupBy("l_orderkey").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 60) // 1% of the ~6k-row sample
      .collect().map(_.getLong(0))
    import spark.implicits._
    def hotDf: DataFrame = hotKeys.toSeq.toDF("__k")
      .withColumn("__hot", lit(1))

    def targetedNoDetect: DataFrame = {
      val large = skewedFact
      val hot = broadcast(hotDf)
      val salted = large
        .join(hot, large("l_orderkey") === hot("__k"), "left")
        .withColumn("__salt", when(col("__hot").isNotNull,
          pmod(xxhash64(large.columns.map(col): _*), lit(4)).cast("int"))
          .otherwise(lit(0)))
        .drop("__k", "__hot")
      val small = dim
      val replicated = small
        .join(broadcast(hotDf), small("o_orderkey") === col("__k"), "left")
        .withColumn("__salt", explode(when(col("__hot").isNotNull,
          array((0 until 4).map(lit): _*)).otherwise(array(lit(0)))))
        .drop("__k", "__hot")
        .hint("shuffle_hash")
      salted.join(replicated,
          salted("__salt") === replicated("__salt") &&
            salted("l_orderkey") === replicated("o_orderkey"))
        .drop("__salt")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "full" -> (() => agg(graft.operators.SkewJoin.saltedJoinTargeted(
        skewedFact, "l_orderkey", dim, "o_orderkey", saltFactor = 4))),
      "nodetect" -> (() => agg(targetedNoDetect)),
      "blanket" -> (() => agg(graft.operators.SkewJoin.saltedJoin(
        skewedFact, "l_orderkey", dim, "o_orderkey", saltFactor = 4))),
      "plain" -> (() => {
        val f = skewedFact; val d = dim
        agg(f.join(d, f("l_orderkey") === d("o_orderkey")))
      }),
      "plainshj" -> (() => {
        val f = skewedFact; val d = dim.hint("shuffle_hash")
        agg(f.join(d, f("l_orderkey") === d("o_orderkey")))
      })
    )

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val prepared = variants.map { case (n, f) => n -> f() }
    // result-set equality guard: every variant must agree before timing
    val ref = prepared.head._2.collect().map(_.toString).sorted.toSeq
    prepared.tail.foreach { case (n, df) =>
      val got = df.collect().map(_.toString).sorted.toSeq
      require(got == ref, s"variant $n diverges from full: $got vs $ref")
    }
    prepared.foreach { case (_, df) => run(df) } // warmup
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "10").toInt
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (n, df) <- prepared) {
      val t0 = System.nanoTime()
      run(df)
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    val load1 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"[SkewAB] sf=$sfDir reps=$reps loadavg1=$load1%.2f")
    prepared.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"[SkewAB] $n%-9s min=${ts.head}%.3f med=${ts(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
