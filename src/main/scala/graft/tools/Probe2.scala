package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant A/B probe for the per-query bench floor. */
object Probe2 {
  def time(label: String, reps: Int)(f: => Long): Unit = {
    f // warm
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"$label%-40s min=${ts.head}%.3f p50=${ts(reps / 2)}%.3f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("PROBE_AQE", "false")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"AQE=$aqe")

    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .repartition(32).persist()
    events.count()

    def agg(): DataFrame = events
      .groupBy(col("ts").cast("date").as("d"))
      .agg(count("event_id").as("n_events"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("event_date"), col("n_events"))

    time("agg only (no sort)", 10) { agg().count() }
    time("agg + orderBy", 10) { agg().orderBy("event_date").count() }
    time("agg + coalesce1 sortWithin", 10) {
      agg().coalesce(1).sortWithinPartitions("event_date").count()
    }
    time("agg + orderBy collect", 10) { agg().orderBy("event_date").collect().length.toLong }
    time("agg + c1sw collect", 10) {
      agg().coalesce(1).sortWithinPartitions("event_date").collect().length.toLong
    }
    // how much of the floor is the scan of the persisted table?
    time("bare count of persisted", 10) { events.count() }
    time("narrow filter count", 10) { events.filter(col("event_type") === "error").count() }
    spark.stop()
  }
}
