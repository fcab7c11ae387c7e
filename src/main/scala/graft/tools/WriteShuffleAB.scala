package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.operators.Shuffling

/**
 * A/B harness (builder tooling, not library surface) for the r10
 * `writeShuffled` change: the two-exchange Window form
 * (`shuffled → repartition(shard) → sortWithinPartitions → write`) vs the
 * fused one-exchange form (`shuffledLocalRank → write`). Both produce
 * identical files (ShufflingSpec pins row parity); this measures the wall
 * cost of the deleted exchange at a real scale point. Alternating reps,
 * min per variant, same session.
 */
object WriteShuffleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nShards = sys.env.getOrElse("SPARK_GRAFT_SHARDS", "16").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-wsab").toString

    def windowForm(path: String): Unit =
      Shuffling.shuffled(docs, "doc_id", "ab0", nShards)
        .repartition(nShards, col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    def fusedForm(path: String): Unit =
      Shuffling.writeShuffled(docs, "doc_id", "ab0", nShards, path)

    // warmup both once
    windowForm(s"$root/w"); fusedForm(s"$root/f")
    var minW = Double.MaxValue; var minF = Double.MaxValue
    for (_ <- 0 until reps) {
      val t0 = System.nanoTime(); windowForm(s"$root/w")
      minW = math.min(minW, (System.nanoTime() - t0) / 1e9)
      val t1 = System.nanoTime(); fusedForm(s"$root/f")
      minF = math.min(minF, (System.nanoTime() - t1) / 1e9)
    }
    // parity of the written artifacts, then report
    val a = spark.read.parquet(s"$root/w")
    val b = spark.read.parquet(s"$root/f")
    val same = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    println(f"""{"metric":"write_shuffle_ab","window_min":$minW%.3f,"fused_min":$minF%.3f,"ratio":${minF / minW}%.3f,"rows_identical":$same,"sf":"$sfDir","nShards":$nShards}""")
    spark.stop()
  }
}
