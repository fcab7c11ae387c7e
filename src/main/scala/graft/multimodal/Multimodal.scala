package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract / resize / frame-sample
 * stages.
 *
 * The Spark-side plumbing (schema, partitioning, batch shape) is real; the
 * codec itself is a clearly-marked STUB — this container has no image/audio
 * libraries, so `decodeStub` parses a deterministic fake header instead of
 * real JPEG/WAV bytes. Swapping in a real codec is a one-function change in
 * `decodePartition` (the mapPartitions batch loop is codec-agnostic).
 *
 * Scale design:
 *  - media bytes never shuffle: every stage is a narrow mapPartitions over
 *    the scan, metadata-only projections shuffle instead;
 *  - `targetPartitionBytes` guides a repartitionByRange on id for writes so
 *    single oversized blobs don't skew partitions;
 *  - decode batches amortize per-record codec setup inside a partition,
 *    mirroring the Arrow-batch shape a vectorized UDF would use.
 */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("content", BinaryType),
    StructField("source_uri", StringType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_ms", LongType),
    StructField("feature", ArrayType(FloatType))))

  /**
   * Deterministic fixture generator: fake media blobs whose "header" encodes
   * width/height/frames in the first bytes (id-seeded, reproducible).
   */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val types = Seq("image", "audio", "video")
    val rows = (0 until n).map { i =>
      val t = types(i % 3)
      val w = 64 + (i * 37) % 1920
      val h = 64 + (i * 53) % 1080
      val frames = if (t == "video") 1 + (i % 240) else 1
      val header = java.nio.ByteBuffer.allocate(16)
        .putInt(w).putInt(h).putInt(frames).putInt(i)
      val payload = Array.tabulate[Byte](64)(j => ((i * 31 + j * 7) % 256).toByte)
      Row(i.toLong, t, header.array() ++ payload, s"synthetic://$t/$i")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, n / 1000)), mediaSchema)
  }

  /**
   * STUB codec: parses the synthetic 16-byte header. A real deployment
   * replaces this body with an actual decoder (e.g. TwelveMonkeys/ImageIO for
   * JPEG, javax.sound for WAV) — the signature and everything around it stays.
   */
  def decodeStub(mediaType: String, content: Array[Byte]): (Int, Int, Int, Long) = {
    if (content == null || content.length < 16) (0, 0, 0, 0L)
    else {
      val bb = java.nio.ByteBuffer.wrap(content)
      val w = bb.getInt; val h = bb.getInt; val frames = bb.getInt
      val durationMs = if (mediaType == "audio" || mediaType == "video")
        frames.toLong * 40L else 0L
      (w, h, frames, durationMs)
    }
  }

  /** Deterministic fake feature vector (content-hash-seeded, fixed dim). */
  private def featureStub(content: Array[Byte], dim: Int = 8): Array[Float] = {
    if (content == null) Array.fill(dim)(0f)
    else {
      var h = 1125899906842597L
      content.foreach(b => h = 31 * h + b)
      Array.tabulate(dim) { d =>
        val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
        ((x % 1000003L).toFloat / 1000003f)
      }
    }
  }

  /**
   * Decode + feature-extract: one narrow mapPartitions pass, batching rows
   * per partition (the batch loop is where a real codec would reuse its
   * native context across records).
   */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outEncoder = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("media_id", "media_type", "content")
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val t = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h, frames, dur) = decodeStub(t, bytes)
          Row(id, t, w, h, frames, dur, featureStub(bytes))
        }
      }(outEncoder)
      .toDF()
  }

  /**
   * Frame sampling for videos: every `stride`-th frame index as (media_id,
   * frame_idx) — metadata-only explosion; actual frame bytes would be cut in
   * the same mapPartitions as decode to keep payloads off the shuffle.
   */
  def sampleFrames(features: DataFrame, stride: Int = 24): DataFrame =
    features.filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /**
   * Resize stage (stub): records the target geometry next to the decoded one;
   * a real implementation rewrites `content` in the same narrow pass.
   */
  def resizePlan(features: DataFrame, maxSide: Int = 512): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height"), lit(1)))
    features
      .withColumn("scale", scale)
      .withColumn("out_width", (col("width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("height") * col("scale")).cast("int"))
  }

  /**
   * Write layout for blob tables: range-partition by id so a handful of huge
   * blobs can't skew a partition past `targetPartitionBytes`.
   */
  def writePartitioned(media: DataFrame, path: String,
                       targetPartitionBytes: Long = 128L << 20): Unit = {
    val approxBytes = media.select(
      sum(coalesce(length(col("content")), lit(0)))).head().getLong(0)
    val parts = math.max(1, (approxBytes / targetPartitionBytes).toInt)
    media.repartitionByRange(parts, col("media_id"))
      .write.mode("overwrite").parquet(path)
  }
}
