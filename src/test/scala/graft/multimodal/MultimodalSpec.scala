package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.syntheticMedia(spark, 300)

  test("synthetic media has the contract schema") {
    assert(media.schema == Multimodal.mediaSchema)
    assert(media.count() == 300)
  }

  test("decode+featurize produces typed metadata and fixed-dim features") {
    val f = Multimodal.decodeAndFeaturize(media).cache()
    assert(f.count() == 300)
    assert(f.schema == Multimodal.featureSchema)
    // header round-trip: width/height parse back exactly
    val r = f.filter(col("media_id") === 0L).head()
    assert(r.getAs[Int]("width") == 64)
    assert(r.getAs[Int]("height") == 64)
    assert(f.filter(size(col("feature")) =!= 8).count() == 0)
    // videos carry frame counts and duration; images do not
    assert(f.filter(col("media_type") === "video" && col("n_frames") <= 0).count() == 0)
    assert(f.filter(col("media_type") === "image" && col("duration_ms") =!= 0L).count() == 0)
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.decodeAndFeaturize(media).select("media_id", "feature")
    val b = Multimodal.decodeAndFeaturize(media).select("media_id", "feature")
    assert(a.exceptAll(b).count() == 0)
  }

  test("frame sampling yields stride-spaced indices only for videos") {
    val f = Multimodal.decodeAndFeaturize(media)
    val frames = Multimodal.sampleFrames(f, stride = 24)
    val joined = frames.join(f, Seq("media_id"))
    assert(joined.filter(col("media_type") =!= "video").count() == 0)
    assert(frames.filter(col("frame_idx") % 24 =!= 0).count() == 0)
  }

  test("resize plan never upscales and preserves aspect ratio bounds") {
    val plan = Multimodal.resizePlan(Multimodal.decodeAndFeaturize(media), maxSide = 512)
    assert(plan.filter(col("out_width") > greatest(col("width"), lit(512))).count() == 0)
    assert(plan.filter(col("scale") > 1.0).count() == 0)
  }
}
