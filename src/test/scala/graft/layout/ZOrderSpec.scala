package graft.layout

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference Morton implementation on plain Scala longs. */
  private def morton(a: Int, b: Int): Long =
    (0 until 16).map { i =>
      ((((a >> i) & 1).toLong) << (2 * i + 1)) | ((((b >> i) & 1).toLong) << (2 * i))
    }.reduce(_ | _)

  test("interleave16 matches the reference bit interleave, positive at bit 31") {
    val samples = Seq((0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65535, 0), (0, 65535), (256, 255))
    val out = samples.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(out.toSeq === samples.map((morton _).tupled))
    assert(out.forall(_ >= 0L))
    assert(out(3) === (1L << 32) - 1) // (65535, 65535) fills all 32 bits
  }

  test("scaleTo16Bit clamps out-of-domain values to edge cells") {
    val out = Seq(-5.0, 0.0, 500.0, 1000.0, 2000.0).toDF("v")
      .select(ZOrder.scaleTo16Bit(col("v"), 0.0, 1000.0)).collect().map(_.getInt(0))
    assert(out(0) === 0)        // below min
    assert(out(1) === 0)
    assert(out(2) === 32768)    // midpoint
    assert(out(3) === 65535)    // == max would floor to 65536; clamped
    assert(out(4) === 65535)    // above max
  }

  test("z-order layout prunes on BOTH dims; single-column sort only on its own") {
    // uniform 2-D grid: every (x, y) combination in a 64x64 lattice scaled
    // to the 16-bit domain, 16 output files each way
    val n = 64
    val pts = (for (x <- 0 until n; y <- 0 until n)
      yield (x * 1024.0, y * 1024.0)).toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString
    ZOrder.writeZOrdered(pts, zDir, "x", 0, 65536, "y", 0, 65536, numFiles = 16)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def filesHit(dir: String, col: String, lo: Double, hi: Double): Long = {
      val env = ZOrder.fileEnvelopes(spark.read.parquet(dir), "x", "y")
      val (mn, mx) = if (col == "x") ("a_min", "a_max") else ("b_min", "b_max")
      env.filter(org.apache.spark.sql.functions.col(mx) >= lo &&
                 org.apache.spark.sql.functions.col(mn) <= hi).count()
    }
    // slab on x (1/4 of the domain): both layouts prune
    assert(filesHit(xDir, "x", 0, 16383) <= 5)
    assert(filesHit(zDir, "x", 0, 16383) <= 8)
    // slab on y: the x-sorted layout reads EVERY file; z-order skips most
    val zHitY = filesHit(zDir, "y", 0, 16383)
    val xHitY = filesHit(xDir, "y", 0, 16383)
    assert(xHitY === 16L)
    assert(zHitY <= 8L, s"z-order should skip files on y, hit $zHitY/16")
  }
}
