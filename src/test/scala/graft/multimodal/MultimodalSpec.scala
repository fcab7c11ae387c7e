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

  test("real decode: committed BMP/PPM/WAV files parse to their true dimensions") {
    // The fixture files are genuine format files (the WAV was written by a
    // stock wave library, the BMP/PPM by hand to spec) — parsing them proves
    // the decoders read the real formats, not a lookalike.
    def bytesOf(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getResource(s"/multimodal/$name").toURI))
    assert(Multimodal.decode("image", bytesOf("tiny_4x3.bmp")) == ((4, 3, 1, 0L)))
    assert(Multimodal.decode("image", bytesOf("tiny_5x2.ppm")) == ((5, 2, 1, 0L)))
    // 200 samples at 8 kHz mono 16-bit = 25 ms
    assert(Multimodal.decode("audio", bytesOf("tiny_200samp.wav")) == ((0, 0, 200, 25L)))
  }

  test("real decode runs end-to-end through the mapPartitions pass") {
    val f = Multimodal.decodeAndFeaturize(Multimodal.realSampleMedia(spark))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Int]("n_frames"), r.getAs[Long]("duration_ms")))).toMap
    assert(f(9000001L) == ((32, 16, 1, 0L)))   // BMP
    assert(f(9000002L) == ((24, 8, 1, 0L)))    // PPM
    assert(f(9000003L) == ((0, 0, 1600, 200L))) // WAV: 1600 frames / 8 kHz
  }

  test("decode sniffs malformed/truncated payloads to zeros, never throws") {
    assert(Multimodal.decode("image", null) == ((0, 0, 0, 0L)))
    assert(Multimodal.decode("image", Array[Byte]('B', 'M')) == ((0, 0, 0, 0L)))
    assert(Multimodal.decode("image", Array[Byte]('P', '6', ' ')) == ((0, 0, 0, 0L)))
    val riffOnly = "RIFF\u0000\u0000\u0000\u0000WAVE".getBytes("US-ASCII")
    assert(Multimodal.decode("audio", riffOnly) == ((0, 0, 0, 0L)))
  }

  // ------------------------------------------------- ImageIO (PNG/JPEG/GIF)

  test("PNG round-trip: dimensions, channels, and FORMULA pixel sums (codec-independent ground truth)") {
    val info = Multimodal.decodeImage(Multimodal.pngBytes(40, 20))
    assert(info.ok)
    assert((info.width, info.height, info.nFrames, info.channels) == ((40, 20, 1, 3)))
    // sums derived from the generator formula alone (r=(7x+3y)%256, …) —
    // equality proves the write+decode path is pixel-exact, not just shaped
    assert((info.sumR, info.sumG, info.sumB) ==
      ((Some(95904L), Some(104512L), Some(102112L))))
  }

  test("JPEG decodes to true geometry; pixel sums deliberately absent (lossy)") {
    val info = Multimodal.decodeImage(Multimodal.jpegBytes(32, 16))
    assert(info.ok)
    assert((info.width, info.height, info.nFrames, info.channels) == ((32, 16, 1, 3)))
    assert(info.sumR.isEmpty && info.sumG.isEmpty && info.sumB.isEmpty)
  }

  test("GIF: 16-level palette round-trips pixel-exact; animated GIF reports real frame count") {
    val gif = Multimodal.decodeImage(Multimodal.gifBytes(24, 10))
    assert(gif.ok)
    assert((gif.width, gif.height, gif.nFrames) == ((24, 10, 1)))
    assert((gif.sumR, gif.sumG, gif.sumB) ==
      ((Some(30736L), Some(30736L), Some(30736L))))
    val anim = Multimodal.decodeImage(Multimodal.gifAnimatedBytes(20, 8, 3))
    assert(anim.ok)
    assert((anim.width, anim.height, anim.nFrames) == ((20, 8, 3)))
    // first-frame sums = offset-0 formula
    assert(anim.sumR == Some(20400L))
  }

  test("corrupt/truncated image payloads fail SOFT: ok=false zeros, never an exception") {
    // truncated mid-IHDR: the PNG magic sniffs, the decode fails
    assert(!Multimodal.decodeImage(Multimodal.pngBytes(40, 20).take(24)).ok)
    // truncated mid-pixel-data
    val png = Multimodal.pngBytes(40, 20)
    assert(!Multimodal.decodeImage(png.take(png.length / 2)).ok)
    // garbage, empty, null
    assert(!Multimodal.decodeImage(Array.fill[Byte](16)(0xDE.toByte)).ok)
    assert(!Multimodal.decodeImage(Array.emptyByteArray).ok)
    assert(!Multimodal.decodeImage(null).ok)
    // a corrupt payload decodes to all-zero facts, not partial ones
    val bad = Multimodal.decodeImage(png.take(24))
    assert((bad.width, bad.height, bad.nFrames, bad.channels) == ((0, 0, 0, 0)))
    assert(bad.sumR.isEmpty)
  }

  test("decode() sniffs PNG/JPEG/GIF magics into the ImageIO path") {
    assert(Multimodal.decode("image", Multimodal.pngBytes(40, 20)) == ((40, 20, 1, 0L)))
    assert(Multimodal.decode("image", Multimodal.jpegBytes(32, 16)) == ((32, 16, 1, 0L)))
    assert(Multimodal.decode("image", Multimodal.gifAnimatedBytes(20, 8, 3)) == ((20, 8, 3, 0L)))
  }

  test("decodeImageFacts: the mapPartitions pass carries fail-soft rows and sums end-to-end") {
    val s = spark
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "image", Multimodal.pngBytes(40, 20), "png"),
      org.apache.spark.sql.Row(2L, "image", Array.fill[Byte](16)(0x7F.toByte), "junk"))
    val df = s.createDataFrame(s.sparkContext.parallelize(rows, 1),
      Multimodal.mediaSchema)
    val facts = Multimodal.decodeImageFacts(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(facts(1L).getBoolean(1) && facts(1L).getInt(2) == 40)
    assert(facts(1L).getLong(6) == 95904L)
    assert(!facts(2L).getBoolean(1) && facts(2L).isNullAt(6))
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

  test("corrupt WAV chunk sizes fail soft, never hang or throw") {
    // a negative RIFF chunk size (0xFFFFFFF8) used to advance the offset by
    // ZERO — an executor spinning forever on one fuzzed blob
    val evil = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(evil, 0)
    "WAVE".getBytes.copyToArray(evil, 8)
    "fmt ".getBytes.copyToArray(evil, 12)
    evil(16) = 0xF8.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0xFF.toByte   // size = -8 (LE)
    assert(Multimodal.decode("audio", evil) == ((0, 0, 0, 0L)))
    // and a size driving the offset negative must not throw either
    val evil2 = evil.clone(); evil2(16) = 0x80.toByte
    assert(Multimodal.decode("audio", evil2) == ((0, 0, 0, 0L)))
    // r12: a LARGE POSITIVE size (0x7FFFFFF0) passed the negative guard but
    // overflowed the Int advance to a negative offset → uncaught
    // StringIndexOutOfBounds; Long arithmetic walks off the end instead
    val evil3 = evil.clone()
    evil3(16) = 0xF0.toByte; evil3(17) = 0xFF.toByte
    evil3(18) = 0xFF.toByte; evil3(19) = 0x7F.toByte  // size = 0x7FFFFFF0 (LE)
    assert(Multimodal.decode("audio", evil3) == ((0, 0, 0, 0L)))
  }

  test("unknown real formats report not-decodable, never stub-fabricated geometry") {
    // r12 review: an MP4's 'ftyp' bytes used to reach decodeStub and decode
    // as n_frames ≈ 1.8e9 — which sampleFrames would explode into ~73M rows
    val mp4ish = new Array[Byte](64)
    mp4ish(0) = 0; mp4ish(1) = 0; mp4ish(2) = 0; mp4ish(3) = 0x20
    "ftypisom".getBytes.copyToArray(mp4ish, 4)
    assert(Multimodal.decode("video", mp4ish) == ((0, 0, 0, 0L)))
    // while the magic-prefixed synthetic format still decodes
    val synth = Multimodal.syntheticMedia(spark, 3).collect()
      .map(r => (r.getString(1),
        Multimodal.decode(r.getString(1), r.getAs[Array[Byte]]("content"))))
    synth.foreach { case (_, (w, h, f, _)) =>
      assert(w >= 64 && h >= 64 && f >= 1, synth.mkString(","))
    }
  }

  test("writePartitioned of an EMPTY media frame writes an empty table") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm-empty").toString
    val empty = Seq((1L, "image", Array[Byte](1, 2, 3))).toDF("media_id", "media_type", "content")
      .filter(col("media_id") < 0)
    Multimodal.writePartitioned(empty, s"$tmp/out")   // used to NPE on sum()=null
    assert(spark.read.parquet(s"$tmp/out").count() === 0)
  }

  // ── aHash (r13): hand-derived ground truth for constructed patterns ──
  // 16x16 gray BMPs, 8x8 grid => 2x2 cells; bit (cy*8+cx) set iff the
  // cell mean exceeds the global mean. The expected longs below are
  // derived FROM THE PATTERNS, not from running the implementation.

  private def halfLR(x: Int, y: Int): Int = if (x < 8) 0 else 255
  private def halfTB(x: Int, y: Int): Int = if (y < 8) 0 else 255
  private def checker(x: Int, y: Int): Int =
    if (((x / 2) + (y / 2)) % 2 == 0) 0 else 255

  test("aHash64: block patterns hash to their hand-derived values") {
    // left dark / right bright: bits cx>=4 per row => every byte 0xF0
    assert(Multimodal.aHash64(Multimodal.bmpBytesOf(16, 16, halfLR))
      === Some(0xF0F0F0F0F0F0F0F0L))
    // top dark / bottom bright: rows cy>=4 => high 4 bytes 0xFF
    assert(Multimodal.aHash64(Multimodal.bmpBytesOf(16, 16, halfTB))
      === Some(0xFFFFFFFF00000000L))
    // constant image: no cell exceeds the mean => 0
    assert(Multimodal.aHash64(Multimodal.bmpBytesOf(16, 16, (_, _) => 128))
      === Some(0L))
    // cell-granular checkerboard: odd (cx+cy) bright => bytes 0xAA/0x55
    assert(Multimodal.aHash64(Multimodal.bmpBytesOf(16, 16, checker))
      === Some(0x55AA55AA55AA55AAL))
    // one-pixel edit inside a bright cell does not flip its bit
    val nearDup = Multimodal.bmpBytesOf(16, 16,
      (x, y) => if (x == 9 && y == 0) 254 else halfLR(x, y))
    assert(Multimodal.aHash64(nearDup) === Some(0xF0F0F0F0F0F0F0F0L))
    // one whole cell flipped = exactly one bit
    val oneCell = Multimodal.bmpBytesOf(16, 16,
      (x, y) => if (x < 2 && y < 2) 255 else checker(x, y))
    assert(Multimodal.aHash64(oneCell) === Some(0x55AA55AA55AA55ABL))
    // gates: JPEG and garbage decline
    assert(Multimodal.aHash64(Multimodal.jpegBytes(16, 16)).isEmpty)
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    // PNG of the same pattern hashes identically (format-independent)
    // (pngBytes draws the formula image, so build a PNG from the BMP's
    // pixels via ImageIO round-trip)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.bmpBytesOf(16, 16, halfLR)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.aHash64(bos.toByteArray) === Some(0xF0F0F0F0F0F0F0F0L))
  }

  test("cellAxis: no Int overflow at >=2^28-px dimensions (r14 advice fix)") {
    // p*8 overflows Int at p >= 2^28; the old Int math returned a negative
    // cell index there, aHash64 threw, and NonFatal silently declined the
    // very panoramas the BigInt comparison threshold targets. Pin the Long
    // math directly — allocating a 2^28-wide frame is not testable.
    val big = 1 << 28
    assert(Multimodal.cellAxis(big, big + 1) === 7)       // last pixel band
    assert(Multimodal.cellAxis(big - 1, big) === 7)
    assert(Multimodal.cellAxis(Int.MaxValue - 1, Int.MaxValue) === 7)
    assert(Multimodal.cellAxis(Int.MaxValue / 2, Int.MaxValue) === 3)
    assert(Multimodal.cellAxis(0, Int.MaxValue) === 0)
    // unchanged small-image regime (the hand-derived hashes above rely on it)
    assert((0 until 16).map(Multimodal.cellAxis(_, 16))
      === (0 until 16).map(_ / 2))
  }

  test("aHashNearDupPairs: pigeonhole recall + exact hamming verify") {
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row(1L, "image", Multimodal.bmpBytesOf(16, 16, halfLR), "p1"),
      Row(2L, "image", Multimodal.bmpBytesOf(16, 16,
        (x, y) => if (x == 9 && y == 0) 254 else halfLR(x, y)), "p2"),
      Row(3L, "image", Multimodal.bmpBytesOf(16, 16, halfTB), "p3"),
      Row(4L, "image", Multimodal.bmpBytesOf(16, 16, (_, _) => 128), "p4"),
      Row(5L, "image", Multimodal.jpegBytes(16, 16), "p5"),
      Row(7L, "image", Multimodal.bmpBytesOf(16, 16, checker), "p7"),
      Row(8L, "image", Multimodal.bmpBytesOf(16, 16,
        (x, y) => if (x < 2 && y < 2) 255 else checker(x, y)), "p8"))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val got = Multimodal.aHashNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 0), (7L, 8L, 1)))
  }

  // ── audio energy hash (r13): hand-derived ground truth ──
  // 1024 mono 16-bit samples => 64 segments of 16; bit k = segment mean
  // |amplitude| > global mean |amplitude|.

  private def quietLoud(i: Int): Short =
    if (i < 512) 0 else (if (i % 2 == 0) 16384 else -16384).toShort
  private def segAlt(i: Int): Short =
    if ((i / 16) % 2 == 1) 16384.toShort else 0.toShort

  test("wavEnergyHash64: constructed signals hash to their hand-derived values") {
    import graft.multimodal.Multimodal._
    // quiet first half / loud second half => bits 32..63
    assert(wavEnergyHash64(wavBytesOf(Array.tabulate(1024)(quietLoud)))
      === Some(0xFFFFFFFF00000000L))
    // one-sample edit inside a loud segment does not flip its bit
    val edited = Array.tabulate(1024)(quietLoud); edited(512) = 16383
    assert(wavEnergyHash64(wavBytesOf(edited)) === Some(0xFFFFFFFF00000000L))
    // alternating segments => odd bits
    assert(wavEnergyHash64(wavBytesOf(Array.tabulate(1024)(segAlt)))
      === Some(0xAAAAAAAAAAAAAAAAL))
    // one segment flipped from quiet to loud = exactly one bit
    val oneSeg = Array.tabulate[Short](1024)(i =>
      if (i < 16) 16384.toShort else segAlt(i))
    assert(wavEnergyHash64(wavBytesOf(oneSeg)) === Some(0xAAAAAAAAAAAAAAABL))
    // constant amplitude: nothing above the mean
    assert(wavEnergyHash64(wavBytesOf(Array.fill[Short](1024)(5000)))
      === Some(0L))
    // gates: stereo, garbage, and empty-data payloads decline
    assert(wavEnergyHash64(
      wavBytesOf(Array.fill[Short](64)(1), channels = 2)).isEmpty)
    assert(wavEnergyHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(wavEnergyHash64(wavBytesOf(Array.emptyShortArray)).isEmpty)
  }

  test("audioNearDupPairs: envelope pairs at the hand-derived distances") {
    import org.apache.spark.sql.Row
    import graft.multimodal.Multimodal._
    val edited = Array.tabulate(1024)(quietLoud); edited(512) = 16383
    val oneSeg = Array.tabulate[Short](1024)(i =>
      if (i < 16) 16384.toShort else segAlt(i))
    val rows = Seq(
      Row(1L, "audio", wavBytesOf(Array.tabulate(1024)(quietLoud)), "a1"),
      Row(2L, "audio", wavBytesOf(edited), "a2"),
      Row(3L, "audio", wavBytesOf(Array.tabulate(1024)(segAlt)), "a3"),
      Row(4L, "audio", wavBytesOf(oneSeg), "a4"),
      Row(5L, "audio", wavBytesOf(Array.fill[Short](64)(1), channels = 2), "a5"))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), mediaSchema)
    val got = audioNearDupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 2L, 0), (3L, 4L, 1)))
  }

  test("incremental media near-dup: cross pairs only, replayed ids excluded") {
    import org.apache.spark.sql.Row
    import graft.multimodal.Multimodal._
    def quarter(x: Int, y: Int): Int = if (x < 8 && y < 8) 255 else 0
    def halfTB(x: Int, y: Int): Int = if (y < 8) 0 else 255
    val corpus = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "image", bmpBytesOf(16, 16, halfLR), "c1"),
      Row(2L, "image", bmpBytesOf(16, 16, checker), "c2"),
      Row(3L, "image", jpegBytes(16, 16), "c3"),     // declines — not indexed
      Row(4L, "image", bmpBytesOf(16, 16, halfTB), "c4")), 2), mediaSchema)
    val idx = aHashChunkIndex(corpus)
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(10L, "image", bmpBytesOf(16, 16,               // near-dup of c1
        (x, y) => if (x == 10 && y == 1) 254 else halfLR(x, y)), "b1"),
      Row(11L, "image", bmpBytesOf(16, 16,               // 1 cell off c2
        (x, y) => if (x < 2 && y < 2) 255 else checker(x, y)), "b2"),
      Row(12L, "image", bmpBytesOf(16, 16, quarter), "b3"), // novel
      Row(4L, "image", bmpBytesOf(16, 16, halfTB), "b4")), 2), // REPLAYED id
      mediaSchema)
    val got = incrementalAHashPairs(batch, idx, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // b1->c1 at 0, b2->c2 at 1; the novel image pairs with nothing; the
    // replayed id 4 is excluded ENTIRELY — without the guard it would
    // self-report (4, 4, 0)
    assert(got === Set((10L, 1L, 0), (11L, 2L, 1)))
  }

  test("incremental media near-dup probes a bucketed index with ZERO corpus-side Exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.Row
    import graft.multimodal.Multimodal._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpus = spark.createDataFrame(spark.sparkContext.parallelize(
        (0 until 64).map(i => Row(i.toLong, "image",
          bmpBytesOf(16, 16, (x, y) => if (((x / 2 + y / 2 + i) % 2) == 0) 0 else 255),
          s"c$i")), 2), mediaSchema)
      graft.layout.TableLayout.writeBucketed(
        aHashChunkIndex(corpus), "phash_idx_b", Seq("ci", "cv"), buckets = 8)
      val batch = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1000L, "image", bmpBytesOf(16, 16, checker), "b")), 1), mediaSchema)
      val pairs = incrementalAHashPairs(batch, spark.table("phash_idx_b"))
      val root = pairs.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.inputPlan
        case p => p
      }
      def hasIdxScan(p: SparkPlan): Boolean = p.collect {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == "phash_idx_b") => f
      }.nonEmpty
      val joins = root.collect {
        case j: SortMergeJoinExec if hasIdxScan(j) => j: SparkPlan
        case j: ShuffledHashJoinExec if hasIdxScan(j) => j: SparkPlan
      }
      assert(joins.nonEmpty, "candidate join did not plan as a shuffle join:\n" + root)
      val (l, r) = joins.last match {
        case j: SortMergeJoinExec => (j.left, j.right)
        case j: ShuffledHashJoinExec => (j.left, j.right)
      }
      val idxSide = if (hasIdxScan(l)) l else r
      assert(idxSide.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "the bucketed index side was re-shuffled:\n" + idxSide)
      // and it still answers: the checker batch matches the i-even corpus
      // members (same cell parity => distance 0 or 1-ish small), none others
      assert(pairs.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
