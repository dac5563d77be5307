package graft

import graft.operators.{ImageHash, Multimodal, VideoFingerprint}

class VideoFingerprintSpec extends SparkSpec {
  import spark.implicits._

  /** Frame painter for a balanced 8×8-block pattern: block i bright iff
    * ((i + phase) & 3) < 2 — any two phases differ in 32 or 64 blocks. */
  private def pattern(phase: Int, dark: Int = 40, bright: Int = 160,
                      noiseSeed: Long = -1L): (Int, Int) => Int =
    (x, y) => {
      val block = (y / 4) * 8 + x / 4
      val base = if (((block + phase) & 3) < 2) bright else dark
      val noise =
        if (noiseSeed < 0) 0
        else ((noiseSeed * 31L + y * 32L + x) % 3L).toInt - 1
      math.max(0, math.min(255, base + noise))
    }

  private def clip(phases: Seq[Int], dark: Int = 40, bright: Int = 160,
                   noiseSeed: Long = -1L): Array[Byte] =
    Multimodal.gifFileAnimGray(32, 32,
      phases.map(p => pattern(p, dark, bright, noiseSeed)))

  test("animated GIF roundtrip: every frame's pixels survive exactly") {
    val frames = Seq(pattern(0), pattern(1), pattern(2))
    val bytes = Multimodal.gifFileAnimGray(32, 32, frames)
    val decoded = Multimodal.decodeGifFramesGray(bytes).get
    assert(decoded.length === 3)
    decoded.zip(frames).foreach { case ((w, h, gray), f) =>
      assert((w, h) === ((32, 32)))
      for (y <- 0 until 32; x <- 0 until 32)
        assert(gray(y * 32 + x) === f(x, y))
    }
    // single-frame decode of an animation = its first frame
    val (w1, h1, first) = Multimodal.decodeGifGray(bytes).get
    assert((w1, h1) === ((32, 32)))
    assert(first.toSeq === decoded.head._3.toSeq)
    // maxFrames caps mid-stream
    assert(Multimodal.decodeGifFramesGray(bytes, maxFrames = 2).get.length === 2)
  }

  test("fingerprint: brightness/contrast/noise-invariant, word order temporal") {
    val a = VideoFingerprint.fingerprint(
      Multimodal.decodeGifFramesGray(clip(Seq(0, 1, 2, 3, 0, 1),
        dark = 40, bright = 160, noiseSeed = 7L)).get)
    val b = VideoFingerprint.fingerprint(
      Multimodal.decodeGifFramesGray(clip(Seq(0, 1, 2, 3, 0, 1),
        dark = 70, bright = 195, noiseSeed = 13L)).get)
    assert(a.toSeq === b.toSeq, "aHash must cancel per-copy jitter")
    // the re-sequenced clip (frames reversed) moves whole words
    val rev = VideoFingerprint.fingerprint(
      Multimodal.decodeGifFramesGray(clip(Seq(1, 0, 3, 2, 1, 0))).get)
    val dist = a.zip(rev).map { case (x, y) =>
      java.lang.Long.bitCount(x ^ y) }.sum
    assert(dist >= 32, s"re-sequencing must be far, got $dist")
  }

  test("pairing: same clip pairs at 0, distinct clips never pair") {
    val sigs = (0L until 40L).map { id =>
      val g = (id % 4L).toInt
      (id, VideoFingerprint.fingerprint(
        Multimodal.decodeGifFramesGray(clip(
          (0 until 6).map(f => g + f),
          dark = 40 + (id % 7L).toInt * 5,
          bright = 160 + (id % 5L).toInt * 7, noiseSeed = id)).get))
    }.toDF("doc_id", "sig")
    val pairs = VideoFingerprint.videoNearDupPairs(sigs).collect()
    val intra = pairs.filter(r => r.getLong(0) % 4 == r.getLong(1) % 4)
    assert(intra.forall(_.getLong(2) === 0L))
    assert(intra.length === 4 * 10 * 9 / 2, "all same-clip duos recalled")
    assert(pairs.length === intra.length, "no cross-clip pair")
  }

  test("hot-bucket valve: a still-image corpus yields no pairs under the cap") {
    val still = (0L until 30L).map(id =>
      (id, Array.fill(3)(0x1234567890abcdefL))).toDF("doc_id", "sig")
    val capped = VideoFingerprint.videoNearDupPairs(still, maxBucket = 10)
    assert(capped.count() === 0L, "every band bucket exceeds the valve")
    val uncapped = VideoFingerprint.videoNearDupPairs(still)
    assert(uncapped.count() === 30L * 29 / 2)
  }

  test("sceneCuts: counts exactly the planted segment boundaries") {
    val frames = Multimodal.decodeGifFramesGray(
      clip(Seq(0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2), noiseSeed = 3L)).get
    assert(VideoFingerprint.sceneCuts(frames) === 2)
    val steady = Multimodal.decodeGifFramesGray(
      clip(Seq.fill(12)(1), noiseSeed = 5L)).get
    assert(VideoFingerprint.sceneCuts(steady) === 0)
  }

  test("video probe lifts to streaming: stateless stream-static band join") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def sig(phases: Seq[Int], seed: Long): Array[Long] =
      VideoFingerprint.fingerprint(
        Multimodal.decodeGifFramesGray(clip(phases,
          dark = 40 + (seed % 7L).toInt * 5,
          bright = 160 + (seed % 5L).toInt * 7, noiseSeed = seed)).get)
    val corpus = Seq(
      (10L, sig((0 until 6).map(f => 0 + f), 3L)),
      (11L, sig((0 until 6).map(f => 1 + f), 5L))).toDF("doc_id", "sig")
    val index = Dedup.sigBandIndexMulti(corpus, words = 3, bands = 24)
      .localCheckpoint(true)
    val stream = MemoryStream[(Long, Array[Long])]
    val out = Dedup.streamingProbeNearDupsMulti(index,
      stream.toDF().toDF("doc_id", "sig"), words = 3, bands = 24, maxDist = 6)
    val q = out.writeStream.format("memory")
      .queryName("video_sprobe_test").outputMode("append").start()
    try {
      // a re-encoded copy of clip 0 (new jitter) and an unrelated clip
      stream.addData((20L, sig((0 until 6).map(f => 0 + f), 9L)),
        (21L, sig((0 until 6).map(f => 2 + f), 9L)))
      q.processAllAvailable()
      val pairs = spark.table("video_sprobe_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).distinct
      assert(pairs.toSeq === Seq((20L, 10L, 0L)),
        "the copy matches at distance 0 on every band; the stranger never")
    } finally q.stop()
  }

  test("reports match their planting on a small id range") {
    val docs = (0L until 40L).toDF("doc_id")
    val dedup = VideoFingerprint.videoDedupReport(spark, docs, maxDocs = 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dedup.toSeq === (0L until 4L).map(g => (g, 10L, 45L, 0L)))
    val probe = VideoFingerprint.videoProbeReport(spark, docs,
      maxDocs = 40L, corpusCut = 28L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(probe.toSeq === (0L until 4L).map(g => (g, 3L, 7L, 21L, 0L)))
    val scenes = VideoFingerprint.videoSceneReport(spark, docs, maxDocs = 6L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(scenes.toSeq === (0L until 6L).map(id => (id, 12L, id % 3)))
  }
}
