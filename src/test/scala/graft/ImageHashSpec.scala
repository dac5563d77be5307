package graft

import graft.operators.{ImageHash, Jpeg}

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def render(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(i => f(i % w, i / w))

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def cells(ax: Int, ay: Int, noiseSeed: Long)(x: Int, y: Int): Int = {
    val base = if (((x / 4) * ax + (y / 4) * ay) % 4 < 2) 200 else 55
    val noise =
      if (noiseSeed < 0) 0
      else ((noiseSeed * 7919L + x * 31L + y * 17L) % 3L).toInt - 1
    math.max(0, math.min(255, base + noise))
  }

  /** deterministic smooth field (photo-like full spectrum): bilinear
    * interpolation of an 8×8 knot grid hashed from (seed, i, j) —
    * pHash's median threshold needs this kind of spread; on flat-spectrum
    * synthetic patterns most coefficients cluster at zero and the
    * threshold jitters (why [[ImageHash.aHash]] exists). */
  private def field(seed: Long)(x: Int, y: Int): Int = {
    def knot(i: Int, j: Int): Int = {
      val v = (seed ^ (i * 0x9E3779B9L) ^ (j * 0x85EBCA6BL)) * 0xC2B2AE3D27D4EB4FL
      ((v >>> 56) & 0xffL).toInt
    }
    val fx = x * 8 / 32.0; val fy = y * 8 / 32.0
    val i = math.min(7, fx.toInt); val j = math.min(7, fy.toInt)
    val tx = fx - i; val ty = fy - j
    val v = (1 - tx) * (1 - ty) * knot(i, j) + tx * (1 - ty) * knot(i + 1, j) +
      (1 - tx) * ty * knot(i, j + 1) + tx * ty * knot(i + 1, j + 1)
    math.max(0, math.min(255, v.toInt))
  }

  test("pHash on photo-like fields: JPEG re-encoding moves at most a " +
    "couple of bits, distinct fields stay separated") {
    val hs = (0L until 8L).map(s =>
      ImageHash.pHash(render(32, 32, field(s)), 32, 32))
    for (s <- 0L until 8L) {
      val bytes = Jpeg.jpegFileGray(32, 32, field(s))
      val Some((w, h, g)) = Jpeg.decodeJpegGray(bytes)
      val d = hamming(hs(s.toInt), ImageHash.pHash(g, w, h))
      assert(d <= 3, s"field $s: JPEG moved $d bits")
    }
    for (i <- 0 until 8; j <- i + 1 until 8)
      assert(hamming(hs(i), hs(j)) >= 5,
        s"fields $i,$j too close: ${hamming(hs(i), hs(j))}")
    // deterministic
    assert(hs(0) === ImageHash.pHash(render(32, 32, field(0)), 32, 32))
  }

  test("aHash: mean threshold is noise- and JPEG-stable on bimodal " +
    "content (where pHash's median jitters)") {
    val clean = ImageHash.aHash(render(32, 32, cells(1, 0, -1L)), 32, 32)
    // ±1 noise + lossy JPEG: zero to very few flips
    for (seed <- 0L until 8L) {
      val bytes = Jpeg.jpegFileGray(32, 32, cells(1, 0, seed))
      val Some((w, h, g)) = Jpeg.decodeJpegGray(bytes)
      val d = hamming(clean, ImageHash.aHash(g, w, h))
      assert(d <= 2, s"seed $seed moved $d bits")
    }
    // distinct layouts flip whole blocks
    val layouts = Seq((1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 2), (1, 2))
    val hs = layouts.map { case (ax, ay) =>
      ImageHash.aHash(render(32, 32, cells(ax, ay, -1L)), 32, 32)
    }
    for (i <- hs.indices; j <- i + 1 until hs.length)
      assert(hamming(hs(i), hs(j)) >= 16,
        s"layouts $i,$j too close: ${hamming(hs(i), hs(j))}")
  }

  test("banding finds every pair within Hamming < bands (pigeonhole)") {
    val base = ImageHash.aHash(render(32, 32, cells(2, 2, -1L)), 32, 32)
    val sigs = Seq(
      (1L, base),
      (2L, base ^ 0x3L),                // dist 2
      (3L, base ^ ((1L << 60) | 1L)),   // dist 2, bits in different bands
      (4L, ~base)                       // far away
    ).toDF("doc_id", "phash")
    val pairs = ImageHash.phashNearDupPairs(sigs, bands = 8, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("end-to-end report: all planted intra pairs, zero cross pairs") {
    val docs = (0L until 63L).toDF("doc_id")
    val rows = ImageHash.phashDedupReport(spark, docs, maxDocs = 63L).collect()
    assert(rows.length === 7)
    for (r <- rows) {
      val (grp, n, intra, cross) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 9L, s"grp $grp")
      assert(intra === n * (n - 1) / 2, s"grp $grp missed intra pairs")
      assert(cross === 0L, s"grp $grp has $cross false cross-pattern pairs")
    }
  }

  test("aHashColor separates recolors the gray hash is blind to") {
    // two images: identical luma checkerboard, Cb/Cr patterns swapped —
    // a recolor. Encode+decode through the real 4:4:4 color codec.
    def encode(swap: Boolean): Array[Long] = {
      def luma(x: Int, y: Int): Int = if ((x / 4 + y / 4) % 2 == 0) 200 else 55
      def cb(x: Int, y: Int): Int = {
        val on = (x / 4) % 4 < 2
        if (on ^ swap) 200 else 55
      }
      val bytes = Jpeg.jpegFileYCbCr(32, 32, luma, cb, (x, y) => 255 - cb(x, y))
      val (w, h, yP, cbP, crP) = Jpeg.decodeJpegColor(bytes).get
      ImageHash.aHashColor(yP, cbP, crP, w, h)
    }
    val a = encode(swap = false)
    val b = encode(swap = true)
    // gray view (the luma word) collides; the chroma words differ widely
    assert(hamming(a(0), b(0)) <= 2, "luma should (nearly) collide")
    assert(hamming(a(1), b(1)) >= 16 && hamming(a(2), b(2)) >= 16,
      "chroma words must separate the recolor")
  }

  test("multi-word banding: pigeonhole recall, summed distance, hot-bucket valve") {
    val base = ImageHash.aHash(render(32, 32, cells(2, 2, -1L)), 32, 32)
    def sig(w0: Long, w1: Long, w2: Long) = Array(w0, w1, w2)
    val sigs = Seq(
      (1L, sig(base, base, base)),
      // dist 3, spread across all three words
      (2L, sig(base ^ 1L, base ^ (1L << 63), base ^ (1L << 30))),
      // dist 2, both flips in the HIGH word (band keys differ only there)
      (3L, sig(base, base, base ^ 5L)),
      (4L, sig(~base, ~base, ~base))) // far away
      .toDF("doc_id", "sig")
    val pairs = ImageHash.colorNearDupPairs(sigs, bands = 24, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.collect { case (1L, 2L, d) => d }.head === 3L)
    assert(pairs.collect { case (1L, 3L, d) => d }.head === 2L)
    assert(pairs.collect { case (2L, 3L, d) => d }.head === 5L)
    // hot bucket: 30 identical signatures explode 435 pairs uncapped;
    // maxBucket drops the bucket entirely
    val hot = (0L until 30L).map(i => (i, sig(base, base, base)))
      .toDF("doc_id", "sig")
    assert(ImageHash.colorNearDupPairs(hot, maxBucket = 10).count() === 0L)
    assert(ImageHash.colorNearDupPairs(hot, maxBucket = 30).count() === 435L)
  }

  test("multi-word band index + probe: near signatures match, far ones don't") {
    import graft.operators.Dedup
    val base = ImageHash.aHash(render(32, 32, cells(2, 2, -1L)), 32, 32)
    val corpus = Seq(
      (10L, Array(base, base, base)),
      (11L, Array(~base, ~base, ~base))).toDF("doc_id", "sig")
    val index = Dedup.sigBandIndexMulti(corpus, words = 3, bands = 24)
    assert(index.count() === 48L, "one row per (doc, band)")
    val batch = Seq(
      (20L, Array(base ^ 3L, base, base)),      // dist 2 from 10
      (21L, Array(base ^ 0xffffL, base, base))) // dist 16 from 10
      .toDF("doc_id", "sig")
    val hits = Dedup.probeNearDupsMulti(index, batch, words = 3, bands = 24,
      maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hits === Set((20L, 10L, 2L)))
  }

  test("multimodal probe lifts to streaming: stateless stream-static band join") {
    import graft.operators.Dedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = ImageHash.aHash(render(32, 32, cells(2, 2, -1L)), 32, 32)
    val corpus = Seq(
      (10L, Array(base, base, base)),
      (11L, Array(~base, ~base, ~base))).toDF("doc_id", "sig")
    val index = Dedup.sigBandIndexMulti(corpus, words = 3, bands = 24)
      .localCheckpoint(true)
    val stream = MemoryStream[(Long, Array[Long])]
    val out = Dedup.streamingProbeNearDupsMulti(index,
      stream.toDF().toDF("doc_id", "sig"), words = 3, bands = 24, maxDist = 10)
    val q = out.writeStream.format("memory")
      .queryName("mm_sprobe_test").outputMode("append").start()
    try {
      stream.addData((20L, Array(base ^ 3L, base, base)), // dist 2 from 10
        (21L, Array(base ^ 0xffffL, base, base)))         // dist 16: filtered
      q.processAllAvailable()
      val rows = spark.table("mm_sprobe_test").collect()
      // per-band emission: doc 20 agrees with 10 on 23 of 24 bands (the
      // two flipped bits share band 0 of word 0)
      assert(rows.length === 23)
      val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
        .distinct
      assert(pairs.toSeq === Seq((20L, 10L, 2L)))
    } finally q.stop()
  }

  test("incremental probe report: each new image matches its whole group") {
    val docs = (0L until 40L).toDF("doc_id")
    val rows = ImageHash.colorProbeReport(spark, docs, maxDocs = 40L,
      corpusCut = 25L).collect()
    assert(rows.length === 5)
    for (r <- rows) {
      val (grp, nNew, nOld, matched, cross) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nNew === 3L && nOld === 5L, s"grp $grp split")
      assert(matched === nNew * nOld, s"grp $grp missed probe matches")
      assert(cross === 0L, s"grp $grp has $cross cross-group matches")
    }
  }

  test("PNG color unlock: decodePngColor → rgbToYCbCr → aHashColor " +
    "separates recolors the gray hash cannot") {
    import graft.operators.Multimodal
    val w = 32; val h = 32
    def pat(x: Int, y: Int): Int = ((x / 4 + y / 4) % 2) * 255
    // same checker LAYOUT, different ink: red-on-black vs blue-on-black —
    // aHash thresholds against the plane's own mean, so the LUMA hashes
    // collide (identical structure) while the chroma words must differ
    val redPng = Multimodal.pngFileRgb(w, h, (x, y) => (pat(x, y), 0, 0))
    val bluePng = Multimodal.pngFileRgb(w, h, (x, y) => (0, 0, pat(x, y)))
    def colorSig(png: Array[Byte]): Array[Long] = {
      val Some((dw, dh, r, g, b)) = Multimodal.decodePngColor(png)
      val yP = new Array[Int](dw * dh)
      val cbP = new Array[Int](dw * dh)
      val crP = new Array[Int](dw * dh)
      for (i <- 0 until dw * dh) {
        val (yy, cb, cr) = Jpeg.rgbToYCbCr(r(i), g(i), b(i))
        yP(i) = yy; cbP(i) = cb; crP(i) = cr
      }
      ImageHash.aHashColor(yP, cbP, crP, dw, dh)
    }
    val red = colorSig(redPng)
    val blue = colorSig(bluePng)
    assert(red(0) === blue(0), "same layout ⇒ same luma word")
    assert(red(1) != blue(1) || red(2) != blue(2),
      "different ink ⇒ chroma words must separate the recolor")
  }

  test("color report: every recolor group pairs exactly, zero cross pairs") {
    val docs = (0L until 40L).toDF("doc_id")
    val rows = ImageHash.colorDedupReport(spark, docs, maxDocs = 40L).collect()
    assert(rows.length === 5)
    for (r <- rows) {
      val (grp, n, intra, cross) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 8L, s"grp $grp")
      assert(intra === n * (n - 1) / 2, s"grp $grp missed recolor pairs")
      assert(cross === 0L, s"grp $grp has $cross cross-color pairs")
    }
  }
}
