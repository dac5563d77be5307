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
}
