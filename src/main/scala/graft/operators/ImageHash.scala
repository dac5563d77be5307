package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (pHash) + banded Hamming near-dup pairing —
  * IMAGE deduplication, the multimodal counterpart of [[Dedup]]'s
  * MinHash/SimHash text family, composed from this repo's own pieces:
  * [[Jpeg.decodeJpegGray]] (or any of the Multimodal decoders) feeds
  * [[pHash]], and candidate generation reuses the SimHash banding recipe
  * ([[Dedup.simhashNearDupPairs]]) on the 63-bit signature.
  *
  * pHash (the classic DCT hash): nearest-resize to 32×32 → 2-D DCT-II →
  * keep the 63 lowest-frequency coefficients (top-left 8×8 minus DC) →
  * threshold each against their median. Low frequencies survive
  * re-encoding, mild noise, and resampling; the hash of a JPEG'd copy
  * lands within small Hamming distance of the original's.
  *
  * Determinism: the DCT basis comes from StrictMath (bit-reproducible
  * across JVMs, unlike Math.cos's 1-ulp license) and coefficients are
  * rounded to integer milli-units BEFORE the median/threshold, so a
  * sub-ulp platform difference can never flip a bit.
  *
  * Scale shape: hashing is a narrow mapPartitions (64k multiplies per
  * image); pairing is band-bucketed — a doc pair is compared only when
  * some band of bits/bands key bits collides, the pigeonhole guarantee
  * that any pair within Hamming distance < bands IS generated, with the
  * `maxBucket` occupancy valve dropping degenerate hot buckets (flat
  * images hashing alike). No all-pairs join anywhere.
  */
object ImageHash {

  private val Cos32: Array[Double] = {
    val t = new Array[Double](32 * 32)
    for (u <- 0 until 32; x <- 0 until 32)
      t(u * 32 + x) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0)
    t
  }

  /** 63-bit perceptual hash of a gray image (any dimensions ≥ 1×1). */
  def pHash(gray: Array[Int], w: Int, h: Int): Long = {
    val g = Multimodal.resizeNearest(gray, w, h, 32, 32)
    // separable 2-D DCT-II, rows then columns (scale factors don't matter
    // for a median threshold, so plain cosine sums)
    val rows = new Array[Double](32 * 32)
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 32) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * Cos32(u * 32 + x); x += 1 }
        rows(y * 32 + u) = s
        u += 1
      }
      y += 1
    }
    // only the top-left 8×8 output block is needed
    val coefMilli = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rows(yy * 32 + u) * Cos32(v * 32 + yy); yy += 1 }
        coefMilli(v * 8 + u) = StrictMath.round(s * 1000.0 / 1024.0)
        u += 1
      }
      v += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(coefMilli, 1, ac, 0, 63)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted(31)
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (ac(i) > median) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Block-mean hash (aHash — block mean value hashing): resize to
    * 32×32 → 64 means of 4×4 blocks → threshold each at the GLOBAL mean.
    * Spatially local, so it is robust BY CONSTRUCTION where pHash is
    * not: ±1 pixel noise moves a block mean by at most 1 and JPEG
    * ringing by a few units, while distinct layouts flip whole blocks.
    * The mean threshold (not median) matters for bimodal content: a
    * median always lands INSIDE one of the two clusters, so that
    * cluster's cells jitter around it; the mean sits between clusters.
    * pHash's median threshold sits in the near-zero coefficient cluster
    * on flat-spectrum images (synthetic patterns, flat scans) and
    * jitters there — measured 19+ bit flips from ±1 noise on a pure
    * grating — so use THIS variant when the corpus isn't natural
    * photographs; the oracle query does. All-integer: bit i is
    * 64·blockSum(i) > Σ blockSums, no division anywhere. */
  def aHash(gray: Array[Int], w: Int, h: Int): Long = {
    val g = Multimodal.resizeNearest(gray, w, h, 32, 32)
    val sums = new Array[Long](64)
    var total = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var s = 0L
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) { s += g((by * 4 + y) * 32 + bx * 4 + x); x += 1 }
          y += 1
        }
        sums(by * 8 + bx) = s
        total += s
        bx += 1
      }
      by += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (64L * sums(i) > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Near-dup pairs over (doc_id, phash) rows: SimHash-style banding over
    * the 63-bit signature (`bands` bands ⇒ guaranteed recall for Hamming
    * distance < bands), exact `bit_count(xor)` verification ≤ `maxDist` —
    * delegated to [[Dedup.simhashBandPairs]], which pairs from capped
    * posting lists: `maxBucket` is the occupancy valve (flat or constant
    * images all hash alike, so an uncapped hot bucket would be
    * corpus-quadratic at scale; over-full buckets are dropped, the
    * MinHash-path convention). */
  def phashNearDupPairs(sigs: DataFrame, bands: Int = 8,
                        maxDist: Int = 7,
                        maxBucket: Int = 1024): DataFrame =
    Dedup.simhashBandPairs(sigs.withColumnRenamed("phash", "simhash"),
      bits = 64, bands = bands, maxDist = maxDist, maxBucket = maxBucket)

  /** Per-channel perceptual hash of a COLOR image: [[aHash]] over each
    * full-resolution Y/Cb/Cr plane ([[Jpeg.decodeJpegColor]]'s output) —
    * a 3×64-bit signature, low word = luma. A luma-only hash is blind to
    * recolors (same layout, different ink — logos, charts, re-tinted
    * scans hash identically); the chroma words separate them while each
    * channel keeps aHash's robustness to noise and JPEG loss. */
  def aHashColor(yP: Array[Int], cbP: Array[Int], crP: Array[Int],
                 w: Int, h: Int): Array[Long] =
    Array(aHash(yP, w, h), aHash(cbP, w, h), aHash(crP, w, h))

  /** Near-dup pairs over (doc_id, sig: array<long>[3]) color signatures:
    * banding over the CONCATENATED 192 bits via
    * [[Dedup.simhashBandPairsMulti]] (24 bands of 8 bits ⇒ guaranteed
    * recall for total Hamming distance < 24), verified against the sum of
    * per-channel distances. The `maxBucket` valve matters MORE here than
    * in gray: a color-uniform corpus collides on both chroma words'
    * bands, not just flat luma. */
  def colorNearDupPairs(sigs: DataFrame, bands: Int = 24,
                        maxDist: Int = 10,
                        maxBucket: Int = 1024): DataFrame =
    Dedup.simhashBandPairsMulti(sigs, words = 3, bands = bands,
      maxDist = maxDist, maxBucket = maxBucket)

  /** End-to-end image near-dup report on SYNTHETIC-but-lossy data: 7
    * block-aligned layouts (one per doc_id % 7 — distinct cell patterns),
    * each instance perturbed by per-doc ±1 pixel noise, run through the
    * REAL JPEG encoder AND decoder (lossy!), block-mean hashed, then
    * band-paired. A correct hash must pair every same-layout duo (recall
    * through JPEG loss + noise) and no cross-layout one (precision) —
    * the oracle knows the planting: (g, n, n·(n−1)/2, 0). Capped at
    * `maxDocs` ids so the planted intra pair count stays
    * quadratic-in-tens, not corpus-quadratic. */
  def phashDedupReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L): DataFrame = {
    import spark.implicits._
    val layouts = Array((1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 2), (1, 2))
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val sigs = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val (ax, ay) = layouts((id % 7L).toInt)
        // 32×32, constant on the hash's own 4×4 cells (block-aligned, so
        // every block mean is saturated far from the median)
        def gray(x: Int, y: Int): Int = {
          val cell = ((x / 4) * ax + (y / 4) * ay) % 4 < 2
          val base = if (cell) 200 else 55
          val noise = ((id * 7919L + x * 31L + y * 17L) % 3L).toInt - 1
          math.max(0, math.min(255, base + noise))
        }
        val bytes = Jpeg.jpegFileGray(32, 32, gray)
        val (w, h, g) = Jpeg.decodeJpegGray(bytes).get
        (id, aHash(g, w, h))
      }
    }.toDF("doc_id", "phash")
    // maxBucket bounds per-bucket fan-out: ~maxDocs/7 same-layout images
    // share a hash (≈29 at the default), so 64 keeps the planted groups
    // whole while proving the valve is on the path
    val pairs = phashNearDupPairs(sigs, maxBucket = 64)
    val tagged = pairs.select((col("id1") % 7).as("g1"), (col("id2") % 7).as("g2"))
    val intra = tagged.where(col("g1") === col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_intra"))
    val cross = tagged.where(col("g1") =!= col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_cross"))
    ids.groupBy((col("doc_id") % 7).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .join(intra, Seq("grp"), "left")
      .join(cross, Seq("grp"), "left")
      .na.fill(0L, Seq("n_intra", "n_cross"))
      .select(col("grp").cast("long"), col("n_docs"),
        col("n_intra"), col("n_cross"))
      .orderBy("grp")
  }

  /** COLOR near-dup report on a RECOLOR fixture — the case a gray hash
    * cannot see: every image shares ONE luma layout (a saturated
    * checkerboard plus per-doc ±1 noise) while the chroma planes carry
    * one of 5 group patterns (doc_id % 5, Cr the inverse of Cb). Each
    * image goes through the REAL 4:4:4 color encoder and full color
    * decoder (lossy), is channel-hashed ([[aHashColor]]), and pairs over
    * the concatenated 192-bit signature ([[colorNearDupPairs]]).
    *
    * The oracle knows the planting: every same-group duo pairs
    * (chroma distance 0 through JPEG loss — saturated block means),
    * zero cross-group pairs survive (luma distance 0 but the chroma
    * words differ in dozens of bits). The fixture also exercises the
    * occupancy valve ON the recall path: the luma word's band buckets
    * hold the ENTIRE corpus (everything agrees on luma) and are dropped
    * by `maxBucket` = 150, so the chroma bands alone must carry the
    * recall — valve and pigeonhole guarantee proven together. */
  def colorDedupReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val sigs = colorFixtureSigs(spark, ids)
    val pairs = colorNearDupPairs(sigs, maxBucket = 150)
    val tagged = pairs.select((col("id1") % 5).as("g1"), (col("id2") % 5).as("g2"))
    val intra = tagged.where(col("g1") === col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_intra"))
    val cross = tagged.where(col("g1") =!= col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_cross"))
    ids.groupBy((col("doc_id") % 5).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .join(intra, Seq("grp"), "left")
      .join(cross, Seq("grp"), "left")
      .na.fill(0L, Seq("n_intra", "n_cross"))
      .select(col("grp").cast("long"), col("n_docs"),
        col("n_intra"), col("n_cross"))
      .orderBy("grp")
  }

  /** The recolor fixture's (doc_id, sig) signatures, shared by
    * [[colorDedupReport]] and [[colorProbeReport]]: one luma checkerboard
    * for everyone (plus per-doc ±1 noise), chroma pattern by doc_id % 5
    * (Cr the inverse of Cb), through the real 4:4:4 encoder and full
    * color decoder, then [[aHashColor]]. */
  private[operators] def colorFixtureSigs(spark: SparkSession,
                                          ids: DataFrame): DataFrame = {
    import spark.implicits._
    val layouts = Array((1, 0), (0, 1), (1, 1), (2, 0), (0, 2))
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (ax, ay) = layouts((id % 5L).toInt)
        def lumaF(x: Int, y: Int): Int = {
          val cell = (x / 4 + y / 4) % 2 == 0
          val base = if (cell) 200 else 55
          val noise = ((id * 7919L + x * 31L + y * 17L) % 3L).toInt - 1
          math.max(0, math.min(255, base + noise))
        }
        def cbF(x: Int, y: Int): Int =
          if (((x / 4) * ax + (y / 4) * ay) % 4 < 2) 200 else 55
        def crF(x: Int, y: Int): Int = 255 - cbF(x, y)
        val bytes = Jpeg.jpegFileYCbCr(32, 32, lumaF, cbF, crF)
        val (w, h, yP, cbP, crP) = Jpeg.decodeJpegColor(bytes).get
        (id, aHashColor(yP, cbP, crP, w, h))
      }
    }.toDF("doc_id", "sig")
  }

  /** Incremental image near-dup: ids below `corpusCut` are signed ONCE
    * into a [[Dedup.sigBandIndexMulti]] band index (the persisted
    * artifact — at scale the corpus images are never re-decoded), and the
    * remaining ids arrive as the new batch probing it
    * ([[Dedup.probeNearDupsMulti]]: one (band, key) equi-join, Hamming
    * verify on the stored signatures). The planting makes the outcome
    * exact: every new image matches ALL corpus images of its recolor
    * group at distance 0 and nothing else, so per group
    * n_matched = n_new · n_old and n_cross = 0. */
  def colorProbeReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L,
                       corpusCut: Long = 150L): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val sigs = colorFixtureSigs(spark, ids)
    val index = Dedup.sigBandIndexMulti(
      sigs.where(col("doc_id") < corpusCut), words = 3, bands = 24)
    val matches = Dedup.probeNearDupsMulti(index,
      sigs.where(col("doc_id") >= corpusCut), words = 3, bands = 24,
      maxDist = 10)
    val tagged = matches.select(col("new_id"),
      (col("new_id") % 5).as("grp"), (col("old_id") % 5).as("og"))
    val hits = tagged.where(col("grp") === col("og"))
      .groupBy("grp").agg(count(lit(1)).as("n_matched"))
    val cross = tagged.where(col("grp") =!= col("og"))
      .groupBy("grp").agg(count(lit(1)).as("n_cross"))
    val newN = ids.where(col("doc_id") >= corpusCut)
      .groupBy((col("doc_id") % 5).as("grp")).agg(count(lit(1)).as("n_new"))
    val oldN = ids.where(col("doc_id") < corpusCut)
      .groupBy((col("doc_id") % 5).as("grp")).agg(count(lit(1)).as("n_old"))
    newN.join(oldN, Seq("grp"), "left")
      .join(hits, Seq("grp"), "left")
      .join(cross, Seq("grp"), "left")
      .na.fill(0L, Seq("n_old", "n_matched", "n_cross"))
      .select(col("grp").cast("long"), col("n_new"), col("n_old"),
        col("n_matched"), col("n_cross"))
      .orderBy("grp")
  }
}
