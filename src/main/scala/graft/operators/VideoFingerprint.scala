package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video fingerprinting, near-dup pairing, and shot-boundary detection —
  * the VIDEO member of the near-dup family (text MinHash/SimHash in
  * [[Dedup]], image pHash/aHash in [[ImageHash]], audio dominant-bin in
  * [[AudioFingerprint]]), composed entirely from this repo's own pieces:
  * [[Multimodal.decodeGifFramesGray]] decodes a real multi-frame
  * container, [[ImageHash.aHash]] hashes each sampled frame, and
  * candidate generation reuses the capped multi-word posting-list
  * banding ([[Dedup.simhashBandPairsMulti]]).
  *
  * The signature is the standard sampled-keyframe scheme of large-scale
  * video dedup: sample `nSample` frames at uniform positions, hash each
  * to 64 bits, concatenate — temporal structure lives in WORD ORDER, so
  * a re-encoded/brightness-shifted copy matches exactly (aHash is
  * mean-relative) while a re-cut or re-sequenced video moves whole
  * words. Shot-boundary detection is the classic consecutive-frame
  * Hamming threshold over the same per-frame hashes.
  *
  * Scale shape: decode + hash is a narrow mapPartitions — the video
  * bytes never leave the task, only `nSample`×8-byte signatures shuffle;
  * pairing is the banded posting-list form with the `maxBucket`
  * occupancy valve (still-image "videos" — title cards, color bars —
  * are this family's hot-bucket degenerate case). The incremental form
  * persists a [[Dedup.sigBandIndexMulti]] band index so daily ingest
  * probes the corpus with one (band, key) equi-join and never re-decodes
  * stored video.
  */
object VideoFingerprint {

  /** `nSample`×64-bit signature: frame ⌊f·n/nSample⌋ of the decoded
    * sequence, aHashed (mean-relative, so per-copy brightness/contrast
    * jitter cancels). Word order IS temporal order. */
  def fingerprint(frames: IndexedSeq[(Int, Int, Array[Int])],
                  nSample: Int = 3): Array[Long] = {
    require(frames.nonEmpty, "at least one decoded frame")
    Array.tabulate(nSample) { f =>
      val (w, h, g) = frames((f.toLong * frames.length / nSample).toInt)
      ImageHash.aHash(g, w, h)
    }
  }

  /** Shot boundaries: count of consecutive-frame aHash Hamming distances
    * strictly above `threshold` (16 of 64 bits by default — a hard cut
    * moves most blocks relative to the frame mean; codec jitter moves a
    * few). */
  def sceneCuts(frames: IndexedSeq[(Int, Int, Array[Int])],
                threshold: Int = 16): Int = {
    val hashes = frames.map { case (w, h, g) => ImageHash.aHash(g, w, h) }
    var cuts = 0
    var f = 1
    while (f < hashes.length) {
      if (java.lang.Long.bitCount(hashes(f - 1) ^ hashes(f)) > threshold)
        cuts += 1
      f += 1
    }
    cuts
  }

  /** Near-dup pairs over (doc_id, sig array<bigint>) rows: the multi-word
    * banding of [[Dedup.simhashBandPairsMulti]] — bands never straddle a
    * word, so `bands`/`words` bands per word ⇒ pigeonhole recall for
    * Hamming < bands over the concatenated bits, exact summed
    * `bit_count(xor)` verification at `maxDist`, `maxBucket` occupancy
    * valve. */
  def videoNearDupPairs(sigs: DataFrame, words: Int = 3, bands: Int = 24,
                        maxDist: Int = 6,
                        maxBucket: Int = 1024): DataFrame =
    Dedup.simhashBandPairsMulti(sigs, words, bands, maxDist, maxBucket)

  /** The planted-video fixture's (doc_id, sig) signatures, shared by the
    * dedup and probe reports: 4 "clips" by doc_id % 4, each 6 frames of
    * 32×32, frame f of group g showing the balanced 8×8-block pattern
    * `((block + g + f) & 3) < 2` (so frames differ WITHIN a clip and any
    * two groups disagree in ≥ 32 of each sampled word's 64 bits), at a
    * per-doc brightness/contrast (dark/bright levels vary by id) with
    * per-pixel ±1 noise — all of which mean-relative aHash must cancel —
    * through a REAL animated-GIF encode and full container decode. */
  private[operators] def videoFixtureSigs(spark: SparkSession,
                                          ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val g = (id % 4L).toInt
        val dark = 40 + (id % 7L).toInt * 5
        val bright = 160 + (id % 5L).toInt * 7
        val frames = (0 until 6).map { f => (x: Int, y: Int) =>
          val block = (y / 4) * 8 + x / 4
          val base = if (((block + g + f) & 3) < 2) bright else dark
          val noise = ((id * 31L + f * 131L + y * 32L + x) % 3L).toInt - 1
          math.max(0, math.min(255, base + noise))
        }
        val bytes = Multimodal.gifFileAnimGray(32, 32, frames)
        val decoded = Multimodal.decodeGifFramesGray(bytes).get
        (id, fingerprint(decoded, nSample = 3))
      }
    }.toDF("doc_id", "sig")
  }

  /** End-to-end video near-dup report on SYNTHETIC-but-real-codec data
    * (fixture above): same-clip duos must pair at distance 0 (brightness,
    * noise, and the codec must not flip an aHash bit) and distinct clips
    * disagree in ≥ 96 of 192 bits, so the oracle knows the planting:
    * (g, n, n·(n−1)/2, 0). Capped at `maxDocs` ids; whole-group band
    * buckets stay under the `maxBucket` = 150 valve. */
  def videoDedupReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val pairs = videoNearDupPairs(videoFixtureSigs(spark, ids), maxBucket = 150)
    val tagged = pairs.select((col("id1") % 4).as("g1"), (col("id2") % 4).as("g2"))
    val intra = tagged.where(col("g1") === col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_intra"))
    val cross = tagged.where(col("g1") =!= col("g2"))
      .groupBy(col("g1").as("grp")).agg(count(lit(1)).as("n_cross"))
    ids.groupBy((col("doc_id") % 4).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
      .join(intra, Seq("grp"), "left")
      .join(cross, Seq("grp"), "left")
      .na.fill(0L, Seq("n_intra", "n_cross"))
      .select(col("grp").cast("long"), col("n_docs"),
        col("n_intra"), col("n_cross"))
      .orderBy("grp")
  }

  /** Incremental video near-dup: ids below `corpusCut` are signed ONCE
    * into a [[Dedup.sigBandIndexMulti]] band index and the remaining ids
    * probe it ([[Dedup.probeNearDupsMulti]]) — stored videos are never
    * re-decoded. The planting makes the outcome exact: per group
    * n_matched = n_new · n_old at distance 0, n_cross = 0. */
  def videoProbeReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L,
                       corpusCut: Long = 150L): DataFrame = {
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val sigs = videoFixtureSigs(spark, ids)
    val index = Dedup.sigBandIndexMulti(
      sigs.where(col("doc_id") < corpusCut), words = 3, bands = 24)
    val matches = Dedup.probeNearDupsMulti(index,
      sigs.where(col("doc_id") >= corpusCut), words = 3, bands = 24,
      maxDist = 6)
    val matched = matches
      .groupBy((col("new_id") % 4).as("grp"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("new_id") % 4 =!= col("old_id") % 4, 1L)
          .otherwise(0L)).as("n_cross"))
    ids.groupBy((col("doc_id") % 4).as("grp"))
      .agg(count(when(col("doc_id") >= corpusCut, 1)).as("n_new"),
        count(when(col("doc_id") < corpusCut, 1)).as("n_old"))
      .join(matched, Seq("grp"), "left")
      .na.fill(0L, Seq("n_matched", "n_cross"))
      .select(col("grp").cast("long"), col("n_new"), col("n_old"),
        col("n_matched"), col("n_cross"))
      .orderBy("grp")
  }

  /** Shot-boundary report on planted multi-segment clips: doc_id % 3 + 1
    * segments of a 12-frame clip (segment j of group g = doc_id % 4 shows
    * pattern `(block + g + j) & 3 < 2`, so consecutive segments are 32
    * bits apart — a cut — and within-segment distance is 0), per-doc
    * brightness + noise as in the dedup fixture, through the real
    * animated-GIF roundtrip. n_cuts = doc_id % 3 exactly. */
  def videoSceneReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L): DataFrame = {
    import spark.implicits._
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val g = (id % 4L).toInt
        val nSeg = (id % 3L).toInt + 1
        val segLen = 12 / nSeg
        val dark = 40 + (id % 7L).toInt * 5
        val bright = 160 + (id % 5L).toInt * 7
        val frames = (0 until 12).map { f => (x: Int, y: Int) =>
          val block = (y / 4) * 8 + x / 4
          val seg = math.min(f / segLen, nSeg - 1)
          val base = if (((block + g + seg) & 3) < 2) bright else dark
          val noise = ((id * 31L + f * 131L + y * 32L + x) % 3L).toInt - 1
          math.max(0, math.min(255, base + noise))
        }
        val bytes = Multimodal.gifFileAnimGray(32, 32, frames)
        val decoded = Multimodal.decodeGifFramesGray(bytes).get
        (id, decoded.length.toLong, sceneCuts(decoded).toLong)
      }
    }.toDF("doc_id", "n_frames", "n_cuts").orderBy("doc_id")
  }
}
