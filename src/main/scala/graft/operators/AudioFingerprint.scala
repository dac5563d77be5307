package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio fingerprinting + banded near-dup pairing — the AUDIO member of
  * the near-dup family (text MinHash/SimHash in [[Dedup]], image
  * pHash/aHash in [[ImageHash]]), composed from this repo's own pieces:
  * [[Multimodal.wavPcmLayout]] decodes real WAV/PCM bytes,
  * [[Multimodal.goertzelPower]] measures per-frame spectral bins in pure
  * Long arithmetic, and candidate generation reuses the capped
  * posting-list banding ([[Dedup.simhashBandPairs]]).
  *
  * The signature is the classic spectral-peak idea (the landmark scheme
  * of large-scale audio search engines, reduced to its deterministic
  * core): split the PCM into `nFrames` fixed frames, measure `bins.length`
  * Goertzel bins per frame, and keep only each frame's DOMINANT bin —
  * ONE-HOT encoded, 4 bits per frame × 16 frames = 64 bits. Dominance
  * survives what dedup must ignore (volume normalization, small noise,
  * requantization — all scale every bin together or perturb the loser
  * bins) while re-pitched or re-sequenced audio moves the peaks. One-hot
  * packing makes Hamming distance meaningful: exactly 2·(#frames whose
  * dominant bin differs).
  *
  * Scale shape: decoding + fingerprinting is a narrow mapPartitions (the
  * audio never leaves the task, only the 8-byte signature shuffles);
  * pairing is the banded posting-list form with the `maxBucket` occupancy
  * valve (silence hashes alike — the hot-bucket degenerate case is a
  * muted corpus, not a flat image, but the valve is the same).
  */
object AudioFingerprint {

  /** Default DFT bins (of a 32-sample frame) the fingerprint listens to —
    * spread, mutually non-adjacent so quantization leakage from one never
    * out-shouts another's true peak. */
  val DefaultBins: Seq[Int] = Seq(2, 3, 5, 7)

  /** 64-bit one-hot fingerprint: frame f's dominant bin d sets bit
    * 4·f + d (ties break to the lowest bin — deterministic). Frames
    * beyond the sample count contribute silence (all-zero powers →
    * bin 0), so short clips still hash. */
  def fingerprint(samples: Array[Int], frameLen: Int = 32,
                  nFrames: Int = 16,
                  bins: Seq[Int] = DefaultBins): Long = {
    require(bins.length <= 4 && nFrames * 4 <= 64,
      "one-hot packing needs <= 4 bins and <= 16 frames")
    val coefs = bins.map(k => Multimodal.goertzelCoefQ14(k, frameLen)).toArray
    var sig = 0L
    var f = 0
    while (f < nFrames) {
      val from = math.min(f * frameLen, samples.length)
      val to = math.min(from + frameLen, samples.length)
      val frame = java.util.Arrays.copyOfRange(samples, from, to)
      var best = 0
      var bestP = Long.MinValue
      var b = 0
      while (b < coefs.length) {
        val p = Multimodal.goertzelPower(frame, coefs(b))
        if (p > bestP) { bestP = p; best = b }
        b += 1
      }
      sig |= 1L << (4 * f + best)
      f += 1
    }
    sig
  }

  /** Near-dup pairs over (doc_id, afp) fingerprint rows: the 64-bit
    * banding of [[Dedup.simhashBandPairs]] (8 bands ⇒ guaranteed recall
    * for Hamming < 8, i.e. up to 3 drifted frames) with exact verification
    * at `maxDist` (default 4 = two frames may disagree) and the
    * `maxBucket` occupancy valve. */
  def audioNearDupPairs(sigs: DataFrame, bands: Int = 8, maxDist: Int = 4,
                        maxBucket: Int = 1024): DataFrame =
    Dedup.simhashBandPairs(sigs.withColumnRenamed("afp", "simhash"),
      bits = 64, bands = bands, maxDist = maxDist, maxBucket = maxBucket)

  /** End-to-end audio near-dup report on SYNTHETIC-but-real-codec data:
    * 4 planted "melodies" (per frame f, group g plays bin
    * bins((g + f) % 4)), each instance at its own per-doc volume and with
    * per-sample ±2 noise, written as a REAL 16-bit WAV and decoded back
    * through the container walk before fingerprinting. Same-melody duos
    * must pair at distance 0 (volume + noise + codec must not move a
    * dominant bin) and distinct melodies disagree in EVERY frame
    * (distance 32 >> maxDist), so the oracle knows the planting:
    * (g, n, n·(n−1)/2, 0). Capped at `maxDocs` ids, same-signature
    * buckets stay under the `maxBucket` = 64 valve. */
  def audioDedupReport(spark: SparkSession, docs: DataFrame,
                       maxDocs: Long = 200L): DataFrame = {
    import spark.implicits._
    val frameLen = 32
    val nFrames = 16
    val bins = DefaultBins.toArray
    // Q14 cosine tables per bin, one frame period — driver-computed via
    // StrictMath (bit-reproducible), captured by the closure
    val cosQ14: Array[Array[Long]] = bins.map(k => Array.tabulate(frameLen)(t =>
      math.round(16384.0 * StrictMath.cos(2.0 * StrictMath.PI * k * t / frameLen))))
    val ids = docs.select(col("doc_id").cast("long"))
      .where(col("doc_id") < maxDocs)
    val sigs = ids.as[Long].mapPartitions { it =>
      it.map { id =>
        val grp = (id % 4L).toInt
        val amp = 500L + (id % 7L) * 100L // per-doc volume
        val samples = new Array[Int](frameLen * nFrames)
        var f = 0
        while (f < nFrames) {
          val tone = cosQ14((grp + f) % 4)
          var t = 0
          while (t < frameLen) {
            val noise = ((id * 31L + (f * frameLen + t) * 7L) % 5L).toInt - 2
            samples(f * frameLen + t) =
              ((amp * tone(t)) / 16384L).toInt + noise
            t += 1
          }
          f += 1
        }
        val bytes = Multimodal.wavFile16(8000, samples)
        val decoded = Multimodal.wavPcmLayout(bytes) match {
          case Some((16, _, off, len)) =>
            Array.tabulate(len / 2)(s =>
              (bytes(off + 2 * s) & 0xff) | (bytes(off + 2 * s + 1).toInt << 8))
          case _ => Array.empty[Int]
        }
        (id, fingerprint(decoded, frameLen, nFrames))
      }
    }.toDF("doc_id", "afp")
    val pairs = audioNearDupPairs(sigs, maxBucket = 64)
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
}
