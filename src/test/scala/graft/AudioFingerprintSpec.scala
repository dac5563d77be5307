package graft

import graft.operators.AudioFingerprint

class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private val frameLen = 32
  private val nFrames = 16

  /** samples playing melody(f) = bin index per frame, at `amp`. */
  private def synth(melody: Int => Int, amp: Long,
                    noiseSeed: Long = -1L): Array[Int] = {
    val bins = AudioFingerprint.DefaultBins.toArray
    val cos = bins.map(k => Array.tabulate(frameLen)(t =>
      math.round(16384.0 * StrictMath.cos(2.0 * StrictMath.PI * k * t / frameLen))))
    Array.tabulate(frameLen * nFrames) { i =>
      val f = i / frameLen; val t = i % frameLen
      val noise =
        if (noiseSeed < 0) 0
        else ((noiseSeed * 31L + i * 7L) % 5L).toInt - 2
      ((amp * cos(melody(f))(t)) / 16384L).toInt + noise
    }
  }

  test("fingerprint: one-hot dominant bin per frame, exactly as planted") {
    val sig = AudioFingerprint.fingerprint(synth(f => f % 4, 800L))
    val expected = (0 until nFrames).map(f => 1L << (4 * f + f % 4)).sum
    assert(sig === expected)
    assert(java.lang.Long.bitCount(sig) === nFrames, "one bit per frame")
  }

  test("fingerprint is volume- and noise-invariant, and hears re-pitching") {
    val quiet = AudioFingerprint.fingerprint(synth(f => (f + 1) % 4, 500L, 7L))
    val loud = AudioFingerprint.fingerprint(synth(f => (f + 1) % 4, 1500L, 13L))
    assert(quiet === loud, "dominance must survive volume + noise")
    // drift ONE frame's tone: exactly one dominant bin moves → Hamming 2
    val drifted = AudioFingerprint.fingerprint(
      synth(f => if (f == 5) 3 else (f + 1) % 4, 500L, 7L))
    assert(java.lang.Long.bitCount(quiet ^ drifted) === 2)
  }

  test("pairing: drifted frames within maxDist pair, re-pitched audio does not") {
    val base = AudioFingerprint.fingerprint(synth(f => f % 4, 800L))
    val oneOff = AudioFingerprint.fingerprint(
      synth(f => if (f == 3) (f + 2) % 4 else f % 4, 800L))
    val twoOff = AudioFingerprint.fingerprint(
      synth(f => if (f == 3 || f == 9) (f + 2) % 4 else f % 4, 800L))
    val repitched = AudioFingerprint.fingerprint(synth(f => (f + 1) % 4, 800L))
    val sigs = Seq((1L, base), (2L, oneOff), (3L, twoOff), (4L, repitched))
      .toDF("doc_id", "afp")
    val pairs = AudioFingerprint.audioNearDupPairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // base↔oneOff dist 2, base↔twoOff dist 4, oneOff↔twoOff dist 2;
    // repitched is 32 away from base (every frame moved)
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("hot-bucket valve: a silent (identical-signature) corpus is capped") {
    val sig = AudioFingerprint.fingerprint(new Array[Int](frameLen * nFrames))
    val sigs = (0L until 30L).map(i => (i, sig)).toDF("doc_id", "afp")
    assert(AudioFingerprint.audioNearDupPairs(sigs, maxBucket = 10).count() === 0L)
    assert(AudioFingerprint.audioNearDupPairs(sigs, maxBucket = 30).count() === 435L)
  }

  test("report: every planted melody duo pairs, zero cross-melody pairs") {
    val docs = (0L until 40L).toDF("doc_id")
    val rows = AudioFingerprint.audioDedupReport(spark, docs, maxDocs = 40L)
      .collect()
    assert(rows.length === 4)
    for (r <- rows) {
      val (grp, n, intra, cross) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n === 10L, s"grp $grp")
      assert(intra === n * (n - 1) / 2, s"grp $grp missed melody pairs")
      assert(cross === 0L, s"grp $grp has $cross cross-melody pairs")
    }
  }
}
