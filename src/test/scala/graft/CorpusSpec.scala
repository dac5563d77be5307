package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, TextOps}

/** Composed corpus-cleaning pipeline: each gate exercised by a dedicated
  * fixture doc, survivor stats checked exactly. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // an English sentence that passes the quality gate (≥5 words, stopwordy,
  // alphabetic)
  private val good =
    "the quick brown fox jumps over the lazy dog and it is a good day in the sun"

  private lazy val docs = Seq(
    (1L, "a", good),                                   // survives
    (2L, "a", good),                                   // exact dup of 1 → dropped
    (3L, "a", good + " extra"),                        // near dup of 1 → dropped
    (4L, "b", "der hund und die katze ist nicht ein vogel heute"), // German → dropped
    (5L, "b", "zzz 123 !!!"),                          // junk quality → dropped
    (6L, "b", "the cat sat on a mat and it is happy to be in the house today"))
    .toDF("doc_id", "source", "text")

  test("per-doc language id and quality score") {
    val m = docs.select(col("doc_id"), TextOps.langIdOf(col("text")).as("l"),
        TextOps.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(m(1L)._1 === "en" && m(1L)._2 >= 0.5)
    assert(m(4L)._1 === "de")
    assert(m(5L)._2 === 0.0) // < 5 words
  }

  test("cleanStats: gates, exact dedup, near-dup removal, survivor stats") {
    val out = Corpus.cleanStats(docs, lang = "en", minScore = 0.5,
      shingleN = 3, numHashes = 16, numBands = 4, threshold = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))).toMap
    // source a: docs 1,2,3 collapse to just 1 (exact dup 2 dropped first,
    // near dup 3 clustered with 1 and 1 is the keeper)
    assert(out("a")._1 === 1L)
    // source b: German 4 and junk 5 gated out, 6 survives
    assert(out("b")._1 === 1L)
    // token volume = the surviving docs' estimates
    val tok = (t: String) => spark.range(1)
      .select(graft.functions.tokenCountEstimate(lit(t))).head().getLong(0)
    assert(out("a")._2 === tok(good))
    assert(out("b")._2 === tok("the cat sat on a mat and it is happy to be in the house today"))
  }

  test("readability: hand-derived integer Flesch on a two-sentence doc") {
    // "Hello world. How are you?" → nw=5, ns=2, vowel groups:
    // e,o | o | o | a,e | ou = 7 → 206835 − 5075//2 − 592200//5 = 85858
    val d = Seq((1L, "s", "Hello world. How are you?"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.readabilityBySource(d).collect().head
    assert(r.getAs[Long]("n_docs") === 1L)
    assert(r.getAs[Long]("sum_syllables") === 7L)
    assert(r.getAs[Long]("sum_flesch_milli") === 85858L)
  }

  test("readability: no sentence marks count as one sentence; y is a vowel") {
    // "shy sky myth" → nw=3, ns=1 (floor), sy=3 (y groups)
    // fl = 206835 − 3045 − 84600 = 119190
    val d = Seq((1L, "s", "shy sky myth")).toDF("doc_id", "source", "text")
    val r = TextOps.readabilityBySource(d).collect().head
    assert(r.getAs[Long]("sum_syllables") === 3L)
    assert(r.getAs[Long]("sum_flesch_milli") === 119190L)
  }

  test("heapsGrowth: hand-derived checkpoint curve, repeats buy no vocab") {
    // doc_ids 0..8 → thresholds 1/8=1, 2/8=2, 4/8=4, full. Docs 0-1 have
    // "a b", docs 2-8 add one new term each ("a c", "a d", …): vocab at
    // the checkpoints = 2, 3, 5, 9; tokens = 2/doc everywhere.
    val docs = (0 until 9).map { i =>
      val t = if (i < 2) "a b" else "a " + ('b' + i - 1).toChar
      (i.toLong, "s", t)
    }.toDF("doc_id", "source", "text")
    val rows = TextOps.heapsGrowth(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows(1L) === ((2L, 4L, 2L)))   // docs 0-1: vocab {a,b}
    assert(rows(2L) === ((3L, 6L, 3L)))   // +doc 2: +c
    assert(rows(4L) === ((5L, 10L, 5L)))  // +docs 3-4: +d,+e
    assert(rows(8L) === ((9L, 18L, 9L)))  // full corpus: 9 types
  }

  test("zipfTable: ranks, tiebreak, and the exact-Zipf ratio of 1e6") {
    // frequencies engineered Zipfian: a×6, b×3, c×2, d×1 → ratios
    // 6e6/(1·6), 6e6/(2·3), 6e6/(3·2) = 1e6; d: 6e6/(4·1) = 1.5e6
    val docs = Seq((1L, "s", "a a a a a a b b b c c d"))
      .toDF("doc_id", "source", "text")
    val rows = TextOps.zipfTable(docs, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows(1L) === (("a", 6L, 1000000L)))
    assert(rows(2L) === (("b", 3L, 1000000L)))
    assert(rows(3L) === (("c", 2L, 1000000L)))
    assert(rows(4L) === (("d", 1L, 1500000L)))
    // equal frequencies: rank order falls back to the term tiebreak
    val tie = TextOps.zipfTable(
      Seq((1L, "s", "z y x")).toDF("doc_id", "source", "text"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tie === Map(1L -> "x", 2L -> "y", 3L -> "z"))
  }

  test("burstiness: clumpy terms disperse above uniform ones") {
    // 4 docs: 'glue' once per doc (S=4, ss=4: D = (16-16)e6/(4*3) = 0);
    // 'burst' 4 times in one doc (S=4, ss=16: D = (64-16)e6/12 = 4e6)
    val docs = (0 until 4).map { i =>
      val t = if (i == 0) "glue burst burst burst burst" else "glue"
      (i.toLong, "s", t)
    }.toDF("doc_id", "source", "text")
    val m = TextOps.burstiness(docs, k = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m("glue") === ((4L, 4L, 0L)))
    assert(m("burst") === ((1L, 4L, 4000000L)))
  }

  test("rakeKeyphrases: hand-derived deg/freq scores and run splitting") {
    val stops = Seq("of", "and", "the")
    // "deep learning of deep networks": runs split at 'of' →
    // freq(deep)=2, deg(deep)=2+2=4 → 2e6; learning/networks → 2e6 each;
    // both phrases score 4e6, tie broken lexicographically
    val d1 = Seq((1L, "s", "deep learning of deep networks"))
      .toDF("doc_id", "source", "text")
    val r1 = TextOps.rakeKeyphrases(d1, stops, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSeq === Seq(("deep learning", 1L, 4000000L),
      ("deep networks", 1L, 4000000L)))
    // repeated phrase: occurrences accumulate, deg counts every occurrence
    val d2 = Seq((1L, "s", "fast cars and fast cars"))
      .toDF("doc_id", "source", "text")
    val r2 = TextOps.rakeKeyphrases(d2, stops, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(r2.toSeq === Seq(("fast cars", 2L, 4000000L)))
  }

  test("heapsGrowth: pure repetition saturates at the first checkpoint") {
    val docs = (0 until 8).map(i => (i.toLong, "s", "x y"))
      .toDF("doc_id", "source", "text")
    val rows = TextOps.heapsGrowth(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows(1L) === 2L && rows(8L) === 2L)
  }

  test("charDiversity: hand-computed Simpson micro-units, empty docs dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),  // constant: 10⁶ − 10⁶·16/16 = 0
      (2L, "abab"),  // two chars evenly: 10⁶ − 10⁶·8/16 = 500000
      (3L, "abcd"),  // all distinct: 10⁶ − 10⁶·4/16 = 750000
      (4L, ""))      // empty: no row
      .toDF("doc_id", "text")
    val out = TextOps.charDiversity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((4L, 1L, 0L)),
      2L -> ((4L, 2L, 500000L)),
      3L -> ((4L, 4L, 750000L))))
  }
}
