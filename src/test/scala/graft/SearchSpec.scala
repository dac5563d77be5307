package graft

import graft.operators.{Search, TextOps}

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana banana banana"),
    (3L, "cherry date elderberry"),
    (4L, "apple apple apple apple"),
    (5L, "date date banana apple")
  ).toDF("doc_id", "text")

  test("postings carry per-doc term frequencies") {
    val p = Search.postings(docs)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p(("apple", 1L)) === 2L)
    assert(p(("apple", 4L)) === 4L)
    assert(p(("banana", 2L)) === 3L)
    assert(!p.contains(("cherry", 2L)))
  }

  test("tfidf ranks by exact integer micro-score with doc_id tiebreak") {
    // terms: apple (df=3), banana (df=3); N=5; idf unit = 1e6*5
    // contrib = (tf * 1e6 * 5) div df
    val unit = 1000000L * 5
    def c(tf: Long, df: Long) = tf * unit / df
    val expected = Map(
      1L -> (2L, c(2, 3) + c(1, 3)), // apple 2, banana 1
      2L -> (1L, c(3, 3)),
      4L -> (1L, c(4, 3)),
      5L -> (2L, c(1, 3) + c(1, 3)))
    val out = Search.tfidfTopK(docs, Seq("apple", "banana"), 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
    assert(out.toMap === expected)
    // ordering: score desc, then doc_id
    val scores = out.map(_._2._2)
    assert(scores.sameElements(scores.sortBy(-_)))
    assert(out.map(_._1).toSeq === Seq(4L, 2L, 1L, 5L))
  }

  test("bm25: exact integer scores, saturation, length normalization") {
    // N=5 docs, dl = (4,3,3,4,4) → L=18; df(apple)=df(banana)=3
    val N = 5L; val L = 18L
    def idfM(df: Long) = ((2 * (N - df) + 1) * 1000000L) / (2 * df + 1)
    def satM(tf: Long, dl: Long) =
      (22 * tf * L * 1000000L) / (10 * tf * L + 3 * L + 9 * dl * N)
    def c(tf: Long, df: Long, dl: Long) = idfM(df) * satM(tf, dl) / 1000000L
    val expected = Map(
      1L -> ((2L, c(2, 3, 4) + c(1, 3, 4))), // apple x2, banana x1
      2L -> ((1L, c(3, 3, 3))),
      4L -> ((1L, c(4, 3, 4))),
      5L -> ((2L, c(1, 3, 4) + c(1, 3, 4))))
    val out = Search.bm25TopK(docs, Seq("apple", "banana"), 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === expected)
    // tf saturates: 4 occurrences score well under 4x one occurrence
    assert(c(4, 3, 4) < 4 * c(1, 3, 4))
    // length normalization: same tf, shorter doc scores strictly higher
    assert(satM(1, 3) > satM(1, 4))
  }

  test("RRF: rank-1 in both lists beats rank-1+rank-3; singles counted once") {
    val la = Seq((10L, 900L), (11L, 800L), (12L, 700L)).toDF("doc_id", "s")
    val lb = Seq((10L, 5L), (12L, 4L), (13L, 3L)).toDF("doc_id", "s")
    val out = Search.rrfFuse(Seq((la, "s"), (lb, "s")), "doc_id", c = 60, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def rr(r: Int) = 1000000L / (60 + r)
    assert(out(10L) === ((2L, rr(1) + rr(1))))   // rank 1 in both
    assert(out(12L) === ((2L, rr(3) + rr(2))))
    assert(out(11L) === ((1L, rr(2))))
    assert(out(13L) === ((1L, rr(3))))
    // fused order: 10 first (two rank-1s)
    val top = Search.rrfFuse(Seq((la, "s"), (lb, "s")), "doc_id", 60, 1)
      .collect().head.getLong(0)
    assert(top === 10L)
  }

  test("tfidf top-k truncates deterministically") {
    val out = Search.tfidfTopK(docs, Seq("apple", "banana"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(4L, 2L))
  }

  test("collocations rank tightly-bound bigrams above frequent-but-loose ones") {
    // "san francisco" always co-occurs (lift = N/c_a/c_b is high);
    // "the dog" is frequent but 'the' appears everywhere (low lift)
    val d = (1 to 6).map(i => (i.toLong,
      "san francisco is where the dog and the cat see the bird")).toDF("doc_id", "text")
    val out = TextOps.collocations(d, minCount = 5L, k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(2))
    val m = out.toMap
    assert(m.contains("san francisco"))
    assert(m("san francisco") > m("the dog"))
    // exact integer lift: every token appears 6x except 'the' (18x);
    // N = 72 tokens; lift(san francisco) = 6*72*1e6/(6*6) = 12_000_000
    assert(m("san francisco") === 6L * 72 * 1000000 / (6 * 6))
  }

  test("label affinity: identical-direction labels score 1, orthogonal 0") {
    val d = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(2.0, 0.0), 0),   // label 0 along x
      (3L, Seq(0.0, 3.0), 1),                           // label 1 along y
      (4L, Seq(4.0, 0.0), 2))                           // label 2 along x
      .toDF("vec_id", "embedding", "label")
    val out = graft.operators.Vectors.labelAffinity(d, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((0, 2)) === 1.0)
    assert(out((0, 1)) === 0.0)
    assert(out((1, 2)) === 0.0)
  }

  test("hashingTf folds counts into fixed slots with zero rows preserved") {
    val d = Seq((1L, "x x y"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.hashingTf(d, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size === 16) // 2 docs x 8 slots, zeros included
    assert(out.filter(_._1._1 == 1L).values.sum === 3L) // mass = token count
    assert(out.filter(_._1._1 == 2L).values.sum === 0L)
    // x lands twice in ONE slot (same hash), y once
    assert(out.filter(_._1._1 == 1L).values.toSeq.sorted.reverse.take(2)
      .sameElements(Seq(2L, 1L)))
  }

  test("chunker windows overlap by size-step and keep the short tail") {
    val d = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocs(d, chunkSize = 4, step = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
      .toMap
    // starts at words 1, 4, 7, 10: three full windows and a 1-word tail
    assert(out((1L, 0)) === (("w1 w2 w3 w4", 4)))
    assert(out((1L, 1)) === (("w4 w5 w6 w7", 4)))
    assert(out((1L, 2)) === (("w7 w8 w9 w10", 4)))
    assert(out((1L, 3)) === (("w10", 1)))
    assert(out.size === 4) // empty doc contributes nothing
  }

  test("chunker reconstruction: step-prefixes of chunks rebuild the document") {
    // taking the first `step` words of every chunk (all of the last)
    // must reproduce the original word sequence exactly — for any doc
    // length including multiples of step and the empty doc
    val rnd = new scala.util.Random(31)
    val docs = (0L to 24L).map(i =>
      (i, (1 to rnd.nextInt(50)).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkDocs(docs, chunkSize = 7, step = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split("\\s+").filter(_.nonEmpty).toSeq
      val cs = chunks.getOrElse(id, Array.empty).sortBy(_._2).map(_._3.split(" ").toSeq)
      if (words.isEmpty) assert(cs.isEmpty)
      else {
        val rebuilt = cs.dropRight(1).flatMap(_.take(4)) ++ cs.last
        assert(rebuilt === words, s"doc $id failed reconstruction")
      }
    }
  }

  test("phrase search matches adjacent words only, scored per occurrence") {
    // multi-word entity name (TPC-H part-name shape): "goldenrod lavender
    // spring" appears as an exact phrase in docs 10 (twice) and 11 (once);
    // doc 12 has all three words scattered — bag-of-words TF-IDF would
    // rank it, phrase search must NOT match it.
    val d = Seq(
      (10L, "goldenrod lavender spring x goldenrod lavender spring"),
      (11L, "the goldenrod lavender spring part"),
      (12L, "goldenrod x lavender y spring"),
      (13L, "lavender goldenrod spring")
    ).toDF("doc_id", "text")
    val out = Search.phraseTopK(d,
        Seq("goldenrod", "lavender", "spring"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // df=2, N=4: score = (tf * 1e6 * 4) div 2
    assert(out === Seq((10L, 2L, 4000000L), (11L, 1L, 2000000L)))
  }

  test("phrase search handles repeated words inside the phrase") {
    // phrase "buffalo buffalo buffalo": doc 1 has 4 consecutive -> 2
    // anchor positions (0 and 1) both match (overlaps count, like Lucene)
    val d = Seq((1L, "buffalo buffalo buffalo buffalo"),
      (2L, "buffalo x buffalo buffalo")).toDF("doc_id", "text")
    val out = Search.phraseTopK(d, Seq("buffalo", "buffalo", "buffalo"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((1L, 2L)))
  }

  test("top n-grams count corpus-wide with (count desc, ngram) ties") {
    val d = Seq(
      (1L, "a b a b"),      // "a b" x2, "b a" x1
      (2L, "a b c"),        // "a b", "b c"
      (3L, "x")             // no bigram
    ).toDF("doc_id", "text")
    val out = TextOps.topNgrams(d, n = 2, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(out === Seq("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("S-stemmer: rules, exceptions, and no fall-through") {
    import graft.operators.Search.sStem
    assert(sStem("queries") === "query")
    assert(sStem("vectors") === "vector")
    assert(sStem("windows") === "window")
    assert(sStem("tables") === "table")   // -es drops just the s
    assert(sStem("bus") === "bus")        // -us exception
    assert(sStem("glass") === "glass")    // -ss exception
    assert(sStem("shoes") === "shoes")    // -oes exception, no fall-through
    assert(sStem("trees") === "trees")    // -ees exception
    assert(sStem("join") === "join")      // no suffix
  }

  test("stemmed search unifies plural query with singular documents") {
    import graft.operators.Search
    val rows = Seq(
      (1L, "the vector index"),          // singular
      (2L, "many vectors in one table"), // plural
      (3L, "nothing relevant here"))
    val docs = rows.toDF("doc_id", "text")
    val hits = Search.stemmedTfidfTopK(docs, Seq("vectors"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 2L))
    // Scala twin and SQL CASE agree on every posting term
    val posted = Search.stemmedPostings(docs).select("term")
      .collect().map(_.getString(0)).toSet
    val recomputed = rows.flatMap { case (_, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(Search.sStem)
    }.toSet
    assert(posted === recomputed)
  }

  test("sloppy phrase: slop 0 equals exact phrase; window admits near " +
    "misses; tighter matches outscore looser ones") {
    val d = Seq(
      (1L, "hot spring water is hot"),            // exact "hot spring"
      (2L, "hot mineral spring in the valley"),   // one word between: dev 1
      (3L, "spring is hot today"),                // reversed far apart: no match at slop 1? spring at 0... anchor hot at 2, spring slot 3 -> spring@0 dev 3
      (4L, "hot and very fine spring"),           // dev 3 — outside slop 2
      (5L, "nothing relevant here")
    ).toDF("doc_id", "text")
    // slop 0 ≡ exact adjacency (same docs and tf as phraseTopK)
    val exact = Search.phraseTopK(d, Seq("hot", "spring"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s0 = Search.sloppyPhraseTopK(d, Seq("hot", "spring"), 0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s0 === exact)
    assert(s0 === Map(1L -> 1L))
    // slop 1 admits doc 2 ("hot X spring", dev 1) but not doc 4 (dev 3)
    val s1 = Search.sloppyPhraseTopK(d, Seq("hot", "spring"), 1, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(s1.map(_._1) === List(1L, 2L))
    // doc 1's exact occurrence carries full weight, doc 2's dev-1 half
    val prox = s1.map(t => t._1 -> t._3).toMap
    assert(prox(1L) === 1000000L)
    assert(prox(2L) === 500000L)
    // slop 3 reaches doc 4 (dev 3 → weight 1/4) and doc 3's reversed
    // pair (anchor hot@2, spring@0 → dev 3)
    val s3 = Search.sloppyPhraseTopK(d, Seq("hot", "spring"), 3, 10)
      .collect().map(r => r.getLong(0)).toSet
    assert(s3 === Set(1L, 2L, 3L, 4L))
  }
}
