package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Corpus-curation operators: decontamination, hash split, stratified cap,
  * repetition scoring ([[graft.operators.Curation]]). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "en", "srcA", 35),
    (2L, "alpha beta gamma delta epsilon eta", "en", "srcA", 34),
    (3L, "one two three four five six seven", "en", "srcA", 33),
    (4L, "loop loop loop loop loop loop", "en", "srcB", 29),
    (5L, "unique words only here today friend", "en", "srcB", 35),
    (6L, "tiny", "en", "srcB", 4)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("contaminationHits counts distinct shared shingles per train doc") {
    // eval = doc 1; train = docs 2..6. Doc 2 shares exactly the 3-gram
    // windows of "alpha beta gamma delta epsilon": 3 trigrams; others none.
    val hits = Curation.contaminationHits(
      docs.where($"doc_id" =!= 1L), docs.where($"doc_id" === 1L),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits === Map(2L -> 3L))
  }

  test("contaminationHits counts each shared shingle once per doc") {
    val ev = Seq((10L, "spam spam spam spam")).toDF("doc_id", "text")
    // "spam spam spam" appears twice positionally in the train doc but is
    // ONE distinct shingle → one hit
    val tr = Seq((20L, "spam spam spam spam spam")).toDF("doc_id", "text")
    val hits = Curation.contaminationHits(tr, ev, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits === Map(20L -> 1L))
  }

  test("splitOf is deterministic and respects the bucket boundaries") {
    val ids = spark.range(0, 1000).toDF("id")
    val splits = ids.select(Curation.splitOf($"id").as("s"), $"id")
    val counts = splits.groupBy("s").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // md5 buckets are near-uniform: train ~800, validation ~100, test ~100
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("validation") > 50 && counts("validation") < 160)
    assert(counts("test") > 50 && counts("test") < 160)
    // deterministic: re-evaluation gives the identical assignment
    val again = ids.select(Curation.splitOf($"id").as("s2"), $"id")
    assert(splits.join(again, "id").where($"s" =!= $"s2").count() === 0L)
    // a null id surfaces as a null split (not silently bucketed into
    // test). Runtime null via when(), not a null literal: constant-null
    // folding over a LocalRelation trips a Spark interpreted-projection
    // internal error unrelated to the semantics under test.
    val nullSplit = spark.range(1)
      .select(Curation.splitOf(when($"id" < 0, $"id")).as("s"))
      .head().isNullAt(0)
    assert(nullSplit)
  }

  test("stratifiedCap keeps top-quota per strata by (n_chars desc, id)") {
    val kept = Curation.stratifiedCap(docs, "source", "doc_id", quota = 2)
      .select("doc_id").as[Long].collect().toSet
    // srcA: 1 (35), 2 (34) kept, 3 dropped; srcB: 5 (35), 4 (29) kept, 6 dropped
    assert(kept === Set(1L, 2L, 4L, 5L))
  }

  test("packChunks cuts the concatenated token stream at the budget") {
    // tok(each 6-word doc of 4-5 char words) = 6*(1+1) = 12; budget 30:
    // doc1 starts at 0 (chunk 0), doc2 at 12 (chunk 0), doc3 at 24 (chunk 0
    // — straddles the cut at 30), next would start at 36 (chunk 1)
    val d = Seq(
      (1L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35),
      (2L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35),
      (3L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35),
      (4L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = Curation.packChunks(d, "source", "doc_id", budget = 30L)
      .select("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chunks === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("packChunks treats null/empty text as zero tokens, not poison") {
    val d = Seq(
      (1L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35),
      (2L, null.asInstanceOf[String], "en", "srcA", 0),
      (3L, "", "en", "srcA", 0),
      (4L, "alpha betaa gamma delta epsil zetaa", "en", "srcA", 35)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val chunks = Curation.packChunks(d, "source", "doc_id", budget = 20L)
      .select("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc1: start 0 → chunk 0; docs 2,3: 0 tokens at offset 12 → chunk 0;
    // doc4: start 12 → chunk 0 (budget 20 cut at 20, doc4 straddles)
    assert(chunks === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    val chunks2 = Curation.packChunks(d, "source", "doc_id", budget = 10L)
      .select("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // budget 10: doc4 starts at 12 → chunk 1 even with null docs between
    assert(chunks2 === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("packChunks invariants hold on a randomized corpus") {
    // seeded pseudo-random docs across 5 shards; the TRUE invariants only:
    // chunk = floor(start_off/budget) against an independent driver-side
    // cumsum, monotone assignment in doc order, token mass preserved.
    // (Chunk-id contiguity is deliberately NOT asserted: a doc longer than
    // a full budget can jump the next chunk entirely — start offsets, not
    // chunk ids, are the contract.)
    val rnd = new scala.util.Random(42)
    val d = (1L to 200L).map { i =>
      val words = Seq.fill(rnd.nextInt(40))("w" * (1 + rnd.nextInt(9)))
      (i, words.mkString(" "), "en", s"src${rnd.nextInt(5)}", words.size)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val packed = Curation.packChunks(d, "source", "doc_id", budget = 100L)
      .select("source", "doc_id", "tok", "chunk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    packed.groupBy(_._1).foreach { case (_, docs) =>
      val inIdOrder = docs.sortBy(_._2)
      val starts = inIdOrder.scanLeft(0L)(_ + _._3).init
      // chunk matches an independently computed running offset, doc by doc
      inIdOrder.zip(starts).foreach { case ((_, id, _, chunk), start) =>
        assert(chunk === start / 100L, s"doc $id")
      }
      val chunkSeq = inIdOrder.map(_._4)
      assert(chunkSeq === chunkSeq.sorted)             // monotone in id order
    }
    // token mass preserved through the chunk rollup
    val manifest = Curation.packStats(d, budget = 100L)
      .agg(sum(col("chunk_tokens"))).first().getLong(0)
    assert(manifest === packed.map(_._3).sum)
  }

  test("rebalanceWeights up-weights tail sources under sqrt temperature") {
    val d = (1L to 90L).map(i => (i, "x", "en", "big", 1)) ++
      (91L to 100L).map(i => (i, "x", "en", "small", 1))
    val w = d.toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Curation.rebalanceWeights(w).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    // sqrt mass: sqrt(90)+sqrt(10) = 9.4868+3.1623 = 12.6491
    assert(math.abs(rows("big")._1 - 0.75) < 1e-3)     // 9.4868/12.6491
    assert(math.abs(rows("small")._1 - 0.25) < 1e-3)
    assert(rows("small")._2 > 2.0 && rows("big")._2 < 1.0) // boost direction
    // weights sum to 1
    assert(math.abs(rows.values.map(_._1).sum - 1.0) < 1e-6)
  }

  test("endToEndStats drops dups and contaminated docs before split+pack") {
    // doc 13 is eval (13 % 13 == 0); doc 2 duplicates doc 1 exactly (exact
    // dedup drops it); doc 3 shares doc 13's trigrams (decontam drops it);
    // docs 1, 4 survive to the manifest
    val d = Seq(
      (1L, "one two three four five six", "en", "srcA", 27),
      (2L, "one two three four five six", "en", "srcA", 27),
      (3L, "held out benchmark text here today", "en", "srcA", 34),
      (4L, "totally separate content words only", "en", "srcB", 35),
      (13L, "held out benchmark text here today", "en", "srcEval", 34)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Curation.endToEndStats(d, evalMod = 13, budget = 200L)
      .agg(sum(col("n_docs"))).first().getLong(0)
    assert(m === 2L) // only docs 1 and 4 survive, whatever their splits
  }

  test("weightedSampleStats: acceptance is per-source-capped and deterministic") {
    // one dominant source, one tail source: the tail's boost exceeds the
    // head's; rates cap at 1e6
    val d = ((1 to 90).map(i => (i.toLong, s"doc $i", "head")) ++
      (91 to 100).map(i => (i.toLong, s"doc $i", "tail")))
      .toDF("doc_id", "text", "source")
    val out = Curation.weightedSampleStats(d, baseRateMicro = 900000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (headRate, headN, headS) = out("head")
    val (tailRate, tailN, tailS) = out("tail")
    assert(headN === 90L && tailN === 10L)
    assert(tailRate === 1000000L, "boosted tail rate must cap at 1.0")
    assert(tailS === 10L, "capped rate accepts every tail doc")
    assert(headRate < tailRate)
    assert(headS <= headN && headS > 0)
    // deterministic: same inputs, same sample
    val again = Curation.weightedSampleStats(d, baseRateMicro = 900000L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("head") === headS)
  }

  test("splitLeakage flags near-dup groups that span splits") {
    // word-set fingerprint equates reordered texts; choose ids whose
    // hash buckets land in different splits (41 -> train, 42 -> test:
    // asserted via splitOf itself, not hardcoded)
    val d = Seq(
      (41L, "alpha beta gamma", "s"), (42L, "gamma beta alpha", "s"),
      (43L, "unique content here", "s"))
      .toDF("doc_id", "text", "source")
    val splits = d.select(Curation.splitOf($"doc_id").as("s"))
      .collect().map(_.getString(0))
    val expectedSpan = splits.take(2).distinct.length
    val out = Curation.splitLeakage(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(expectedSpan.toLong -> 1L))
  }

  test("redactPii scrubs emails, IPv4s, and phones; counts match") {
    val d = Seq(
      (1L, "reach me at jane.doe+x@sub.example.co.uk or 10.0.42.7 today", "s"),
      (2L, "call 555-123-4567 or 555-987-6543; host 192.168.1.1", "s"),
      (3L, "no pii here, just 1234 and a-b-c and v1.2 markers", "s"))
      .toDF("doc_id", "text", "source")
    val red = d.select($"doc_id", Curation.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "reach me at <EMAIL> or <IP> today")
    assert(red(2L) === "call <PHONE> or <PHONE>; host <IP>")
    assert(red(3L) === "no pii here, just 1234 and a-b-c and v1.2 markers")
    val stats = Curation.piiStats(d, "text").collect().head
    assert(stats.getAs[Long]("n_email") === 1L)
    assert(stats.getAs[Long]("n_ipv4") === 2L)
    assert(stats.getAs[Long]("n_phone") === 2L)
    assert(stats.getAs[Long]("n_docs_redacted") === 2L)
  }

  test("fixEncoding repairs mojibake, never touches valid or wide text") {
    val d = Seq(
      (1L, "a cafÃ© visit"),        // mojibake é → repaired
      (2L, "a naïve façade"),       // legit Latin-1 text → kept
      (3L, "plain ascii stays"),              // ASCII → kept (no shortening)
      (4L, "wide € euro cafÃ©"), // char > U+00FF → kept
      (5L, "d\u00c3\u00a9j\u00c3\u00a0 vu"))  // é and à mojibake → repaired
      .toDF("doc_id", "text")
    val out = d.select($"doc_id", Curation.fixEncodingOf($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "a café visit")
    assert(out(2L) === "a naïve façade")
    assert(out(3L) === "plain ascii stays")
    assert(out(4L) === "wide € euro cafÃ©")
    assert(out(5L) === "d\u00e9j\u00e0 vu")
  }

  test("PII redaction and encoding repair run stateless in a stream") {
    // both scrubs are pure codegen'd column expressions, so they lift into
    // Structured Streaming with zero state — the shape an ingest-time
    // scrub-before-land pipeline uses.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = stream.toDF().toDF("doc_id", "text")
      .select($"doc_id", Curation.fixEncodingOf(
        Curation.redactPii($"text")).as("clean"))
    val q = out.writeStream.format("memory")
      .queryName("scrub_stream").outputMode("append").start()
    try {
      stream.addData(
        (1L, "mail me@x.org from cafÃ©"),
        (2L, "host 10.1.2.3 fine"))
      q.processAllAvailable()
      val got = spark.table("scrub_stream").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(1L) === "mail <EMAIL> from café")
      assert(got(2L) === "host <IP> fine")
    } finally q.stop()
  }

  test("importance weights: target-like raw docs outscore alien ones") {
    val d = Seq(
      (1L, "apple banana cherry apple banana", "tgt"),
      (2L, "apple banana cherry", "tgt"),
      (3L, "apple banana cherry", "raw_like"),   // same tokens as target
      (4L, "xyzzy qwerty plugh", "raw_alien"))   // tokens the target lacks
      .toDF("doc_id", "text", "source")
    val out = Curation.importanceWeightStats(d, "tgt", dim = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("raw_like", "raw_alien"))
    val (likeDocs, likeSel, likeScore) = out("raw_like")
    val (alienDocs, alienSel, alienScore) = out("raw_alien")
    assert(likeDocs === 1L && alienDocs === 1L)
    // target-token buckets hold (tgt+1)/(raw+1) > 1 ratios; alien buckets
    // hold 1/(raw+1) < 1 — selection and ordering follow
    assert(likeSel === 1L, s"target-like doc not selected (score $likeScore)")
    assert(alienSel === 0L, s"alien doc selected (score $alienScore)")
    assert(likeScore > alienScore)
  }

  test("repetitionScore is the duplicate n-gram fraction; null under n words") {
    val r = docs.select($"doc_id",
        Curation.repetitionScore($"text", 2).as("rep2"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(r(5L) === Some(0.0))                  // all bigrams distinct
    assert(r(4L) === Some(4.0 / 5.0))            // "loop loop" ×5 → 1 distinct
    assert(r(6L) === None)                       // 1 word → no bigrams
  }

  test("ngram novelty: duplicates score 0, partial overlap in between") {
    val docs = Seq(
      (1L, "a b c d"),         // owns both of its 3-grams
      (2L, "a b c d"),         // exact dup of 1 → novelty 0
      (3L, "a b c x y z"))     // shares "a b c" with doc 1 → 3/4 novel
      .toDF("doc_id", "text")
    val out = Curation.ngramNoveltyBottomK(docs, "doc_id", "text", n = 3, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (2L, 2L, 0L, 0.0), (3L, 4L, 3L, 0.75), (1L, 2L, 2L, 1.0)))
  }

  test("mixture quota: sums exactly to budget, largest remainder breaks ties") {
    // words of length 1 → 1 token each; sources with 16, 4, 1 tokens
    def doc(src: String, n: Int) = (src, Seq.fill(n)("x").mkString(" "))
    val d = (Seq(doc("a", 16), doc("b", 4), doc("c", 1)))
      .toDF("source", "text")
    // r = (4, 2, 1), R = 7; B = 10 → base = (40/7, 20/7, 10/7) = (5, 2, 1)
    // rem = (5, 6, 3); leftover = 2 → +1 to b (rem 6) and a (rem 5)
    val out = Curation.mixtureQuota(d, "text", budget = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(
      "a" -> ((16L, 6L)), "b" -> ((4L, 3L)), "c" -> ((1L, 1L))))
    assert(out.values.map(_._2).sum === 10L)
  }

  test("length trim keeps the inner percent_rank band, hand-derived") {
    // 21 docs of lengths 1..21: percent_rank = (rank-1)/20, so the
    // [0.05, 0.95] band is ranks 2..20 → lengths 2..20
    val docs = (1 to 21).map(i => (i.toLong, "s", "x" * i))
      .toDF("doc_id", "source", "text")
    val r = Curation.lengthOutlierStats(docs, "text", 0.05, 0.95)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((21L, 19L, 2L, 20L, (2 to 20).sum.toLong)))
  }

  test("shard shuffle: exact partition, permutation pinned by checksum") {
    val docs = (0L until 40L).map(i => (i, "s", "t")).toDF("doc_id", "source", "text")
    val rows = Curation.shardShuffleStats(docs, "doc_id", nShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc lands in exactly one shard
    assert(rows.map(_._2).sum === 40L)
    assert(rows.map(_._3).sum === (0L until 40L).sum)
    // replay the hash on the driver: same shard sizes and same
    // rank-weighted checksum → the within-shard ORDER matches, not just
    // membership
    def h(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:shard".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val expect = (0L until 40L).map(i => (h(i) % 4, h(i), i))
      .groupBy(_._1).map { case (shard, xs) =>
        val ordered = xs.sortBy(x => (x._2, x._3)).map(_._3)
        (shard.toInt, ordered.size.toLong, ordered.sum,
          ordered.zipWithIndex.map { case (id, k) => (k + 1) * id }.sum)
      }.toSet
    assert(rows.toSet === expect)
    // determinism: a second run is byte-identical
    val again = Curation.shardShuffleStats(docs, "doc_id", nShards = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet === rows.toSet)
  }

  test("classifier logit and shard assignment lift stateless to a stream") {
    // both are pure column expressions — the ingest-time score-and-route
    // shape: score each arriving doc, assign its training shard, no state
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = stream.toDF().toDF("doc_id", "text")
      .select($"doc_id",
        Curation.classifierLogitOf($"text").as("logit"),
        pmod(graft.operators.Dedup.md5Long(
          concat($"doc_id".cast("string"), lit(":shard"))), lit(16L))
          .as("shard"))
    val q = out.writeStream.format("memory")
      .queryName("score_route_stream").outputMode("append").start()
    try {
      stream.addData((1L, "alpha beta"), (2L, ""))
      q.processAllAvailable()
      val got = spark.table("score_route_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // batch parity: same rows through the batch expressions
      val batch = Seq((1L, "alpha beta"), (2L, "")).toDF("doc_id", "text")
        .select($"doc_id",
          Curation.classifierLogitOf($"text").as("logit"),
          pmod(graft.operators.Dedup.md5Long(
            concat($"doc_id".cast("string"), lit(":shard"))), lit(16L))
            .as("shard"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === batch)
      assert(got(2L)._1 === 0L)
    } finally q.stop()
  }

  test("classifier score: logit is the sum of slot weights, hand-derived") {
    // one doc, two tokens; replay the bucket + weight recipe on the driver
    def digitMd5(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .replaceAll("[a-f]", "") + "000000"
      d.substring(0, 6).toLong
    }
    def slot(tok: String): Long = digitMd5(tok) % 16
    def wv(s: Long): Long = digitMd5(s"w:$s") % 2001 - 1000
    val docs = Seq((1L, "alpha beta", "src"), (2L, "", "src"))
      .toDF("doc_id", "text", "source")
    val r = Curation.classifierScoreStats(docs).collect().head
    val expected = wv(slot("alpha")) + wv(slot("beta"))
    // doc 2 has no tokens → logit 0, never positive
    assert(r.getLong(1) === 2L)
    assert(r.getLong(3) === expected)
    assert(r.getLong(2) === (if (expected > 0) 1L else 0L))
  }

  test("htmlStripOf: tags collapse, entities decode, no double-decode") {
    import spark.implicits._
    val out = Seq(
      "<p>a<br/>b</p>",             // tags → spaces
      "x &lt;tag&gt; &amp; y",      // entity decode
      "&amp;lt;",                   // MUST become &lt; — not <
      "<a href=\"u\">t</a>")
      .toDF("t")
      .select(graft.operators.Curation.htmlStripOf(col("t")))
      .as[String].collect().toSeq
    assert(out(0) === " a b ")
    assert(out(1) === "x <tag> & y")
    assert(out(2) === "&lt;", "decoding &amp; first would double-decode")
    assert(out(3) === " t ")
  }

  test("urlStats: extraction, scheme split, domain dedup, terminator") {
    import spark.implicits._
    val d = Seq(
      (1L, "s", "go https://a.org/x and http://b.net/y?q=1 now"),
      (2L, "s", "again https://a.org/z."),   // '.' is in the class: joins
      (3L, "s", "plain text, no links"),
      (4L, "t", "end https://c.io/p,next")) // ',' terminates the URL
      .toDF("doc_id", "source", "text")
    val m = Curation.urlStats(d, "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // source s: 3 URLs (https a.org/x, http b.net, https a.org/z.) —
    // trailing '.' is inside the URL class (real pipelines keep it; the
    // cross-engine contract just needs ONE rule), domains {a.org, b.net}
    assert(m("s") === ((3L, 2L, 2L)))
    // source t: ',' is NOT in the class → URL stops before it
    assert(m("t") === ((1L, 1L, 1L)))
    val urls = Curation.urlStats(
      Seq((4L, "t", "end https://c.io/p,next")).toDF("doc_id", "source", "text"),
      "text")
    assert(urls.collect().head.getLong(4) === "https://c.io/p".length.toLong)
  }

  test("URL canonicalization collapses host-case, fragment, trailing slash") {
    // doc_ids 0,1,2 form one triple: uppercase-host / #fragment /
    // trailing-slash raw variants of ONE canonical URL
    val docs = Seq((0L, "plain text"), (1L, "more text"), (2L, "words"))
      .toDF("doc_id", "text")
    val out = Curation.urlCanonicalStats(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "ex0.org")
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((3L, 3L, 1L, 2L))) // 3 raw forms -> 1 canonical, 2 collapsed
  }

  test("perceptron training separates a separable corpus in one round") {
    // positives: 4 distinct words (label rule: wordcount >= 3); negatives:
    // a single different word. Round 1 treats every doc as a mistake
    // (all-zero weights), so w becomes the class-difference vector, which
    // already separates — the final mistake count must be 0.
    val docs = ((0L until 6L).map(i => (i, "dz", "alpha beta gamma delta")) ++
      (10L until 16L).map(i => (i, "dz", "omega")))
      .toDF("doc_id", "source", "text")
    val out = Curation.classifierTrainStats(docs, dim = 16, iters = 3,
      lenThreshold = 3).collect()
    assert(out.length === 17) // dim weight slots + bias
    assert(out.map(_.getLong(2)).distinct.toSeq === Seq(0L),
      "separable corpus must reach zero training mistakes")
    // the learned weights really score positives above negatives
    val w = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    def score(text: String): Long =
      text.split(' ').map { t =>
        val digits = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .replaceAll("[a-f]", "") + "000000"
        w(digits.substring(0, 6).toLong % 16)
      }.sum + w(16L)
    assert(score("alpha beta gamma delta") > 0)
    assert(score("omega") <= 0)
    // deterministic end to end
    val again = Curation.classifierTrainStats(docs, dim = 16, iters = 3,
      lenThreshold = 3).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      out.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
