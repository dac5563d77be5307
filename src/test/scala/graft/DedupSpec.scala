package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup family: exact, shingles, MinHash+LSH, n-gram Jaccard, SimHash. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"),// near dup of 1
    (4L, "completely different content entirely here now"),
    (5L, "tiny"),                                          // < 3 words
    (6L, ""))                                              // empty
    .toDF("doc_id", "text")

  test("priority keepers prefer trusted sources, then lowest id") {
    val d = Seq(
      (1L, "same text", "crawl"),
      (2L, "same text", "wiki"),    // wiki beats crawl despite higher id
      (3L, "same text", "crawl"),
      (4L, "other", "crawl"),
      (5L, "third", "books"),       // unlisted source still kept (only copy)
      (6L, "third", "books"))       // tie on priority -> doc_id wins
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Dedup.priorityKeepers(d, "doc_id", "text",
        "source", Seq("wiki", "crawl"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(out === Set((2L, "wiki", 3L), (4L, "crawl", 1L), (5L, "books", 2L)))
  }

  test("exact dedup groups identical texts") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .where(col("n_docs") > 1).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keeper_id") === 1L)
    assert(g.head.getAs[Long]("n_docs") === 2L)
  }

  test("shingle sets: distinct 3-grams, short docs dropped") {
    val m = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[String]]("shingles")).toMap
    assert(!m.contains(5L) && !m.contains(6L))
    // 9 words → 7 shingles, all distinct here
    assert(m(1L).length === 7)
    assert(m(1L).head === "the quick brown")
    assert(m(1L).last === "the lazy dog")
    // exact word-count boundary: 3 words → exactly 1 shingle
    val three = Dedup.shingleSets(Seq((9L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", 3).collect()
    assert(three.head.getAs[Seq[String]]("shingles") === Seq("a b c"))
  }

  test("minhash signatures: identical docs get identical signatures") {
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val sig = Dedup.minhashSignatures(sh, 16).collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 16).map(i => r.getAs[Long](s"mh_$i")))
      .toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
  }

  test("minhash+LSH finds exact and near dups, not unrelated docs") {
    val out = Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jac")))
    assert(out.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
    assert(!out.exists { case (a, b, _) => b == 4L || a == 4L })
  }

  test("n-gram jaccard exact pair values") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) -> r.getAs[Double]("jac"))
      .toMap
    assert(out((1L, 2L)) === 1.0)
    // doc1 vs doc3: 7 shingles each, differ in last 3 ("over the lazy/sleepy",
    // "the lazy/sleepy dog", "jumps over the" shared)... shared = 5 of
    // union 9 → 0.555556
    assert(out((1L, 3L)) === 0.555556)
  }

  test("containment: full excerpt scores 1.0 one way, fraction the other") {
    // d20 = the first 5 words of d21 → every d20 shingle is in d21
    val df = Seq(
      (20L, "alpha beta gamma delta epsilon"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", 3, 0.8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    // d20: 3 shingles, all shared; d21: 7 shingles → c12=1.0, c21=0.428571
    assert(out((20L, 21L)) === ((1.0, 0.428571)))
    // symmetric Jaccard on the same pair is 3/7 — BELOW a 0.5 gate; the
    // containment detector is the one that fires
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5)
    assert(jac.collect().isEmpty)
  }

  test("n-gram jaccard hot-shingle cap bounds pair generation") {
    // 40 docs all sharing one stop-word trigram ("in the end"), each padded
    // with unique words; docs 100/101 are true near-dups of each other.
    val hot = (1L to 40L).map(i => (i, s"in the end unique$i word$i token$i"))
    val near = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon eta"))
    val df = (hot ++ near).toDF("doc_id", "text")

    // uncapped: the hot shingle alone fans out 40·39/2 = 780 pairs
    val unbounded = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0)
    assert(unbounded.count() >= 780)

    // capped at 8 postings: the hot shingle is dropped from the index, so
    // hot-doc pairs vanish (their only shared shingle is gone) while the
    // genuine near-dup pair survives with its filtered-universe Jaccard
    // (sets of 4 shingles each, 3 shared → 3/5)
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0,
      maxPostings = 8)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) -> r.getAs[Double]("jac"))
      .toMap
    assert(capped.size === 1)
    assert(capped((100L, 101L)) === 0.6)

    // cap high enough to keep everything ⇒ identical to uncapped
    val loose = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0,
      maxPostings = 1000)
    assert(loose.count() === unbounded.count())
  }

  test("simhash groups identical docs, keeps singletons out") {
    val g = Dedup.simhashGroups(docs, "doc_id", "text", 16).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keeper_id") === 1L)
    assert(g.head.getAs[Long]("n_docs") === 2L)
  }

  test("LSH hot-bucket cap bounds a degenerate bucket's pair fan-out") {
    // 20 identical docs collide in EVERY band; capped, the pathological
    // bucket is dropped and no pairs emerge from it, while distinct
    // near-dups (1,3) still pair through an uncrowded bucket
    val flood = (100L to 119L).map(i => (i, "flood flood flood flood flood"))
    val df = (flood ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the sleepy dog"))).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(
      Dedup.shingleSets(df, "doc_id", "text", 3), 16)
    val uncapped = Dedup.lshCandidatePairs(sigs, 16, 4)
    assert(uncapped.count() >= 190L) // 20*19/2 flood pairs
    val capped = Dedup.lshCandidatePairs(sigs, 16, 4, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 3L)))
  }

  test("simhash band-bucket cap bounds a hot band's pair fan-out") {
    // 30 docs with the SAME signature collide in every band (the
    // flat-content hot key); uncapped, that single bucket alone explodes
    // 30*29/2 pairs in one task — capped, it is dropped entirely while a
    // small planted group still pairs through its own uncrowded buckets
    val hot = (100L to 129L).map(i => (i, 0L))
    val planted = Seq((1L, 0x5555AAAAL), (2L, 0x5555AAABL), (3L, 0x5555AAAAL))
    val sigs = (hot ++ planted).toDF("doc_id", "simhash")
    val uncapped = Dedup.simhashBandPairs(sigs, bits = 32, bands = 4,
      maxDist = 4)
    assert(uncapped.count() === 30L * 29 / 2 + 3L)
    val capped = Dedup.simhashBandPairs(sigs, bits = 32, bands = 4,
      maxDist = 4, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
    // the pHash pairing shares the same valve through the same core
    val phSigs = (hot ++ planted).toDF("doc_id", "phash")
    val ph = graft.operators.ImageHash.phashNearDupPairs(phSigs,
      bands = 4, maxDist = 4, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ph === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("banded-pairing default maxBucket is bounded: a >1024-doc hot bucket drops with no explicit cap") {
    // r10's API footgun: defaults were Int.MaxValue, so a library user
    // calling with defaults got the quadratic path the valve exists to
    // prevent. Now 1024 (the minhashLsh/streaming convention): 1100 docs
    // with the flat all-zero signature exceed the default cap and must
    // vanish, while the planted duo still pairs
    val hot = (1L to 1100L).map(i => (i, 0L))
    val planted = Seq((5000L, 0x5555AAAAL), (5001L, 0x5555AAAAL))
    val sigs = (hot ++ planted).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashBandPairs(sigs, bits = 32, bands = 4, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((5000L, 5001L)))
    val multi = (1L to 1100L).map(i => (i, Seq(0L, 0L, 0L))) ++
      Seq((5000L, Seq(7L, 0L, 0L)), (5001L, Seq(7L, 0L, 0L)))
    val mp = Dedup.simhashBandPairsMulti(multi.toDF("doc_id", "sig"),
        words = 3, bands = 24, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp === Set((5000L, 5001L)))
  }

  test("hot-bucket valve filters BEFORE collect_list (spillable window below the aggregate)") {
    // the ADVICE-r10 OOM shape: filtering AFTER collect_list still built
    // the corpus-sized array in one aggregation buffer. The occupancy
    // count must now be a Window (spillable) strictly BELOW the
    // collect_list aggregate in the physical plan — children print after
    // parents in the tree string
    val sigs = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "simhash")
    val plan = Dedup.simhashBandPairs(sigs, bits = 32, bands = 4,
      maxDist = 4, maxBucket = 8).queryExecution.executedPlan.toString
    val aggIdx = plan.indexOf("collect_list")
    val winIdx = plan.indexOf("__occ")
    assert(aggIdx >= 0 && winIdx > aggIdx,
      s"expected __occ window below collect_list; plan:\n$plan")
  }

  test("ngramJaccardPairs matches brute-force set Jaccard on random docs") {
    // the distributed single-scan pipeline vs literal set arithmetic on the
    // driver — every pair with >= 1 shared shingle, exact values
    val rnd = new scala.util.Random(7)
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    val docs = (1L to 30L).map(i =>
      (i, (0 until 5 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val out = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleN = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = docs.map { case (id, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val expected = (for {
      (i, si) <- sets; (j, sj) <- sets
      if i < j && (si & sj).nonEmpty
    } yield (i, j) -> BigDecimal((si & sj).size.toDouble / (si | sj).size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(out === expected)
  }

  private val sndBase = "the quick brown fox jumps over the lazy dog again and again"
  private val sndNear = "the quick brown fox jumps over the sleepy dog again and again"
  private val sndFar = "completely different content about spark physical plans here"

  test("streaming near-dup pairs surface across micro-batches") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingNearDupPairs(
      stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      "ts", "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sneardup_test").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData((1L, sndBase, t0), (3L, sndFar, t0))
      q.processAllAvailable()
      assert(spark.table("sneardup_test").count() === 0) // nothing similar yet
      // a near-dup arriving in a LATER micro-batch pairs with stored state
      stream.addData((2L, sndNear, Timestamp.valueOf("2024-01-01 00:05:00")))
      q.processAllAvailable()
      val pairs = spark.table("sneardup_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((1L, 2L)))
      // agreement fraction is meaningful (shared prefix/suffix shingles)
      val agree = spark.table("sneardup_test").collect().head.getDouble(2)
      assert(agree >= 0.5 && agree < 1.0)
    } finally q.stop()
  }

  test("streaming near-dup state expires past the TTL horizon") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingNearDupPairs(
      stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      "ts", "10 minutes", stateTtl = java.time.Duration.ofHours(1))
    val q = out.writeStream.format("memory")
      .queryName("sneardup_ttl").outputMode("append").start()
    try {
      stream.addData((1L, sndBase, Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // advance the watermark far past doc 1's TTL horizon (01:00): an
      // unrelated doc at 06:00 pushes the watermark to 05:50
      stream.addData((9L, sndFar, Timestamp.valueOf("2024-01-01 06:00:00")))
      q.processAllAvailable()
      // doc 1's entry is expired — its near-dup no longer pairs
      stream.addData((2L, sndNear, Timestamp.valueOf("2024-01-01 06:01:00")))
      q.processAllAvailable()
      assert(spark.table("sneardup_ttl").count() === 0)
      // but a FRESH near-dup within the horizon still pairs (state machinery
      // intact, only the expired entry is gone)
      stream.addData((3L, sndNear, Timestamp.valueOf("2024-01-01 06:02:00")))
      q.processAllAvailable()
      val pairs = spark.table("sneardup_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((2L, 3L)))
    } finally q.stop()
  }

  test("streaming near-dup bucket freezes at the maxBucket cap") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingNearDupPairs(
      stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text",
      "ts", "10 minutes", maxBucket = 2)
    val q = out.writeStream.format("memory")
      .queryName("sneardup_cap").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
      // three identical docs: ids 1,2 admitted (one pair per colliding
      // band), id 3 skipped at capacity — no (1,3)/(2,3) pairs, bounding
      // the per-bucket fan-out exactly like the batch maxBucket valve
      stream.addData((1L, sndBase, t0), (2L, sndBase, t0), (3L, sndBase, t0))
      q.processAllAvailable()
      val pairs = spark.table("sneardup_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs.toSeq === Seq((1L, 2L)))
      // and a later arrival into the frozen bucket stays excluded
      stream.addData((4L, sndBase, Timestamp.valueOf("2024-01-01 00:01:00")))
      q.processAllAvailable()
      val pairs2 = spark.table("sneardup_cap").collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct
      assert(pairs2.toSeq === Seq((1L, 2L)))
    } finally q.stop()
  }

  test("streaming exact dedup keeps only the first doc per content hash") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingExactDedup(
      stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("sdedup_test").outputMode("append").start()
    try {
      stream.addData(
        (1L, "same text", Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, "same text", Timestamp.valueOf("2024-01-01 00:10:00")),
        (3L, "other text", Timestamp.valueOf("2024-01-01 00:20:00")))
      q.processAllAvailable()
      // a later micro-batch duplicate within the watermark is suppressed too
      stream.addData((4L, "same text", Timestamp.valueOf("2024-01-01 00:30:00")))
      q.processAllAvailable()
      val ids = spark.table("sdedup_test").collect().map(_.getAs[Long]("doc_id")).sorted
      assert(ids === Array(1L, 3L))
    } finally q.stop()
  }

  test("streaming exact dedup evicts state past the watermark (documented trade)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val out = Dedup.streamingExactDedup(
      stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory")
      .queryName("sdedup_evict").outputMode("append").start()
    try {
      stream.addData((1L, "same text", Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      // advance the watermark far past doc 1's horizon, evicting its state
      stream.addData((2L, "advancer", Timestamp.valueOf("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // the SAME content arriving after eviction is re-emitted — the
      // bounded-state/recall trade the scaladoc promises (widen the
      // watermark to tighten recall)
      stream.addData((3L, "same text", Timestamp.valueOf("2024-01-01 02:01:00")))
      q.processAllAvailable()
      val ids = spark.table("sdedup_evict").collect()
        .map(_.getAs[Long]("doc_id")).sorted
      assert(ids === Array(1L, 2L, 3L))
    } finally q.stop()
  }

  test("bloomMaybeDup: no false negatives, bounded false positives, map-side probe") {
    val history = (1L to 500L).map(i => (i, s"historical doc number $i text"))
      .toDF("doc_id", "text")
    val dups = (1L to 20L).map(i => (1000L + i, s"historical doc number $i text"))
    val novel = (1L to 100L).map(i => (2000L + i, s"brand new incoming doc $i"))
    val probed = Dedup.bloomMaybeDup(history, (dups ++ novel).toDF("doc_id", "text"),
      "text", expectedItems = 500L)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    // every true duplicate MUST be flagged — bloom guarantees no false negatives
    assert(dups.forall { case (id, _) => probed(id) })
    // false positives bounded well above the 3% design point but far
    // below "everything" — the filter actually discriminates
    val fp = novel.count { case (id, _) => probed(id) }
    assert(fp <= 15, s"$fp false positives out of 100")
    // the probe itself must plan as a literal bit test: no join, no shuffle
    val plan = Dedup.bloomMaybeDup(history, novel.toDF("doc_id", "text"),
      "text", expectedItems = 500L).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
    // empty history → null aggregate result → nothing is a dup (not a
    // null column)
    val empty = Dedup.bloomMaybeDup(history.where(lit(false)),
      novel.take(3).toDF("doc_id", "text"), "text", expectedItems = 500L)
      .collect().map(_.getBoolean(2))
    assert(empty.forall(_ == false))
  }

  test("md5Long matches the DuckDB hex-prefix conversion on a known value") {
    // DuckDB: ('0x'||substr(md5('hello'),1,15))::BIGINT = 419982666956583591
    val v = spark.range(1).select(Dedup.md5Long(lit("hello"))).head().getLong(0)
    assert(v === 419982666956583591L)
  }

  test("probeNearDups finds batch dups via the index, never rescans text") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // = doc 1
      (11L, "totally different words nothing shared here at all"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4)
    val hits = Dedup.probeNearDups(index, batch, "doc_id", "text",
        n = 3, numHashes = 16, numBands = 4, minAgree = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical text → identical signature → agree 1.0 against doc 1 only
    assert(hits.toSeq === Seq((10L, 1L, 1.0)))
  }

  test("inline band index emits exactly the batch index's rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = Dedup.minhashBandIndex(docs, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4)
    val inline = Dedup.minhashBandIndexInline(docs, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4)
    assert(batch.count() > 0)
    assert(batch.exceptAll(inline).count() === 0)
    assert(inline.exceptAll(batch).count() === 0)
  }

  test("streaming probe matches the batch probe, statelessly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4).localCheckpoint(true)
    val stream = MemoryStream[(Long, String)]
    val out = Dedup.streamingProbeNearDups(index,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4, minAgree = 0.5)
    val q = out.writeStream.format("memory")
      .queryName("sprobe_test").outputMode("append").start()
    try {
      stream.addData((10L, "alpha beta gamma delta epsilon zeta eta theta"),
        (11L, "totally different words nothing shared here at all"))
      q.processAllAvailable()
      val rows = spark.table("sprobe_test").collect()
      // per-band emission: the identical doc matches in all 4 bands
      assert(rows.length === 4)
      val pairs = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .distinct
      assert(pairs.toSeq === Seq((10L, 1L, 1.0))) // = the batch probe's row
    } finally q.stop()
  }

  test("chunkDupStats reports only cross-doc windows, not within-doc repeats") {
    val d = Seq(
      (1L, "a b c x y z"),       // "a b c" + "x y z"
      (2L, "a b c q"),           // "a b c" + "q"
      (3L, "a b c"),             // "a b c"
      (4L, "r s t r s t"))       // "r s t" twice — ONE doc → excluded
      .toDF("doc_id", "text")
    val out = Dedup.chunkDupStats(d, chunkSize = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // "a b c" appears in 3 docs, 3 occurrences, 9 duplicated tokens
    assert(out === Map(3L -> (1L, 3L, 9L)))
  }

  test("dupSpanStats: overlapping shingles merge to exact span coverage") {
    // docs 1 and 2 share a verbatim 10-token run inside different
    // surroundings; doc 3 shares nothing. n=8 → the run yields 3
    // overlapping duplicated shingles (positions differ per doc) whose
    // union is exactly the 10 run tokens — coverage counts TOKENS, not
    // shingles.
    val run = (1 to 10).map(i => s"r$i").mkString(" ")
    val d = Seq(
      (1L, s"x1 x2 $run y1 y2"),
      (2L, s"z1 $run"),
      (3L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(d, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(1L -> ((14L, 10L)), 2L -> ((11L, 10L))))
  }

  /** Canonical robust winnowing (Schleimer et al., Fig. 7): per window,
    * min hash with the RIGHTMOST tie; distinct selected hash values. */
  private def refWinnow(tokens: Seq[String], n: Int, w: Int): Set[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val hs = tokens.sliding(n).map(g => h(g.mkString(" "))).toVector
    (0 to hs.length - w).map { q0 =>
      val win = hs.slice(q0, q0 + w)
      win(win.lastIndexOf(win.min))
    }.toSet
  }

  test("winnowing selection matches the canonical algorithm per document") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val docs = (0 until 4).map { i =>
      (i.toLong, s"src$i",
        Seq.fill(25 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }
    val out = Dedup.winnowingStats(docs.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", n = 3, winSize = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (_, src, text) =>
      val toks = text.split(" ").toSeq
      val ref = refWinnow(toks, 3, 4)
      assert(out(src)._1 === toks.length - 2L, s"$src positions")
      assert(out(src)._2 === ref.size.toLong, s"$src selected")
    }
  }

  test("CDC chunks survive a front insertion (the content-defined point)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "plum",
      "gold", "rust", "jade", "onyx")
    val base = Seq.fill(120)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val shifted = "zz yy xx ww vv " + base
    val docs = Seq((1L, "a", base), (2L, "b", shifted))
      .toDF("doc_id", "source", "text")
    val out = Dedup.cdcChunkStats(docs, "doc_id", "text", "source", 3, 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3)))).toMap
    // the 5-token prefix shifts every fixed offset, but content-defined
    // boundaries re-synchronize: chunks after the first shared boundary
    // are identical across the two docs
    assert(out("a")._2 >= 1L && out("b")._2 >= 1L,
      s"expected shared chunks after re-sync: $out")
    // a doc with no duplicate content reports zero duplicate mass
    val solo = Dedup.cdcChunkStats(
      Seq((9L, "s", base)).toDF("doc_id", "source", "text"),
      "doc_id", "text", "source", 3, 16).collect().head
    assert(solo.getLong(3) === 0L && solo.getLong(4) === 0L)
  }

  test("winnowing guarantee: a shared 8-token run yields shared fingerprints") {
    val run = "one two three four five six seven eight"
    val docs = Seq(
      (1L, "a", s"xx yy zz $run qq ww ee"),
      (2L, "b", s"aa bb $run cc dd ff gg hh")).toDF("doc_id", "source", "text")
    val out = Dedup.winnowingStats(docs, "doc_id", "text", "source", 3, 4)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // shared substring length 8 ≥ winSize + n − 1 = 6 → guaranteed hit
    assert(out("a") >= 1L && out("b") >= 1L, out.toString)
  }

  test("LSH recall audit: the banding S-curve is visible and quantified") {
    import spark.implicits._
    // 10 near-dup pairs per fixture: doc 2k+1 repeats doc 2k's text with
    // ONE word changed; doc length tunes the pair Jaccard. All hashing is
    // md5-deterministic, so the found-counts are pinned forever.
    def fixture(words: Int) = {
      val base = (0 until 10).map(k =>
        (0 until words).map(j => s"w${k}_$j").mkString(" "))
      base.zipWithIndex.flatMap { case (t, k) =>
        Seq((2L * k, t), (2L * k + 1, t.replace(s"w${k}_5", "changed")))
      }.toDF("doc_id", "text")
    }
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(words: Int, bands: Int): (Int, Int) = {
      val docs = fixture(words)
      val exact = pairsOf(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        3, 0.5, 64))
      val lsh = pairsOf(Dedup.minhashLsh(docs, "doc_id", "text",
        3, 16, bands, 0.5))
      (exact.size, (exact intersect lsh).size)
    }
    // high-similarity pairs (jac ≈ 0.86): catalog 4×4 banding finds ALL,
    // a single 16-row band (P ≈ jac^16) finds 3 — the report's
    // recall_micro would read 1e6 vs 3e5, which is exactly the signal
    // dedup_recall_report exists to surface
    assert(recall(40, 4) === ((10, 10)))
    assert(recall(40, 1) === ((10, 3)))
    // borderline pairs (jac ≈ 0.54, right at the threshold): even the
    // catalog banding's S-curve only recovers 2 of 10 — sub-threshold
    // recall is a BANDING property, not a bug, and the audit quantifies
    // it instead of letting it pass silently
    assert(recall(12, 4) === ((10, 2)))
  }
}
