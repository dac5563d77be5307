package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("tableProfile reports per-column stats from one pass") {
    val df = Seq(
      (1L, Some("b"), 10),
      (2L, None, 20),
      (3L, Some("a"), 20))
      .toDF("id", "s", "v")
    val out = Profile.tableProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((3L, 0L, 3L, "1", "3")))
    assert(out("s") === ((3L, 1L, 2L, "a", "b")))   // nulls excluded from ndv/min/max
    assert(out("v") === ((3L, 0L, 2L, "10", "20")))
  }

  test("rollupProfile emits leaf, subtotal and grand-total levels in one pass") {
    val df = Seq(
      ("A", "F", 1.0), ("A", "F", 2.0), ("A", "O", 4.0), ("B", "F", 8.0))
      .toDF("flag", "status", "qty")
    val out = Profile.rollupProfile(df, "flag", "status", "qty")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out((Some("A"), Some("F"))) === ((0L, 2L, 3.0)))
    assert(out((Some("A"), Some("O"))) === ((0L, 1L, 4.0)))
    assert(out((Some("B"), Some("F"))) === ((0L, 1L, 8.0)))
    assert(out((Some("A"), None)) === ((1L, 3L, 7.0)))
    assert(out((Some("B"), None)) === ((1L, 1L, 8.0)))
    assert(out((None, None)) === ((3L, 4L, 15.0)))
    // one pass: rollup plans as Expand over a single scan
    val leaves = Profile.rollupProfile(df, "flag", "status", "qty")
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length === 1)
  }

  test("tableProfile plans a single aggregate over one scan") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val plan = Profile.tableProfile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.toString
    // one pass: exactly one leaf relation in the optimized plan
    val leaves = Profile.tableProfile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length === 1, s"expected one scan, got:\n$plan")
  }

  test("corrPairs: exact +1/-1 on linear columns, NULL on zero variance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, -1L, 7L), (2L, 4L, -2L, 7L), (3L, 6L, -3L, 7L),
      (4L, 8L, -4L, 7L))
      .toDF("a", "b", "c", "k")
    val rows = Profile.corrPairs(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c"), "k" -> col("k")))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(rows("a_b") === Some(1.0))   // b = 2a
    assert(rows("a_c") === Some(-1.0))  // c = -a
    assert(rows("a_k") === None, "constant column: NULL, not an error")
    // moment sums surface exactly: Σab = 2+8+18+32 = 60
    val ab = Profile.corrPairs(df, Seq("a" -> col("a"), "b" -> col("b")))
      .collect().head
    assert(ab.getLong(1) === 4L && ab.getLong(4) === 60L)
  }

  test("gapIslands: hand-derived islands, gaps, and key isolation") {
    import spark.implicits._
    // key A: {1,2,3, 7, 10,11} → 3 islands, gaps 3 and 2 → max 3
    // key B: {5} → 1 island, gap 0; duplicates must not split runs
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 7L), ("A", 10L),
      ("A", 11L), ("A", 2L), ("B", 5L)).toDF("k", "v")
    val r = Profile.gapIslands(df, "k", "v").collect().head
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("n_islands_total") === 4L)
    assert(r.getAs[Long]("max_islands_per_key") === 3L)
    assert(r.getAs[Long]("max_gap") === 3L)
  }

  test("corrPairs runs every pair's moments in one aggregate pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val out = Profile.corrPairs(df, Seq(
      "a" -> col("a"), "b" -> col("b"), "c" -> col("c")))
    // 3 pairs → 3 union branches, but each reads the SAME single
    // aggregate: one leaf per branch, no join anywhere
    assert(!out.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("driftReport: hand-computed L1 and chi-square micro-units") {
    import org.apache.spark.sql.functions.col
    // ref bins {0,0,0,1}, cur bins {0,1,1,1}: both sides p=(¾,¼) vs
    // q=(¼,¾) → per-bin L1 = 500000, per-bin χ² = 10⁶·8²/(4·4·4) = 10⁶
    val ref = Seq(0L, 0L, 0L, 1L).toDF("bin")
    val cur = Seq(0L, 1L, 1L, 1L).toDF("bin")
    val out = Profile.driftReport(ref, cur, col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (-1L, 4L, 4L, 1000000L, 2000000L), // rollup first: bin = -1 sorts low
      (0L, 3L, 1L, 500000L, 1000000L),
      (1L, 1L, 3L, 500000L, 1000000L)))
    // identical distributions → all-zero drift
    val same = Profile.driftReport(ref, ref, col("bin")).collect()
    assert(same.forall(r => r.getLong(3) === 0L && r.getLong(4) === 0L))
    // a bin present on one side only still contributes finitely
    val lop = Profile.driftReport(Seq(0L, 1L).toDF("bin"),
      Seq(0L, 0L).toDF("bin"), col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(lop.toMap.apply(1L) === 500000L, "|1/2 - 0/2| = 0.5")
    // an EMPTY side is undefined drift — NULL metrics, never a "no drift" 0
    val empty = Profile.driftReport(ref,
      Seq.empty[Long].toDF("bin"), col("bin")).collect()
    assert(empty.nonEmpty)
    assert(empty.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "0/0 must surface as null")
  }

  test("streamingDrift: live snapshot + reader fold equals the batch report") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // reference has a bin (2) the stream never sees — the fold restores it
    val ref = Seq(0L, 0L, 0L, 1L, 2L).toDF("bin")
    val hist = Profile.referenceHistogram(ref, col("bin")).localCheckpoint(true)
    val stream = MemoryStream[Long]
    val out = Profile.streamingDrift(hist, stream.toDF().toDF("bin"), col("bin"))
    val q = out.writeStream.format("memory").queryName("drift_test")
      .outputMode("complete").start()
    try {
      stream.addData(0L)
      q.processAllAvailable()
      stream.addData(1L, 1L, 1L)
      q.processAllAvailable()
      val folded = Profile.foldDriftSnapshot(spark.table("drift_test"), hist)
        .collect().map(_.toSeq)
      val batch = Profile.driftReport(ref, Seq(0L, 1L, 1L, 1L).toDF("bin"),
        col("bin")).collect().map(_.toSeq)
      assert(folded.toSeq === batch.toSeq,
        "streaming snapshot + fold ≡ the batch report, ref-only bin included")
    } finally q.stop()
  }
}
