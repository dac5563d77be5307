package graft

import org.apache.spark.sql.Row
import graft.operators.Joins

/** Edge semantics of the temporal join operators: inclusive as-of matching,
  * equal-ts tie resolution, no-prior-row nulls, half-open range bounds,
  * multi-bin intervals, and cross-key isolation. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  // ---- asofJoin ----

  private def asofPairs(left: Seq[(String, Long, Int)],
                        right: Seq[(String, Long, Int)]): Map[Int, Any] = {
    val l = left.toDF("k", "t", "lid")
    val r = right.toDF("k", "t", "rid")
    Joins.asofJoin(l, r, "k", "t", Seq("rid"))
      .collect().map(row => row.getAs[Int]("lid") -> row.get(row.fieldIndex("rid")))
      .toMap
  }

  test("asof picks the latest right row at-or-before each left row") {
    val m = asofPairs(
      left = Seq(("a", 10L, 1), ("a", 25L, 2), ("a", 40L, 3)),
      right = Seq(("a", 5L, 100), ("a", 20L, 200), ("a", 30L, 300)))
    assert(m === Map(1 -> 100, 2 -> 200, 3 -> 300))
  }

  test("asof is inclusive: equal timestamps match") {
    val m = asofPairs(left = Seq(("a", 20L, 1)), right = Seq(("a", 20L, 100)))
    assert(m === Map(1 -> 100))
  }

  test("asof with no prior right row yields null payload") {
    val m = asofPairs(
      left = Seq(("a", 10L, 1), ("b", 10L, 2)),
      right = Seq(("a", 15L, 100)))
    assert(m === Map(1 -> null, 2 -> null))
  }

  test("asof keys do not leak across partitions") {
    val m = asofPairs(
      left = Seq(("a", 10L, 1), ("b", 10L, 2)),
      right = Seq(("a", 5L, 100), ("b", 7L, 200)))
    assert(m === Map(1 -> 100, 2 -> 200))
  }

  test("asof equal-ts right ties resolve to the greatest payload") {
    val m = asofPairs(
      left = Seq(("a", 20L, 1)),
      right = Seq(("a", 20L, 100), ("a", 20L, 300), ("a", 20L, 200)))
    assert(m === Map(1 -> 300))
  }

  test("asof preserves every left column and row") {
    val l = Seq(("a", 10L, 1, "x"), ("a", 30L, 2, "y")).toDF("k", "t", "lid", "tag")
    val r = Seq(("a", 5L, 9.5)).toDF("k", "t", "price")
    val out = Joins.asofJoin(l, r, "k", "t", Seq("price"))
    assert(out.columns.toSeq === Seq("k", "t", "lid", "tag", "price"))
    assert(out.count() === 2)
    assert(out.where($"tag" === "y").head().getAs[Double]("price") === 9.5)
  }

  test("asof rejects non-orderable (map) payload columns") {
    val l = Seq(("a", 10L, 1)).toDF("k", "t", "lid")
    val r = Seq(("a", 5L, Map("x" -> 1))).toDF("k", "t", "m")
    assertThrows[IllegalArgumentException] {
      Joins.asofJoin(l, r, "k", "t", Seq("m"))
    }
  }

  // ---- rangeJoinBinned ----

  private def rangePairs(points: Seq[(String, Long, Int)],
                         intervals: Seq[(String, Long, Long, Int)],
                         binWidth: Long): Set[(Int, Int)] = {
    val p = points.toDF("k", "pt", "pid")
    val iv = intervals.toDF("k", "s", "e", "ivid")
    Joins.rangeJoinBinned(p, iv, "k", "pt", "s", "e", binWidth)
      .select("pid", "ivid").as[(Int, Int)].collect().toSet
  }

  test("range join is half-open: start included, end excluded") {
    val pairs = rangePairs(
      points = Seq(("a", 10L, 1), ("a", 19L, 2), ("a", 20L, 3), ("a", 9L, 4)),
      intervals = Seq(("a", 10L, 20L, 100)),
      binWidth = 4L)
    assert(pairs === Set(1 -> 100, 2 -> 100))
  }

  test("range join matches intervals spanning many bins exactly once") {
    val pairs = rangePairs(
      points = Seq(("a", 0L, 1), ("a", 50L, 2), ("a", 99L, 3)),
      intervals = Seq(("a", 0L, 100L, 100)),
      binWidth = 7L)
    assert(pairs === Set(1 -> 100, 2 -> 100, 3 -> 100))
  }

  test("range join with binWidth larger than every interval still matches") {
    val pairs = rangePairs(
      points = Seq(("a", 12L, 1)),
      intervals = Seq(("a", 10L, 14L, 100)),
      binWidth = 1000L)
    assert(pairs === Set(1 -> 100))
  }

  test("range join respects keys and overlapping intervals") {
    val pairs = rangePairs(
      points = Seq(("a", 15L, 1), ("b", 15L, 2)),
      intervals = Seq(("a", 10L, 20L, 100), ("a", 14L, 16L, 200), ("b", 0L, 100L, 300)),
      binWidth = 8L)
    assert(pairs === Set(1 -> 100, 1 -> 200, 2 -> 300))
  }

  test("range join brute-force equivalence on a randomized fixture") {
    val rnd = new scala.util.Random(42)
    val pts = (1 to 200).map(i => ("k" + rnd.nextInt(3), rnd.nextInt(1000).toLong, i))
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(950).toLong
      ("k" + rnd.nextInt(3), s, s + 1 + rnd.nextInt(120), i)
    }
    val expected = (for {
      (pk, pt, pid) <- pts
      (ik, s, e, ivid) <- ivs
      if pk == ik && pt >= s && pt < e
    } yield (pid, ivid)).toSet
    assert(rangePairs(pts, ivs, binWidth = 64L) === expected)
    assert(rangePairs(pts, ivs, binWidth = 7L) === expected)
  }

  test("asof brute-force equivalence on a randomized fixture") {
    val rnd = new scala.util.Random(7)
    // distinct (key, ts) pairs on the right so the tie rule is irrelevant
    val right = rnd.shuffle((1 to 80).map(i =>
      ("k" + (i % 3), (i * 13 % 997).toLong, i)).toList)
    val left = (1 to 120).map(i => ("k" + rnd.nextInt(3), rnd.nextInt(1100).toLong, i))
    val expected = left.map { case (k, t, lid) =>
      val prior = right.filter(r => r._1 == k && r._2 <= t)
      lid -> (if (prior.isEmpty) null else prior.maxBy(r => (r._2, r._3))._3)
    }.toMap
    assert(asofPairs(left, right) === expected)
  }

  // ---- intervalJoinBinned ----

  private def overlapPairs(as: Seq[(String, Long, Long, Int)],
                           bs: Seq[(String, Long, Long, Int)],
                           binWidth: Long): Seq[(Int, Int)] = {
    val a = as.toDF("k", "sa", "ea", "ida")
    val b = bs.toDF("k", "sb", "eb", "idb")
    Joins.intervalJoinBinned(a, b, "k", "sa", "ea", "sb", "eb", binWidth)
      .select("ida", "idb").as[(Int, Int)].collect().toSeq
  }

  test("interval join: half-open overlap, touching intervals excluded") {
    val pairs = overlapPairs(
      as = Seq(("a", 0L, 10L, 1)),
      bs = Seq(("a", 9L, 20L, 10), ("a", 10L, 20L, 11), ("a", 20L, 30L, 12)),
      binWidth = 4L)
    assert(pairs.toSet === Set(1 -> 10)) // [0,10) meets [9,20); not [10,20)
  }

  test("interval join emits a many-shared-bin pair exactly once") {
    // both intervals span bins 0..24 at width 4 — 25 shared bins, one row
    val pairs = overlapPairs(
      as = Seq(("a", 0L, 100L, 1)),
      bs = Seq(("a", 1L, 99L, 10)),
      binWidth = 4L)
    assert(pairs === Seq(1 -> 10))
  }

  test("interval join respects keys") {
    val pairs = overlapPairs(
      as = Seq(("a", 0L, 10L, 1), ("b", 0L, 10L, 2)),
      bs = Seq(("a", 5L, 15L, 10), ("c", 5L, 15L, 11)),
      binWidth = 8L)
    assert(pairs.toSet === Set(1 -> 10))
  }

  test("interval join brute-force equivalence on a randomized fixture") {
    val rnd = new scala.util.Random(77)
    val as = (0 until 60).map { i =>
      val s = rnd.nextInt(200).toLong
      ((if (rnd.nextBoolean()) "a" else "b"), s, s + 1 + rnd.nextInt(30), i)
    }
    val bs = (0 until 60).map { i =>
      val s = rnd.nextInt(200).toLong
      ((if (rnd.nextBoolean()) "a" else "b"), s, s + 1 + rnd.nextInt(30), 1000 + i)
    }
    val expected = (for {
      (ka, sa, ea, ida) <- as
      (kb, sb, eb, idb) <- bs
      if ka == kb && sa < eb && sb < ea
    } yield (ida, idb)).toSet
    for (bw <- Seq(1L, 7L, 16L, 64L)) {
      val got = overlapPairs(as, bs, bw)
      assert(got.size === got.toSet.size, s"dupes at binWidth $bw")
      assert(got.toSet === expected, s"binWidth $bw")
    }
  }
}
