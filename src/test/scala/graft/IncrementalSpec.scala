package graft

import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, Double)*) =
    rows.toDF("k", "v")

  test("merge of per-batch states equals the state of the union") {
    val b1 = batch("a" -> 1.0, "a" -> 3.0, "b" -> 10.0)
    val b2 = batch("a" -> 5.0, "b" -> -2.0, "c" -> 7.0)
    val viaMerge = Incremental.mergeStates(
      Incremental.aggState(b1, Seq("k"), "v")
        .unionByName(Incremental.aggState(b2, Seq("k"), "v")), Seq("k"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val direct = Incremental.aggState(b1.unionByName(b2), Seq("k"), "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(viaMerge === direct)
    assert(viaMerge("a") === ((3L, 9.0, 1.0, 5.0)))
  }

  test("merge is idempotent-safe across regrouping (associativity)") {
    val b = Seq("a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0).toDF("k", "v")
    val quarters = b.repartition(4)
    val s4 = Incremental.aggState(quarters, Seq("k"), "v")
    // merge in two stages vs one stage
    val once = Incremental.mergeStates(s4, Seq("k")).collect().head
    val twice = Incremental.mergeStates(
      Incremental.mergeStates(s4, Seq("k")), Seq("k")).collect().head
    assert(once.getLong(1) === 4L)
    assert(once === twice)
  }

  test("finalize derives avg and keeps key columns") {
    val st = Incremental.aggState(batch("a" -> 2.0, "a" -> 4.0), Seq("k"), "v")
    val out = Incremental.finalize(st, roundTo = 2).collect().head
    assert(out.getString(0) === "a")
    assert(out.getDouble(2) === 6.0)   // sum
    assert(out.getDouble(3) === 3.0)   // avg
    assert(out.getDouble(4) === 2.0)   // min
    assert(out.getDouble(5) === 4.0)   // max
  }

  test("histogram state: merge of partials equals state of the union") {
    val b1 = batch("a" -> 3.0, "a" -> 17.0, "b" -> 100.0)
    val b2 = batch("a" -> 33.0, "a" -> 999.0, "b" -> 5.0) // 999 clamps to bin 7
    def hist(df: org.apache.spark.sql.DataFrame) =
      Incremental.histState(df, Seq("k"), "v", width = 16, bins = 8)
    val viaMerge = Incremental.mergeHistStates(
        hist(b1).unionByName(hist(b2)), Seq("k"), bins = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    val direct = hist(b1.unionByName(b2))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    assert(viaMerge === direct)
    // a: 3→bin0, 17→bin1, 33→bin2, 999→clamped bin7
    assert(viaMerge("a") === ((4L, List(1L, 1L, 1L, 0L, 0L, 0L, 0L, 1L))))
  }

  test("histogram quantiles: first bin where 100*cum >= p*cnt, hand-derived") {
    // 10 values in bin 0, 9 in bin 2, 1 in bin 5 (cnt=20)
    // p50: target 100*cum >= 50*20=1000 → cum >= 10 → bin 0 (cum 10)
    // p95: 100*cum >= 95*20=1900 → cum >= 19 → bin 2 (cum 19)
    val rows = Seq.fill(10)("a" -> 1.0) ++ Seq.fill(9)("a" -> 40.0) ++
      Seq("a" -> 85.0)
    val st = Incremental.histState(rows.toDF("k", "v"), Seq("k"), "v",
      width = 16, bins = 8)
    val out = Incremental.finalizeHist(st, width = 16, bins = 8,
      percents = Seq(50, 95)).collect().head
    assert(out.getString(0) === "a")
    assert(out.getLong(1) === 20L)
    assert(out.getInt(2) === 0)    // p50_bin
    assert(out.getLong(3) === 0L)  // p50_lo
    assert(out.getInt(4) === 2)    // p95_bin
    assert(out.getLong(5) === 32L) // p95_lo
  }
}
