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
}
