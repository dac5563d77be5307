package graft

import graft.operators.Lakehouse

class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
    .toDF("k", "status", "price")

  test("merge: last-writer-wins upsert, delete, insert, pass-through") {
    val changes = Seq(
      (1L, "A", 11.0, 1L, "U"),   // superseded by seq 2
      (1L, "A", 12.0, 2L, "U"),   // wins
      (2L, "B", 20.0, 1L, "D"),   // delete
      (9L, "N", 90.0, 1L, "I"))   // insert
      .toDF("k", "status", "price", "seq", "op")
    val out = Lakehouse.mergeSnapshot(snap, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(out === Map(
      1L -> (("A", 12.0)), 3L -> (("C", 30.0)), 9L -> (("N", 90.0))))
  }

  test("merge: same-seq tie prefers the delete (idempotent replay)") {
    val changes = Seq(
      (1L, "A", 11.0, 1L, "U"), (1L, "A", 10.0, 1L, "D"))
      .toDF("k", "status", "price", "seq", "op")
    val out = Lakehouse.mergeSnapshot(snap, changes, Seq("k"), "seq", "op")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 3L))
  }

  test("diff classifies I/D/U and omits unchanged keys") {
    val after = Seq(
      (1L, "A", 10.0),   // unchanged → omitted
      (2L, "B", 21.0),   // price changed → U
      (4L, "D", 40.0))   // new → I; key 3 missing → D
      .toDF("k", "status", "price")
    val out = Lakehouse.snapshotDiff(snap, after, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "U", 3L -> "D", 4L -> "I"))
  }

  test("diff of merge recovers exactly the effective changelog") {
    val changes = Seq(
      (1L, "A", 12.0, 1L, "U"), (2L, "B", 20.0, 1L, "D"),
      (9L, "N", 90.0, 1L, "I"))
      .toDF("k", "status", "price", "seq", "op")
    val merged = Lakehouse.mergeSnapshot(snap, changes, Seq("k"), "seq", "op")
    val out = Lakehouse.snapshotDiff(snap, merged, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "U", 2L -> "D", 9L -> "I"))
  }

  test("time travel: each version folds one more changelog batch") {
    val log1 = Seq(
      (1L, "A", 15.0, 1L, "U"),
      (2L, "B", 20.0, 1L, "D"),
      (9L, "N", 90.0, 1L, "I")).toDF("k", "status", "price", "seq", "op")
    val log2 = Seq(
      (9L, "N", 95.0, 1L, "U"),  // update a key inserted in v1
      (1L, "A", 15.0, 1L, "D"),  // delete a key updated in v1
      (2L, "B", 25.0, 1L, "I"))  // re-insert a key deleted in v1
      .toDF("k", "status", "price", "seq", "op")
    def state(v: Int) =
      Lakehouse.readVersion(snap, Seq(log1, log2), v, Seq("k"), "seq", "op")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(state(0) === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(state(1) === Map(1L -> 15.0, 3L -> 30.0, 9L -> 90.0))
    assert(state(2) === Map(2L -> 25.0, 3L -> 30.0, 9L -> 95.0))
    assertThrows[IllegalArgumentException](
      Lakehouse.readVersion(snap, Seq(log1, log2), 3, Seq("k"), "seq", "op"))
  }

  test("compactionPlan: hand-derived bins, no file splits, zone maps") {
    import spark.implicits._
    // sizes 1000,3000,500,4000,200 at target 4000: start offsets
    // 0,1000,4000,4500,8500 → bins 0,0,1,1,2
    val files = Seq(("p", 1L, 1000L), ("p", 2L, 3000L), ("p", 3L, 500L),
      ("p", 4L, 4000L), ("p", 5L, 200L), ("q", 1L, 9000L))
      .toDF("part", "file_id", "bytes")
    val m = Lakehouse.compactionPlan(files, "part", "file_id", "bytes", 4000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m(("p", 0L)) === ((2L, 4000L, 1L, 2L)))
    assert(m(("p", 1L)) === ((2L, 4500L, 3L, 4L)))
    assert(m(("p", 2L)) === ((1L, 200L, 5L, 5L)))
    // an oversize file occupies its own bin by start offset — never split
    assert(m(("q", 0L)) === ((1L, 9000L, 1L, 1L)))
    // conservation: every input file lands in exactly one bin
    assert(m.values.map(_._1).sum === 6L)
    assert(m.values.map(_._2).sum === 17700L)
  }
}
