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

  test("tableProfile plans a single aggregate over one scan") {
    val df = Seq((1L, "x")).toDF("id", "s")
    val plan = Profile.tableProfile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.toString
    // one pass: exactly one leaf relation in the optimized plan
    val leaves = Profile.tableProfile(df, Seq("id", "s"))
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.length === 1, s"expected one scan, got:\n$plan")
  }
}
