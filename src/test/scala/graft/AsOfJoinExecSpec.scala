package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** The custom physical as-of join: plan shape, semantics vs the
  * compositional union+window form, and the match-boundary edge cases. */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def clicks(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("user_id", "ts_us", "click_id")
  private def views(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("user_id", "ts_us", "view_id")

  test("plans as a single AsOfJoinExec - no window, no union") {
    val out = AsOfJoin.asof(clicks((1L, 10L, 100L)), views((1L, 5L, 200L)),
      "user_id", "ts_us", Seq("view_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Union"), plan)
  }

  test("inclusive at-or-before match, no-match nulls, key isolation") {
    val out = AsOfJoin.asof(
      clicks((1L, 10L, 100L), (1L, 4L, 101L), (2L, 10L, 102L),
        (3L, 10L, 103L)),
      views((1L, 10L, 200L), (1L, 5L, 201L), (2L, 11L, 202L)),
      "user_id", "ts_us", Seq("view_id")).collect()
      .map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(100L) === Some(200L)) // equal ts is inclusive
    assert(out(101L) === None)       // only later views exist
    assert(out(102L) === None)       // view after the click
    assert(out(103L) === None)       // user with no views at all
  }

  test("matches the union+window asofJoin on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 2000).map(i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rRaw = (0 until 3000).map(i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(1000).toLong, 10000L + i))
    // pre-dedup the right side to one row per (key, instant) - the
    // shared contract of both implementations
    val r = rRaw.toDF("user_id", "ts_us", "view_id")
      .groupBy("user_id", "ts_us").agg(max("view_id").as("view_id"))
    val lDf = l.toDF("user_id", "ts_us", "click_id")
    val viaExec = AsOfJoin.asof(lDf, r, "user_id", "ts_us", Seq("view_id"))
      .select("click_id", "view_id").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val viaWindow = graft.operators.Joins.asofJoin(
      lDf, r, "user_id", "ts_us", Seq("view_id"))
      .select("click_id", "view_id").collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(viaExec.size === 2000)
    assert(viaExec === viaWindow)
  }

  test("both sides from the SAME base relation (shared exprIds) bind right") {
    import spark.implicits._
    // the relation-dedup trap: left and right derive from one DataFrame,
    // so their attributes initially share exprIds; the facade re-aliases
    // the right side or the captured right key would bind to the LEFT
    val e = Seq((1L, 5L, 200L, "view"), (1L, 10L, 100L, "click"),
      (2L, 7L, 201L, "view"), (2L, 3L, 102L, "click"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val l = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id").as("click_id"))
    val r = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"))
    val out = AsOfJoin.asof(l, r, "user_id", "ts_us", Seq("view_id"))
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(out === Map(100L -> Some(200L), 102L -> None))
  }

  test("null keys and timestamps never match, rows still survive") {
    val l = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), 1L),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L), 2L),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long], 3L))
      .toDF("user_id", "ts_us", "click_id")
    val out = AsOfJoin.asof(l, views((1L, 5L, 200L)),
      "user_id", "ts_us", Seq("view_id")).collect()
      .map(r => r.getLong(2) -> r.isNullAt(3)).toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> true))
  }
}
