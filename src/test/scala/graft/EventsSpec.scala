package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Events

/** Events: batch hourly agg + sessionization, streaming windowed agg
  * (MemoryStream), micro-batch upsert merge (S1/S3 incremental).
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def nanos(s: String): Long = Timestamp.valueOf(s).getTime * 1000000L

  test("seasonalDecompose recovers a planted daily spike exactly") {
    // 5 days of hourly events: 10 per hour at hour-of-day 6, 2 otherwise.
    // Hand-derived micro-units: a centered 25-hour frame holds ONE spike
    // (fsum = 24·2 + 10 = 58) except at hod 18, whose frame endpoints land
    // on spikes both sides (fsum = 23·2 + 2·10 = 66); full-frame rows are
    // h in 12..107.
    val rows = for {
      h <- 0 until 120
      i <- 0 until (if (h % 24 == 6) 10 else 2)
    } yield (h.toLong * 1000 + i, h.toLong * 3600L * 1000000000L + i)
    val df = rows.toDF("event_id", "ts")
    val out = Events.seasonalDecompose(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size === 24)
    assert(out(6L) === ((4L, 10000000L - (58000000L / 25)))) //  7680000
    assert(out(18L) === ((4L, 2000000L - (66000000L / 25)))) //  -640000
    assert(out(0L)._2 === 2000000L - (58000000L / 25))       //  -320000
    // the spike hour carries the one large positive index
    assert(out.filter(_._2._2 > 0).keySet === Set(6L))
  }

  test("hourlyAgg buckets by UTC hour") {
    val df = Seq(
      (1L, nanos("2024-01-01 00:30:00"), 1L, "click", 1.0, ""),
      (2L, nanos("2024-01-01 00:45:00"), 1L, "click", 2.0, ""),
      (3L, nanos("2024-01-01 01:10:00"), 2L, "view", 5.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Events.hourlyAgg(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("2024-01-01 00", "click")) === ((2L, 3.0)))
    assert(m(("2024-01-01 01", "view")) === ((1L, 5.0)))
  }

  test("rollingWindowStats: trailing range frame per user, tie-insensitive") {
    def ev(id: Long, user: Long, sec: Long, v: Double) =
      (id, sec * 1000000000L, user, "e", v, "")
    val df = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 10, 2.0), ev(3, 1, 3620, 4.0), // 1,2 out of 3's hour
      ev(4, 1, 3620, 8.0),                                      // tie: both in frame
      ev(5, 2, 0, 16.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Events.rollingWindowStats(df, windowSeconds = 3600L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) === ((1L, 1.0)))
    assert(m(2L) === ((2L, 3.0)))
    // at t=3620 the hour frame starts at 21: events 1 (t=0) and 2 (t=10)
    // fall out; the equal-second pair 3,4 both see each other
    assert(m(3L) === ((2L, 12.0)))
    assert(m(4L) === ((2L, 12.0)))
    assert(m(5L) === ((1L, 16.0)))
  }

  test("funnelCounts: strictly-ordered stages, re-attempts allowed") {
    def ev(id: Long, user: Long, sec: Long, t: String) =
      (id, sec * 1000000000L, user, t, 0.0, "")
    val df = Seq(
      ev(1, 1, 10, "view"), ev(2, 1, 20, "click"), ev(3, 1, 30, "purchase"),
      ev(4, 2, 10, "view"), ev(5, 2, 5, "purchase"),      // purchase precedes view
      ev(6, 3, 5, "click"), ev(7, 3, 10, "view"),         // early click ignored
      ev(8, 3, 15, "click"), ev(9, 3, 20, "purchase"),
      ev(10, 4, 10, "view"), ev(11, 4, 10, "click"))      // same second: not strict
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.funnelCounts(df, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map((1, "view") -> 4L, (2, "click") -> 2L,
      (3, "purchase") -> 2L))
  }

  test("scd2Intervals chains validity windows with an open current row") {
    def ev(id: Long, user: Long, sec: Long, v: Double) =
      (id, sec * 1000000000L, user, "set", v, "")
    val df = Seq(ev(1, 1, 100, 1.0), ev(2, 1, 200, 2.0), ev(3, 2, 50, 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Events.scd2Intervals(df).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), Option(r.get(4)), r.getBoolean(5))))
      .toMap
    assert(rows(1L) === ((100L, Some(200L), false)))
    assert(rows(2L) === ((200L, None, true)))
    assert(rows(3L) === ((50L, None, true)))
  }

  test("iqrOutliers: Tukey fences flag the far point per type") {
    def ev(id: Long, t: String, v: Double) = (id, id * 1000000000L, 1L, t, v, "")
    // type a: values 1..9 (q1=3, q3=7, iqr=4 -> fences [-3, 13]) + outlier 100
    val df = ((1 to 9).map(i => ev(i.toLong, "a", i.toDouble)) :+
      ev(10, "a", 100.0) :+ ev(11, "b", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Events.iqrOutliers(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("a")._1 === 10L)
    assert(m("a")._2 === 1L)
    assert(m("b") === ((1L, 0L)))
  }

  test("sessionStats splits on inactivity gap") {
    def ev(id: Long, user: Long, sec: Long) = (id, sec * 1000000000L, user, "e", 0.0, "")
    val df = Seq(
      ev(1, 1, 0), ev(2, 1, 50), ev(3, 1, 200), ev(4, 1, 250), // user1: 2 sessions (gap 150)
      ev(5, 2, 0))                                             // user2: 1 session
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.sessionStats(df, gapSeconds = 100L).collect().head
    assert(r.getAs[Long]("n_users") === 2L)
    assert(r.getAs[Long]("total_sessions") === 3L)
    assert(r.getAs[Double]("avg_sessions") === 1.5)
    assert(r.getAs[Long]("max_sessions") === 2L)
  }

  test("streamingHourlyCounts over a MemoryStream micro-batch source") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val counts = Events.streamingHourlyCounts(
      stream.toDF().toDF("ts", "event_type", "value"))
    val q = counts.writeStream.format("memory")
      .queryName("hourly_test").outputMode("complete").start()
    try {
      stream.addData(
        (Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:20:00"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 02:05:00"), "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_test").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 02:00:00.0", "view", 1L, 7.0)))
    } finally q.stop()
  }

  test("streamingSlidingCounts: events land in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val counts = Events.streamingSlidingCounts(
      stream.toDF().toDF("ts", "event_type"))
    val q = counts.writeStream.format("memory")
      .queryName("sliding_test").outputMode("complete").start()
    try {
      stream.addData(
        (Timestamp.valueOf("2024-01-01 00:40:00"), "click"),
        (Timestamp.valueOf("2024-01-01 01:10:00"), "click"))
      q.processAllAvailable()
      val rows = spark.table("sliding_test").collect()
        .map(r => (r.getAs[Timestamp]("win_start").toString,
          r.getAs[Long]("n_events"))).toSet
      // 00:40 -> windows [00:00,01:00) and [00:30,01:30);
      // 01:10 -> windows [00:30,01:30) and [01:00,02:00)
      assert(rows === Set(
        ("2024-01-01 00:00:00.0", 1L),
        ("2024-01-01 00:30:00.0", 2L),
        ("2024-01-01 01:00:00.0", 1L)))
    } finally q.stop()
  }

  test("streaming session_window closes sessions after the gap + watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val sessions = Events.streamingSessionCounts(
      stream.toDF().toDF("ts", "user_id"), gap = "30 minutes")
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_test").outputMode("append").start()
    try {
      // two events 10 min apart → one session for user 1
      stream.addData(
        (Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
        (Timestamp.valueOf("2024-01-01 00:10:00"), 1L))
      q.processAllAvailable()
      // a much later event advances the watermark past the session end,
      // forcing the append-mode emission of user 1's closed session
      stream.addData((Timestamp.valueOf("2024-01-01 05:00:00"), 2L))
      q.processAllAvailable()
      stream.addData((Timestamp.valueOf("2024-01-01 09:00:00"), 2L))
      q.processAllAvailable()
      val rows = spark.table("sessions_test").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      assert(rows.contains((1L, 2L)))
    } finally q.stop()
  }

  test("file-source streaming: readStream over the events parquet directory") {
    // the real S1/S3 incremental ingestion shape: a parquet directory as a
    // streaming source, windowed agg downstream (driver snapshot is nanos →
    // ts arrives as long under the legacy flag; convert before windowing)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    spark.range(0, 100)
      .selectExpr("id AS event_id", "id * 1000000000 + 1700000000000000000 AS ts",
        "id % 5 AS user_id", "'click' AS event_type", "1.0 AS value", "'' AS props")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
    val agg = Events.streamingHourlyCounts(stream)
    val q = agg.writeStream.format("memory")
      .queryName("filestream_test").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("filestream_test")
        .agg(sum("n_events")).collect().head.getLong(0)
      assert(n === 100L)
    } finally q.stop()
  }

  test("flatMapGroupsWithState: per-user totals persist across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val totals = Events.statefulUserTotals(stream.toDF().toDF("user_id"))
    val q = totals.writeStream.format("memory")
      .queryName("totals_test").outputMode("update").start()
    try {
      stream.addData(1L, 1L, 2L)
      q.processAllAvailable()
      stream.addData(1L)
      q.processAllAvailable()
      val last = spark.table("totals_test").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      // state carried: user 1 saw 2 then 3 cumulative; user 2 saw 1
      assert(last === Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("streaming heavy hitters: bounded MG state finds the hot key") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val hh = Events.streamingHeavyHitters(
      stream.toDF().toDF("event_type", "user_id"), m = 2)
    val q = hh.writeStream.format("memory")
      .queryName("hh_test").outputMode("update").start()
    try {
      // batch 1: user 7 dominates type "c"; 5 distinct light users churn
      stream.addData(("c", 7L), ("c", 7L), ("c", 1L), ("c", 7L), ("c", 2L))
      q.processAllAvailable()
      // batch 2: more churn + more 7s — state must stay ≤ m entries and 7
      // must survive every decrement (freq 6 > N/(m+1) = 10/3)
      stream.addData(("c", 3L), ("c", 7L), ("c", 4L), ("c", 7L), ("c", 7L))
      q.processAllAvailable()
      val rows = spark.table("hh_test").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val last = rows.filter(_._4 == 10L) // final-batch emission
      assert(last.nonEmpty && last.length <= 2, s"state must stay ≤ m: ${last.toSeq}")
      assert(last.exists(_._2 == 7L), s"hot user must survive: ${last.toSeq}")
      val c7 = last.find(_._2 == 7L).get._3
      assert(c7 >= 1L && c7 <= 6L) // lower bound ≤ true count 6
    } finally q.stop()
  }

  test("streaming graph upsert: foreachBatch folds micro-batches into nodes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    @volatile var state = Seq((1L, "Paper", "seed")).toDF("nodeId", "label", "name")
    val q = stream.toDF().toDF("nodeId", "label", "name")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = Events.upsertBatch(state, batch).cache()
        state.count(): Unit
      }
      .start()
    try {
      stream.addData((1L, "Paper", "overwrite-attempt"), (2L, "Author", "new"))
      q.processAllAvailable()
      stream.addData((3L, "Paper", "later"))
      q.processAllAvailable()
      val m = state.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(m === Map(1L -> "seed", 2L -> "new", 3L -> "later"))
    } finally q.stop()
  }

  test("upsertEdgeBatch: identity-triple dedup + endpoint existence") {
    val nodes = Seq((1L, "A", "a"), (2L, "B", "b")).toDF("nodeId", "label", "name")
    val existing = Seq(("REL", 1L, 2L)).toDF("relType", "src", "dst")
    val batch = Seq(
      ("REL", 1L, 2L),   // replay of existing — deduped
      ("REL", 2L, 1L),   // new orientation — kept (directed identity)
      ("REL", 1L, 99L))  // dangling endpoint — dropped
      .toDF("relType", "src", "dst")
    val out = Events.upsertEdgeBatch(existing, batch, nodes)
      .collect().map(r => (r.getAs[String]("relType"),
        r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(out === Set(("REL", 1L, 2L), ("REL", 2L, 1L)))
  }

  test("upsertBatch merges node arrivals idempotently (first wins)") {
    val existing = Seq((1L, "Paper", "old")).toDF("nodeId", "label", "name")
    val batch = Seq((1L, "Paper", "new"), (2L, "Author", "fresh"))
      .toDF("nodeId", "label", "name")
    val out = Events.upsertBatch(existing, batch).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "old", 2L -> "fresh"))
  }

  test("enrichWithDim broadcasts the dimension into each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Long)]
    val q = Events.enrichWithDim(
        stream.toDF().toDF("event_id", "user_id"), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      stream.addData((10L, 1L), (11L, 2L), (12L, 99L))
      q.processAllAvailable()
      val rows = spark.table("enrich_test").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[String]("tier")).getOrElse("-")).toMap
      assert(rows === Map(10L -> "gold", 11L -> "basic", 12L -> "-"))
    } finally q.stop()
    // the same operator on batch frames plans the dim side as a broadcast
    val plan = Events.enrichWithDim(
      Seq((10L, 1L)).toDF("event_id", "user_id"), dim, "user_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("streamClickAttribution joins streams within the event-time window") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val errors = MemoryStream[(Long, Timestamp, Long)]
    val joined = Events.streamClickAttribution(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      errors.toDF().toDF("user_id", "ts", "event_id"),
      windowSeconds = 3600L)
    val q = joined.writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      errors.addData((1L, ts("2024-01-01 10:00:00"), 900L),
                     (2L, ts("2024-01-01 10:00:00"), 901L))
      clicks.addData(
        (1L, ts("2024-01-01 10:30:00"), 100L),  // in window → matches 900
        (1L, ts("2024-01-01 11:30:00"), 101L),  // past window → no match
        (1L, ts("2024-01-01 09:30:00"), 102L),  // before the error → no match
        (3L, ts("2024-01-01 10:30:00"), 103L))  // other user → no match
      q.processAllAvailable()
      val rows = spark.table("attr_test").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("error_id"))).toSet
      assert(rows === Set((100L, 900L)))
    } finally q.stop()
  }

  test("cohortRetention: offsets from first-activity week, sizes alongside") {
    import spark.implicits._
    val day = 86400000000000L // nanos
    val ev = Seq(
      (1L, 0L * day + 5L),  // u1: weeks 0 and 1 → cohort 0
      (1L, 8L * day),
      (2L, 1L * day),       // u2: week 0 only → cohort 0
      (3L, 7L * day),       // u3: weeks 1 and 3 → cohort 1
      (3L, 21L * day))
      .toDF("user_id", "ts")
    val out = Events.cohortRetention(ev, epochDay = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L),  // cohort 0: both users active in week 0
      (0L, 1L, 1L, 2L),  // only u1 returns in week 1
      (1L, 0L, 1L, 1L),
      (1L, 2L, 1L, 1L))) // u3 returns two weeks after its cohort week
  }

  test("EWMA: time-ordered integer fold with floor halving") {
    val df = Seq(
      (1L, nanos("2024-01-01 00:00:00"), 1L, "e", 4.0, ""),
      (2L, nanos("2024-01-01 00:01:00"), 1L, "e", 2.0, ""),
      (3L, nanos("2024-01-01 00:02:00"), 1L, "e", 3.0, ""),
      (4L, nanos("2024-01-01 00:00:00"), 2L, "e", 7.5, ""),
      // u3: floor case — y = (1 + 1e6) >> 1 = 500000, not 500001
      (5L, nanos("2024-01-01 00:00:00"), 3L, "e", 0.000001, ""),
      (6L, nanos("2024-01-01 00:01:00"), 3L, "e", 1.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Events.ewmaByUser(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // u1: y1=4e6, y2=(2e6+4e6)/2=3e6, y3=(3e6+3e6)/2=3e6
    assert(out(1L) === ((3, 3000000L)))
    assert(out(2L) === ((1, 7500000L)))
    assert(out(3L) === ((2, 500000L)))
  }

  test("EWMA order is (ts, event_id): same-ts events break by id") {
    val df = Seq(
      (11L, nanos("2024-01-01 00:00:00"), 1L, "e", 8.0, ""),
      (10L, nanos("2024-01-01 00:00:00"), 1L, "e", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // id 10 first: y1=2e6, y2=(8e6+2e6)/2=5e6 (reverse order would give 5e6
    // too — use asymmetric check: three events)
    val df3 = df.union(Seq((12L, nanos("2024-01-01 00:00:00"), 1L, "e", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    // order 10,11,12: y=2e6 → 5e6 → 2.5e6
    val out = Events.ewmaByUser(df3).collect().head
    assert(out.getLong(2) === 2500000L)
  }

  test("rollingMadAnomalies: hand-derived centered-window median and MAD") {
    import spark.implicits._
    // one user, values 1,1,1,100,1,1,1 (micro: ×1e6) at ts 0..6
    val df = (0 until 7).map { i =>
      (i.toLong, i.toLong, 1L, "e", if (i == 3) 100.0 else 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.rollingMadAnomalies(df).collect().head
    assert(r.getAs[Long]("n_events") === 7L)
    // every window's lower-middle median is 1e6 (the spike never reaches
    // the middle of any sorted 4..7-row window) → MAD 0 everywhere, and
    // only the spike row deviates: dev 99e6 > 4·0
    assert(r.getAs[Long]("n_anomalies") === 1L)
    assert(r.getAs[Long]("sum_dev") === 99000000L)
    assert(r.getAs[Long]("max_mad") === 0L)
  }

  test("cusumAlarms: sustained shift crosses the threshold exactly once") {
    import spark.implicits._
    // 6 events at 10.0 then 6 at 40.0: target = 300e6 div 12 = 25e6,
    // slack = 6.25e6, h = 50e6. Drift for the highs is +8.75e6/event, so
    // S = 8.75e6·k climbs and only the 6th high (52.5e6) exceeds h.
    val df = (0 until 12).map { i =>
      (i.toLong, i.toLong, 1L, "e", if (i < 6) 10.0 else 40.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.cusumAlarms(df).collect().head
    assert(r.getAs[Long]("n_events") === 12L)
    assert(r.getAs[Long]("n_alarms") === 1L)
    assert(r.getAs[Long]("max_cusum") === 52500000L)
    assert(r.getAs[Long]("first_alarm_id") === 11L)
  }

  test("cusumAlarms: closed form resets after a transient spike") {
    import spark.implicits._
    // one spike in a flat series: S jumps once, then the min-prefix term
    // clamps it back to 0 — the max(0, ·) recurrence reproduced exactly
    val df = (0 until 9).map { i =>
      (i.toLong, i.toLong, 1L, "e", if (i == 4) 30.0 else 10.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.cusumAlarms(df).collect().head
    // target = 110e6 div 9 = 12222222, slack = 3055555; spike drift =
    // 30e6 - 15277777 = 14722223 < h = 24444444 → no alarm, and the flat
    // tail's negative drift (-5277777/event) pulls S back to 0
    assert(r.getAs[Long]("n_alarms") === 0L)
    assert(r.getAs[Long]("max_cusum") === 14722223L)
    assert(r.isNullAt(r.fieldIndex("first_alarm_id")))
  }

  test("autocorrByUser: alternating series has zero lag-1, 2/3 lag-2") {
    import spark.implicits._
    // x centi = [200,0,200,0,200,0]: den = 3·200² = 120000, num1 = 0
    // (every adjacent pair contains a zero), num2 = 2·200² = 80000 →
    // acf2 = 80000e6 div 120000 = 666666
    val df = (0 until 6).map { i =>
      (i.toLong, i.toLong, 1L, "e", if (i % 2 == 0) 2.0 else 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.autocorrByUser(df).collect().head
    assert(r.getAs[Long]("n_events") === 6L)
    assert(r.getAs[Long]("acf1_micro") === 0L)
    assert(r.getAs[Long]("acf2_micro") === 666666L)
  }

  test("coverageIntervals: overlap merges, touch merges, gap splits") {
    import spark.implicits._
    // window length 10: events at 0, 5 (overlap), 15 (touches 5+10),
    // 40 (gap) → runs [0,25) and [40,50): 2 intervals, 35 covered
    val df = Seq(0L, 5L, 15L, 40L).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L, "e", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.coverageIntervals(df, lengthUs = 10L).collect().head
    assert(r.getAs[Long]("n_intervals") === 2L)
    assert(r.getAs[Long]("covered_us") === 35L)
    assert(r.getAs[Long]("max_interval_us") === 25L)
  }

  test("coverageIntervals: the RUNNING max of ends decides breaks") {
    import spark.implicits._
    // windows [0,100), [10,110), [105,205): the event at 105 starts
    // before the running max 110 (though after the first end 100), so
    // everything chains into one [0,205) run — a last-end sweep would
    // split it wrongly
    val df = Seq(0L, 10L, 105L).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, 1L, "e", 1.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.coverageIntervals(df, lengthUs = 100L).collect().head
    assert(r.getAs[Long]("n_intervals") === 1L)
    assert(r.getAs[Long]("covered_us") === 205L)
  }

  test("seasonalityEta2: phase-determined is 1, phase-blind is 0") {
    import spark.implicits._
    val hourUs = 3600000000L
    // 2 days × 4 hours; value = exact function of hour → eta2 = 1
    val diurnal = (for (d <- 0 until 2; h <- 0 until 4) yield
      ((d * 4 + h).toLong, (d * 24 + h) * hourUs, 1L, "a",
        (h + 1) * 10.0, "")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
    // same layout, constant-per-day pattern independent of hour:
    // value alternates 10/20 BY DAY → between-phase means all equal
    val flat = (for (d <- 0 until 2; h <- 0 until 4) yield
      ((d * 4 + h).toLong, (d * 24 + h) * hourUs, 1L, "b",
        if (d == 0) 10.0 else 20.0, "")).toDF(
      "event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Events.seasonalityEta2(diurnal.unionByName(flat), "ts")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(m("a") === Some(1.0))
    assert(m("b") === Some(0.0))
  }

  test("markovTransitions: within-user pairs only, row-conditional micro") {
    import spark.implicits._
    // user 1: a→b→a→b (transitions ab, ba, ab); user 2: c→a — the c→a
    // pair must NOT chain into user 1's stream
    val rows = Seq((1L, 0L, 1L, "a"), (2L, 1L, 1L, "b"), (3L, 2L, 1L, "a"),
      (4L, 3L, 1L, "b"), (5L, 0L, 2L, "c"), (6L, 1L, 2L, "a"))
      .map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val m = Events.markovTransitions(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m(("a", "b")) === ((2L, 1000000L)))  // a always goes to b
    assert(m(("b", "a")) === ((1L, 1000000L)))
    assert(m(("c", "a")) === ((1L, 1000000L)))
    assert(m.size === 3, s"no cross-user transition: $m")
    // split rows: probabilities floor-partition the row mass
    val split = Seq((1L, 0L, 1L, "x"), (2L, 1L, 1L, "y"), (3L, 2L, 1L, "x"),
      (4L, 3L, 1L, "z"))
      .map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val p = Events.markovTransitions(split).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(p(("x", "y")) === 500000L && p(("x", "z")) === 500000L)
  }

  test("holtByUser: hand-derived level/trend fold on a rising series") {
    import spark.implicits._
    // x = 10,20,30 (micro 1e7,2e7,3e7): l1=1e7,t1=0 →
    // l2=(2e7+1e7)>>1=1.5e7, t2=(1.5e7-1e7)>>1=2.5e6 →
    // l3=(3e7+1.5e7+2.5e6)>>1=23750000, t3=(2.5e6+8.75e6)>>1=5625000
    val df = Seq(10.0, 20.0, 30.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong, 1L, "e", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.holtByUser(df).collect().head
    assert(r.getAs[Long]("level_micro") === 23750000L)
    assert(r.getAs[Long]("trend_micro") === 5625000L)
    assert(r.getAs[Long]("forecast_micro") === 29375000L)
  }

  test("holtByUser: collapse to zero exercises the clamp and negative trend") {
    import spark.implicits._
    // 100,0,0,0: the fourth step's raw level goes negative → clamps to 0
    // while the packed negative trend decodes correctly
    val df = Seq(100.0, 0.0, 0.0, 0.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, i.toLong, 1L, "e", v, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.holtByUser(df).collect().head
    assert(r.getAs[Long]("level_micro") === 0L)
    assert(r.getAs[Long]("trend_micro") === -21875000L)
  }

  test("seasonalNaiveError: exact period beats the random walk to zero") {
    import spark.implicits._
    // period-3 signal 1,5,9 repeating over 9 events: seasonal (s=3)
    // errors are all 0 on the 6 scored rows; naive-1 errors |Δ| are
    // 4,4 within a cycle and 8 at each wrap → per scored row
    // [t3..t8]: |5-9|? ordered diffs: x=1,5,9,1,5,9,1,5,9 → x1 diffs at
    // t=3..8: |1-9|=8,|5-1|=4,|9-5|=4,|1-9|=8,|5-1|=4,|9-5|=4 → 32e6
    val df = (0 until 9).map { i =>
      (i.toLong, i.toLong, 1L, "e", Seq(1.0, 5.0, 9.0)(i % 3), "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.seasonalNaiveError(df, season = 3).collect().head
    assert(r.getAs[Long]("n_scored") === 6L)
    assert(r.getAs[Long]("mae_seasonal") === 0L)
    assert(r.getAs[Long]("mae_naive") === 32000000L)
    assert(r.getAs[Long]("mase_micro") === 0L)
  }

  test("seasonalNaiveError: constant series nulls the ratio, not divides") {
    import spark.implicits._
    val df = (0 until 6).map { i =>
      (i.toLong, i.toLong, 1L, "e", 7.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.seasonalNaiveError(df, season = 2).collect().head
    assert(r.getAs[Long]("mae_seasonal") === 0L && r.getAs[Long]("mae_naive") === 0L)
    assert(r.isNullAt(r.fieldIndex("mase_micro")))
  }

  test("rollingMadAnomalies: a steady ramp has nonzero MAD, no anomalies") {
    import spark.implicits._
    // linear ramp 0..9: interior window devs are [3,2,1,0,1,2,3] → lower
    // middle 2 → MAD 2e6; every deviation stays ≤ 4·MAD
    val df = (0 until 10).map { i =>
      (i.toLong, i.toLong, 1L, "e", i.toDouble, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Events.rollingMadAnomalies(df).collect().head
    assert(r.getAs[Long]("n_anomalies") === 0L)
    assert(r.getAs[Long]("max_mad") === 2000000L)
  }
}
