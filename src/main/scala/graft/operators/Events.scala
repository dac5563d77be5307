package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the driver's `events` table. The reference
  * itself is batch-only (SURVEY §2.9), so these are the forward-looking
  * ingestion/analysis path: the same aggregations run identically as batch
  * DataFrame ops (below, oracle-checked) and as Structured Streaming
  * micro-batches ([[streamingHourlyCounts]], exercised in tests with a
  * MemoryStream — watermark + tumbling window).
  *
  * The driver's events parquet stores TIMESTAMP(NANOS), which Spark's
  * vectorized reader only accepts as int64 nanos
  * (`spark.sql.legacy.parquet.nanosAsLong=true`) — so these operators take
  * `ts` as epoch-NANOS LongType and truncate with integer arithmetic
  * (`div`), never double division (2024 epoch-nanos ≈ 1.7e18 overflows a
  * double's 53-bit mantissa).
  */
object Events {

  /** Epoch seconds from the epoch-nanos long `ts` column (floor, like
    * `date_trunc('second')` for post-1970 data). `div` is Long-exact
    * integer division — never go through double here. */
  private def epochSec: Column = expr("ts div 1000000000")

  /** Tumbling 1-hour window aggregation, batch form. The hour is emitted as
    * a formatted string so the result is engine/timezone-agnostic (session
    * timezone must be UTC, which Verify/Bench set). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
        date_format(timestamp_seconds(expr("((ts div 1000000000) div 3600) * 3600")),
          "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))

  /** Classical additive SEASONAL DECOMPOSITION of the global hourly count
    * series (period 24): trend = centered (2·half+1)-point moving average
    * of the hourly counts (integer micro-units, truncating div), detrended
    * = y·10⁶ − trend, seasonal index = per-hour-of-day mean of the
    * detrended series over FULL-frame rows only (edge hours lack a
    * centered window and are excluded, the textbook convention). Returns
    * `period` rows (hod, n_obs, seasonal_micro) — the daily-shape profile
    * a pipeline-load planner reads.
    *
    * Scale shape: the corpus scan is ONE hourly groupBy; the global
    * ordered window then runs over the O(hours) ROLLUP (10 years ≈ 87k
    * rows — a single-partition window over a bounded series, never the
    * corpus), and the seasonal means are one O(period) aggregate. */
  def seasonalDecompose(events: DataFrame, half: Int = 12,
                        period: Int = 24): DataFrame = {
    val hourly = events
      .select(expr("(ts div 1000000000) div 3600").as("h"))
      .groupBy("h").agg(count(lit(1)).as("y"))
    val frame = Window.orderBy("h").rowsBetween(-half, half)
    hourly
      .withColumn("fsum", sum(col("y")).over(frame))
      .withColumn("fcnt", count(lit(1)).over(frame))
      .where(col("fcnt") === 2 * half + 1)
      .withColumn("trend_micro", expr("(fsum * 1000000) div fcnt"))
      .withColumn("detr_micro", col("y") * lit(1000000L) - col("trend_micro"))
      .withColumn("hod", pmod(col("h"), lit(period.toLong)))
      .groupBy("hod")
      .agg(count(lit(1)).as("n_obs"),
        expr("sum(detr_micro) div count(1)").as("seasonal_micro"))
      .orderBy("hod")
  }

  /** Per-event trailing time-range window: for every event, the count and
    * value-sum of the same user's events in the preceding `windowSeconds`
    * (inclusive of the current second — a RANGE frame on epoch seconds, so
    * equal-timestamp events are all in frame and the result is
    * order-insensitive). One shuffle on user_id; per-key state is bounded
    * by the window span, which is exactly the shape that survives 100 TB
    * (and its streaming twin is a watermarked sliding window). */
  def rollingWindowStats(events: DataFrame, windowSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tss"))
      .rangeBetween(-(windowSeconds - 1), 0)
    events.select(col("event_id"), col("user_id"), epochSec.as("tss"),
        col("value"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window", round(sum("value").over(w), 2))
      .select("event_id", "n_window", "sum_window")
  }

  /** Per-type IQR (Tukey fence) outlier detection: exact interpolated
    * quartiles per event_type, fences at 1.5×IQR, then one counting pass
    * with the fences broadcast — quantile state never shuffles the fact
    * side. */
  def iqrOutliers(events: DataFrame): DataFrame = {
    val ps = percentile(col("value"), array(lit(0.25), lit(0.75)))
    val bounds = events.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        element_at(ps, 1).as("q1"), element_at(ps, 2).as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      .select("event_type", "n_events", "lo", "hi")
    events.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"), col("n_events"), col("lo"), col("hi"))
      .agg(sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n_events"), col("n_outliers"),
        round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
  }

  /** Ordered funnel analysis: how many users complete stage 1, then stage
    * 2 strictly after their stage-1 time, and so on (conversion funnel —
    * MATCH_RECOGNIZE-lite). Each stage is one keyed min-aggregate joined
    * to the previous stage's completion times, so cost is |stages| keyed
    * aggregates over filtered slices, never a per-user sort.
    * Returns (stage_idx, stage, n_users). */
  def funnelCounts(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    var cur = events.where(col("event_type") === stages.head)
      .select(col("user_id"), epochSec.as("tss"))
      .groupBy("user_id").agg(min("tss").as("t"))
    val counts = Seq.newBuilder[DataFrame]
    counts += cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("stage_idx"), lit(stages.head).as("stage"), col("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (s, i) =>
      cur = events.where(col("event_type") === s)
        .select(col("user_id"), epochSec.as("tss"))
        .join(cur, Seq("user_id"))
        .where(col("tss") > col("t"))
        .groupBy("user_id").agg(min("tss").as("t"))
      counts += cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(s).as("stage"), col("n_users"))
    }
    counts.result().reduce(_.unionByName(_))
  }

  /** SCD2 history build: treat each user's events as attribute-change
    * records and assign every record its validity interval —
    * [valid_from, valid_to) with `valid_to` = the next change's second and
    * NULL (open) on the latest record. One keyed window (lead), ties broken
    * by event_id; this is the write side of the as-of join
    * ([[graft.operators.Joins.asofJoin]] is the read side). */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tss"), col("event_id"))
    events.select(col("user_id"), col("event_id"), epochSec.as("tss"),
        col("value"))
      .withColumn("valid_from", col("tss"))
      .withColumn("valid_to", lead(col("tss"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "event_id", "value", "valid_from", "valid_to",
        "is_current")
  }

  /** Gap-based sessionization: a new session starts after `gapSeconds` of
    * user inactivity. One shuffle on user_id; at scale this is the classic
    * sessionize-by-key window (`session_window` in streaming mode). Returns
    * per-user session counts summarized to a single row. */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tss"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), epochSec.as("tss"))
      .withColumn("prev", lag(col("tss"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("tss") - col("prev") > gapSeconds, 1L)
          .otherwise(0L))
    flagged.groupBy("user_id").agg(sum("new_session").as("sessions"))
      .agg(
        count(lit(1)).as("n_users"),
        sum("sessions").as("total_sessions"),
        round(avg(col("sessions").cast("double")), 6).as("avg_sessions"),
        max("sessions").as("max_sessions"))
  }

  /** Structured Streaming form of [[hourlyAgg]]: watermarked tumbling
    * window over a genuine TimestampType `ts` (streaming sources emit real
    * timestamps; only the driver's parquet snapshot is nanos). Output mode
    * "update"/"append" chosen by the caller's sink. */
  def streamingHourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding (overlapping) windows — the streaming twin of
    * [[rollingWindowStats]]: each event lands in slide/length overlapping
    * buckets, so per-window state stays bounded and eviction follows the
    * watermark. Works identically as a batch aggregation (same `window`
    * expression). */
  def streamingSlidingCounts(events: DataFrame, length: String = "1 hour",
                             slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), length, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Streaming sessionization with `session_window` — the streaming form of
    * [[sessionStats]]: sessions close after `gap` of inactivity, emitted in
    * append mode once the watermark passes the session end. State is
    * per-key session state in the state store — the 100 TB path shards it
    * by user_id across executors. */
  def streamingSessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Arbitrary stateful streaming with `flatMapGroupsWithState`: running
    * per-user event totals that survive across micro-batches (the custom
    * per-key state-store path — sharded by key across executors at scale;
    * the building block for streaming dedup, running budgets, or
    * incremental graph degree maintenance). */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          Iterator((user, total))
      }
      .toDF("user_id", "total_events")
  }

  /** Streaming heavy hitters with BOUNDED state: one Misra–Gries summary
    * of size ≤ `m` per group key, maintained in flatMapGroupsWithState and
    * re-emitted each micro-batch. The MG guarantee survives streaming:
    * any item with true frequency > N/(m+1) is in the summary, and each
    * kept counter undercounts by at most the total decrement — so the
    * state per key is O(m) FOREVER, the property a counting groupBy lacks
    * on an unbounded key-value stream. Emits (group, item, count_lb,
    * n_seen) rows; exact counts for the survivors come from a second
    * (filtered, tiny) pass in batch land if needed.
    *
    * Determinism: items are folded in batch-iterator order and ties in the
    * decrement evict deterministically (smallest count, then item id), so
    * a MemoryStream replay is reproducible. */
  def streamingHeavyHitters(events: DataFrame, m: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("user_id").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Map[Long, Long]),
        (String, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, batch: Iterator[(String, Long)],
         state: GroupState[(Long, Map[Long, Long])]) =>
          var (nSeen, counters) = state.getOption.getOrElse((0L, Map.empty[Long, Long]))
          batch.foreach { case (_, item) =>
            nSeen += 1
            counters.get(item) match {
              case Some(c) => counters = counters.updated(item, c + 1)
              case None if counters.size < m =>
                counters = counters.updated(item, 1L)
              case None => // decrement-all; drop zeros (classic MG step)
                counters = counters.view.mapValues(_ - 1).filter(_._2 > 0).toMap
            }
          }
          state.update((nSeen, counters))
          counters.toSeq.sortBy { case (item, c) => (-c, item) }.iterator
            .map { case (item, c) => (etype, item, c, nSeen) }
      }
      .toDF("event_type", "user_id", "count_lb", "n_seen")
  }

  /** Streaming micro-batch graph upsert (S1/S3 incrementally): interpret
    * events as node arrivals and fold each micro-batch into a node table via
    * foreachBatch-style dedup — MERGE semantics: existing rows win, new ids
    * are appended. Priority-tagged min_by keeps the merge deterministic
    * regardless of partition order (unlike `first()`). Unit-testable
    * without a streaming query. */
  def upsertBatch(existing: DataFrame, batch: DataFrame): DataFrame =
    existing.withColumn("prio", lit(0))
      .unionByName(batch.withColumn("prio", lit(1)), allowMissingColumns = true)
      .groupBy("nodeId")
      .agg(min(struct(col("prio"), col("label"), col("name"))).as("m"))
      .select(col("nodeId"), col("m.label").as("label"), col("m.name").as("name"))

  /** Edge micro-batch upsert (S3 incrementally): MERGE semantics on the
    * (relType, src, dst) identity — idempotent under replays, endpoint
    * existence enforced against the current node table exactly like the
    * reference's MATCH-before-MERGE load (stark_neo4j_loading.py:51-53). */
  def upsertEdgeBatch(existing: DataFrame, batch: DataFrame,
                      nodes: DataFrame): DataFrame = {
    val ids = nodes.select(col("nodeId"))
    existing.unionByName(batch)
      .dropDuplicates("relType", "src", "dst")
      .join(ids.withColumnRenamed("nodeId", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("nodeId", "dst"), Seq("dst"), "left_semi")
  }

  /** Stream-static enrichment: attach dimension attributes to a stream by
    * key. The static side broadcasts into every micro-batch — the pattern
    * for decorating a high-volume event stream with a small dimension
    * table without ever shuffling the stream itself. Works identically on
    * batch frames (it is a plain broadcast left join). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join — the streaming form of
    * [[Joins.rangeJoinBinned]]'s semantics: each click joins the errors of
    * the same user in the trailing `windowSeconds`
    * (`e_ts <= c_ts < e_ts + window`, matching the batch half-open
    * contract). Both sides are watermarked and the join condition bounds
    * event-time distance, so Spark evicts join state once rows can no
    * longer match — bounded state at any stream volume.
    *
    * Input schemas: clicks (user_id, ts, event_id),
    * errors (user_id, ts, event_id); `ts` is a timestamp column.
    */
  def streamClickAttribution(clicks: DataFrame, errors: DataFrame,
                             windowSeconds: Long,
                             watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val e = errors.select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermark)
    c.join(e, col("user_id") === col("e_user") &&
        col("c_ts") >= col("e_ts") &&
        col("c_ts") < col("e_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("click_id"), col("error_id"))
  }

  /** Weekly cohort retention (the growth-dashboard matrix): users grouped
    * by first-activity week, then distinct active users per (cohort,
    * week-offset) cell with the cohort size alongside. Weeks are integer
    * 7-day buckets from `epochDay` (days since Unix epoch) computed with
    * pure Long division over the nano timestamps — calendar week
    * conventions (ISO vs Sunday-start) vary by engine, integer buckets do
    * not.
    *
    * Scale shape: the per-(user, week) distinct is the only shuffle that
    * sees event volume (map-side combinable); everything after runs on
    * |users| and |cohorts| rows, and the cohort-size table broadcasts.
    *
    * Input: `ts` as int64 NANOSECONDS (the driver parquet under
    * `nanosAsLong`). */
  def cohortRetention(events: DataFrame, epochDay: Long = 19723L): DataFrame = {
    val week = expr(s"((ts div 86400000000000) - $epochDay) div 7")
    val uw = events.select(col("user_id"), week.as("week")).distinct()
    val cohort = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Per-key EWMA (α = 1/2) over each user's time-ordered event values,
    * in integer micro-units: y₁ = x₁, yₜ = ⌊(xₜ + yₜ₋₁)/2⌋ via one
    * arithmetic shift — floor division for ANY sign, so the fold is
    * hash-exact cross-engine with no float accumulation. Recursion-free:
    * ONE keyed collect + a codegen'd `aggregate` fold per key, the
    * standard Spark shape for order-dependent per-key state (a window
    * can't express yₜ(yₜ₋₁); a driver loop wouldn't distribute). Sequence
    * order is total: (ts, event_id) with the unique id as tiebreak.
    *
    * Scale: per-key sequences are activity-bounded (the same contract as
    * sessionization); a key whose history can't fit one task belongs in
    * [[streamingHourlyCounts]]-style incremental state, not a batch fold. */
  def ewmaByUser(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("value")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), size(col("es")).as("n_events"),
        transform(col("es"),
          e => round(e.getField("value") * 1000000L, 0).cast("long"))
          .as("xs"))
      .select(col("user_id"), col("n_events"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1),
          (acc, x) => shiftright(acc + x, 1)).as("ewma_micro"))

  /** Rolling-median/MAD anomaly detection per user: each event's value is
    * compared against the EXACT median of its ±3-row centered window (in
    * time order, unique event_id tiebreak) and flagged when
    * |x − median| > 4·MAD, all in integer micro-units. Median/MAD use the
    * LOWER-middle element of the sorted window (no interpolated average) —
    * fully integer, so the whole rule is hash-exact cross-engine; the
    * robust-statistics analog of [[iqrOutliers]], local instead of global.
    *
    * Scale: one keyed window (shuffle on user_id); the ±3 frame keeps the
    * per-row state O(1) regardless of key history length — unlike the
    * per-key collect folds, this never materializes a user's whole
    * sequence. */
  def rollingMadAnomalies(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-3, 3)
    events
      .withColumn("v", round(col("value") * 1000000L, 0).cast("long"))
      .withColumn("vals", collect_list(col("v")).over(w))
      .withColumn("med",
        expr("element_at(array_sort(vals), cast((size(vals) + 1) div 2 as int))"))
      .withColumn("dev", abs(col("v") - col("med")))
      .withColumn("mad",
        expr("element_at(array_sort(transform(vals, x -> abs(x - med)))," +
          " cast((size(vals) + 1) div 2 as int))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("dev") > col("mad") * 4, 1L).otherwise(0L))
          .as("n_anomalies"),
        sum(col("dev")).as("sum_dev"),
        max(col("mad")).as("max_mad"))
  }

  /** CUSUM changepoint detection per user (Page 1954), fully integer and
    * recursion-free. The textbook statistic is the recurrence
    * S₀ = 0, Sᵢ = max(0, Sᵢ₋₁ + yᵢ) with drift yᵢ = xᵢ − target − slack —
    * but it has an EXACT window-function closed form,
    * Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ) over the drift prefix sums P, so both
    * engines evaluate it with two ordered window aggregates and no per-key
    * fold. Per-user self-calibration keeps the rule parameter-free and
    * integer: target = ⌊Σx/n⌋ micro (values are non-negative, so floor vs
    * truncate cannot diverge), slack = target div 4 (alarms only on
    * sustained > 1.25× mean), threshold h = 2·target.
    *
    * Scale: one keyed shuffle; every window is over the same (user_id) →
    * (ts, event_id) ordering so Spark runs them in a single sort pass.
    * State per row is O(1) — unlike the collect-fold EWMA, this never
    * materializes a key's history. */
  def cusumAlarms(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val upto = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("x", round(col("value") * 1000000L, 0).cast("long"))
      .withColumn("target", expr("sum(x) over (partition by user_id)" +
        " div count(1) over (partition by user_id)"))
      .withColumn("y", col("x") - col("target") - expr("target div 4"))
      .withColumn("p", sum(col("y")).over(upto))
      .withColumn("s", col("p") - least(min(col("p")).over(upto), lit(0L)))
      .withColumn("alarm", col("s") > col("target") * 2)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
        max(col("s")).as("max_cusum"),
        min(when(col("alarm"), col("event_id"))).as("first_alarm_id"))
  }

  /** Interval-union coverage per user: every event opens a fixed-length
    * activity window, overlapping (or touching — half-open) windows
    * merge, and the rollup reports merged-interval count, total covered
    * time, and the longest run. The classic sweep made relational: a
    * window break happens exactly where a start exceeds the running max
    * of all PRIOR ends, breaks prefix-sum into island ids, islands
    * aggregate to [min start, max end]. The coverage/uptime statistic
    * (and the dedup step before billing time-based usage) — continuous
    * time's answer to the integer gaps-and-islands profile.
    *
    * Scale: two keyed windows sharing one (user, start) sort + two hash
    * aggregates; state per row is O(1). */
  def coverageIntervals(events: DataFrame, lengthUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    val ints = events
      .select(col("user_id"), col("event_id"), col("ts").as("s"),
        (col("ts") + lengthUs).as("e"))
      .withColumn("pmax",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    ints.groupBy("user_id", "island")
      .agg(min("s").as("i_s"), max("e").as("i_e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum(expr("i_e - i_s")).as("covered_us"),
        max(expr("i_e - i_s")).as("max_interval_us"))
  }

  /** Seasonality strength per event type: one-way eta² of value against
    * the hour-of-day phase — the variance fraction the daily cycle
    * explains (η² → 1: strongly diurnal; → 0: phase tells nothing). The
    * sufficient statistics (per-phase n, Σx, plus per-type Σx²) are exact
    * Longs in CENTI units (micro squares would overflow); the final
    * η² = (Σ S_g²/n_g − S²/n) / (Σx² − S²/n) runs on the per-type
    * 24-row table as the verbatim-mirrored DOUBLE expression rounded to
    * 6, NULLIF-guarded for constant series ([[graft.operators.Profile.corrPairs]]'s
    * convention).
    *
    * Scale: one map-side-combinable aggregate on (type, phase) — 24 rows
    * per type forever — then a 24-row rollup. */
  def seasonalityEta2(events: DataFrame, tsCol: String): DataFrame = {
    val phases = events
      .withColumn("x", round(col("value") * 100L, 0).cast("long"))
      .withColumn("phase", expr(s"($tsCol div 3600000000) % 24"))
      .groupBy("event_type", "phase")
      .agg(count(lit(1)).as("n_g"), sum("x").as("s_g"),
        sum(expr("x * x")).as("ss_g"))
    phases.groupBy("event_type")
      .agg(sum("n_g").as("n"), sum("s_g").as("s"), sum("ss_g").as("ss"),
        count(lit(1)).as("n_phases"),
        // the one FLOAT sum folds in ascending-phase order (a parallel
        // double sum would be order-nondeterministic and break the hash)
        sort_array(collect_list(struct(col("phase"), col("s_g"),
          col("n_g")))).as("gs"))
      .withColumn("sb", aggregate(col("gs"), lit(0.0d),
        (acc, g) => acc + g.getField("s_g").cast("double")
          * g.getField("s_g").cast("double")
          / g.getField("n_g").cast("double")))
      .select(col("event_type"), col("n"), col("n_phases"),
        expr("round((sb - cast(s as double) * cast(s as double)" +
          " / cast(n as double))" +
          " / nullif(cast(ss as double) - cast(s as double)" +
          " * cast(s as double) / cast(n as double), 0), 6)")
          .as("eta2"))
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences: transitions counted within each user's time-ordered
    * stream (never across users), then pooled into the global matrix
    * with row-conditional probabilities in integer micro-units
    * (Σ p_micro per row ≤ 10⁶ with the deficit being floor loss). The
    * session-behavior model behind next-event prediction and anomaly
    * scoring — and the matrix is exactly the sufficient statistic a
    * Markov-chain generator consumes.
    *
    * Scale: one keyed sort-window for the lag, one hash aggregate on the
    * (prev, cur) pair — type-pair cardinality, tiny at any corpus size;
    * the row totals join back via broadcast. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum("n").as("row_n"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("(n * 1000000) div row_n").as("p_micro"))
  }

  /** Holt double exponential smoothing (level + trend, α = β = 1/2) per
    * key: the forecasting step up from [[ewmaByUser]] when series drift.
    * Two order-dependent accumulators ride ONE keyed fold by packing
    * (level, trend) into a single Long — s = level·2³² + (trend + 2³¹) —
    * because neither engine's fold primitive takes a composite initial
    * value (Spark's `aggregate` seeds from the first element, DuckDB's
    * `list_reduce` has no init at all). All recurrence arithmetic uses
    * `>>` (ARITHMETIC shift — floor semantics, verified identical in
    * both engines on negatives, unlike their `/` vs `//`):
    * l' = max(0, (x + l + t) >> 1), t' = (t + l' − l) >> 1; the level
    * clamp keeps the packed form positive (values are non-negative, a
    * negative level forecast is meaningless). Operating range:
    * level < 2³¹ micro (≈ values < 2147), |trend| < 2³¹ micro.
    *
    * Scale: same contract as [[ewmaByUser]] — one keyed collect + a
    * codegen'd fold; activity-bounded key histories. */
  def holtByUser(events: DataFrame): DataFrame = {
    val P32 = 4294967296L
    val H31 = 2147483648L
    events
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("value")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), size(col("es")).as("n_events"),
        transform(col("es"),
          e => round(e.getField("value") * 1000000L, 0).cast("long"))
          .as("xs"))
      .select(col("user_id"), col("n_events"),
        aggregate(
          slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
          element_at(col("xs"), 1) * P32 + H31,
          (acc, x) => {
            val l = shiftright(acc, 32)
            val t = acc - shiftleft(l, 32) - H31
            val l2 = greatest(shiftright(x + l + t, 1), lit(0L))
            val t2 = shiftright(t + l2 - l, 1)
            shiftleft(l2, 32) + t2 + H31
          }).as("s"))
      .select(col("user_id"), col("n_events"),
        shiftright(col("s"), 32).as("level_micro"),
        (col("s") - shiftleft(shiftright(col("s"), 32), 32) - H31)
          .as("trend_micro"))
      .withColumn("forecast_micro", col("level_micro") + col("trend_micro"))
  }

  /** Seasonal-naive forecast error per user (the MASE shape, Hyndman &
    * Koehler 2006): the season-`s` naive forecast x̂ₜ = xₜ₋ₛ is scored
    * against the random-walk baseline x̂ₜ = xₜ₋₁, both as integer
    * micro-unit absolute-error sums over the SAME scoring rows (t > s, so
    * numerator and denominator see one common support — the standard
    * in-sample MASE denominator restricted to where the seasonal forecast
    * exists). mase_micro < 10⁶ ⟺ the seasonal pattern beats a random
    * walk — THE go/no-go gate before fitting anything seasonal.
    *
    * Scale: one keyed sort-window pass (both lags share the frame), one
    * aggregate; O(1) per-row state. */
  def seasonalNaiveError(events: DataFrame, season: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("x", round(col("value") * 1000000L, 0).cast("long"))
      .withColumn("xs", lag(col("x"), season).over(w))
      .withColumn("x1", lag(col("x"), 1).over(w))
      .where(col("xs").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("x") - col("xs"))).as("mae_seasonal"),
        sum(abs(col("x") - col("x1"))).as("mae_naive"))
      .select(col("user_id"), col("n_scored"),
        col("mae_seasonal"), col("mae_naive"),
        when(col("mae_naive") === 0L, lit(null).cast("long"))
          .otherwise(expr("(mae_seasonal * 1000000) div mae_naive"))
          .as("mase_micro"))
  }

  /** Lag-1/lag-2 raw autocorrelation per user in integer micro-units:
    * acf_k = (Σ xᵢ·xᵢ₊ₖ · 10⁶) div Σ xᵢ² over the time-ordered sequence
    * (uncentered — the mean-removal variant needs a float mean; the raw
    * form stays hash-exact and ranks periodicity the same way). Values are
    * held in CENTI units so the cross-product sum keeps the final ×10⁶
    * inside Long: the operating range is per-key Σx² < 9.2·10¹² centi²,
    * i.e. ~3.8M events/key at the events table's max |value| ≈ 490 —
    * beyond that, drop to deci units in both engines together.
    *
    * Scale: one keyed sort-window pass (lead(1)/lead(2) share the frame),
    * one map-side-combinable aggregate. */
  def autocorrByUser(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("x", round(col("value") * 100L, 0).cast("long"))
      .withColumn("x1", lead(col("x"), 1).over(w))
      .withColumn("x2", lead(col("x"), 2).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("x * x")).as("den"),
        sum(expr("x * x1")).as("num1"),
        sum(expr("x * x2")).as("num2"))
      .select(col("user_id"), col("n_events"),
        expr("(coalesce(num1, 0) * 1000000) div den").as("acf1_micro"),
        expr("(coalesce(num2, 0) * 1000000) div den").as("acf2_micro"))
  }
}
