package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a large-scale event/training-data pipeline needs
  * but vanilla Spark SQL lacks as first-class operators: the as-of join
  * (each left row picks the most recent right row at-or-before it) and the
  * interval/range join (points matched to containing intervals).
  *
  * Both are built so the PHYSICAL plan is a plain shuffle-hash/sort join on
  * an equality key — the shapes that scale to 100 TB — rather than the
  * BroadcastNestedLoopJoin Spark produces for a raw inequality join
  * condition:
  *
  *  - [[asofJoin]] is ONE shuffle on the key + a per-key sort (union the two
  *    sides, carry the right payload forward with `last(ignoreNulls)`);
  *    there is no join node at all, so no O(left×right-per-key) blowup and
  *    AQE's skew handling applies to the single exchange.
  *  - [[rangeJoinBinned]] quantizes time into fixed-width bins: intervals
  *    explode to the bins they overlap, points map to exactly one bin, and
  *    the match becomes an equi-join on (key, bin) + a residual filter.
  *    Candidate pairs are bounded by bin co-occupancy instead of per-key
  *    cartesian products.
  */
object Joins {

  /** As-of join: for every left row, attach the payload of the latest right
    * row of the same `key` with `right.ts <= left.ts` (inclusive, matching
    * DuckDB/kdb ASOF semantics); left rows with no prior right row keep a
    * null payload.
    *
    * Implementation: tag and union both sides, then one window per key
    * ordered by (ts, side, payload) carrying the last non-null right
    * payload forward. Right rows order before left rows at equal ts (⇒
    * inclusive semantics); several right rows tied on (key, ts) resolve to
    * the greatest payload struct — deterministic, spec-pinned.
    *
    * @param left      probe side; must contain `key` and `ts`
    * @param right     reference side; must contain `key`, `ts`, payloadCols
    * @param payloadCols right columns to attach (emitted with their names;
    *                  they must not collide with left's column names, and —
    *                  because the equal-ts tiebreak sorts the payload
    *                  struct — must all be orderable types (no MapType))
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType =
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c)))
    require(!hasMapType(payloadType),
      s"asofJoin payload columns must be orderable (tiebreak sorts the " +
        s"payload struct); MapType found in ${payloadType.simpleString}")
    val l = left
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__side", lit(1))
    val r = right
      .select(Seq(col(key), col(ts)) :+
        struct(payloadCols.map(col): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // align schemas: left keeps all its columns, right contributes nulls
    val lAll = l.select(Seq(col(key), col(ts), col("__side"), col("__p")) ++
      leftCols.filterNot(c => c == key || c == ts).map(col): _*)
    val rAll = r.select(Seq(col(key), col(ts), col("__side"), col("__p")) ++
      leftCols.filterNot(c => c == key || c == ts)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAll.unionByName(rAll)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType          => true
      case s: StructType       => s.fields.exists(f => hasMapType(f.dataType))
      case a: ArrayType        => hasMapType(a.elementType)
      case _                   => false
    }
  }

  /** Interval/range join via fixed-width binning: match every point row to
    * every interval row of the same `key` with `start <= pt < end`
    * (half-open). Each interval is exploded to the bins it overlaps
    * (`sequence(start/w, (end-1)/w)`), each point lands in its single bin,
    * and the join is an equi-join on (key, bin) + residual range filter —
    * a point matches an overlapping interval in exactly one bin, so no
    * dedup is needed.
    *
    * `binWidth` tunes candidate blowup: bins-per-interval ≈
    * intervalLength/binWidth + 1, candidates-per-point ≈ intervals active
    * in its bin. Pick it near the typical interval length.
    *
    * All bound columns are integer epoch units (the events table is
    * integer nanos/seconds) — binning stays in exact Long arithmetic.
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame, key: String,
                      pt: String, start: String, end: String,
                      binWidth: Long): DataFrame = {
    // exact floor division (decimal, not double: epoch nanos exceed 2^53)
    def bin(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(binWidth)).cast("long")
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(start)), bin(col(end) - 1))))
    val p = points.withColumn("__bin", bin(col(pt)))
    p.join(iv, Seq(key, "__bin"))
      .where(col(pt) >= col(start) && col(pt) < col(end))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join via the same fixed-width binning:
    * match every pair of same-`key` intervals with
    * `startA < endB && startB < endA` (half-open overlap). Both sides
    * explode to their occupied bins and equi-join on (key, bin); since an
    * overlapping pair co-occupies EVERY bin their intersection touches,
    * each pair is kept only in the FIRST shared bin
    * (`bin == max(bin(startA), bin(startB))`) — emitted exactly once with
    * no distinct pass, the property that keeps the operator one equi-join
    * at any scale.
    *
    * Candidate volume per (key, bin) is activeA×activeB in that bin —
    * bounded by bin co-occupancy, never per-key cartesian; pick `binWidth`
    * near the typical interval length (the bins-per-interval /
    * candidates-per-bin tradeoff, as with [[rangeJoinBinned]]). Column
    * names must be disjoint across the two inputs apart from `key` (rename
    * before calling for self-joins). */
  def intervalJoinBinned(a: DataFrame, b: DataFrame, key: String,
                         startA: String, endA: String,
                         startB: String, endB: String,
                         binWidth: Long): DataFrame = {
    def bin(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(binWidth)).cast("long")
    val av = a.withColumn("__bin",
      explode(sequence(bin(col(startA)), bin(col(endA) - 1))))
    val bv = b.withColumn("__bin",
      explode(sequence(bin(col(startB)), bin(col(endB) - 1))))
    av.join(bv, Seq(key, "__bin"))
      .where(col(startA) < col(endB) && col(startB) < col(endA) &&
        col("__bin") === greatest(bin(col(startA)), bin(col(startB))))
      .drop("__bin")
  }
}
