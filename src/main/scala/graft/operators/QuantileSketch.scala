package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One serialized sketch item: `level = -1` rows are weight-1 buffer
  * items; `level = h ≥ 0` rows belong to the single sorted run of exactly
  * `k` values at that level (weight 2^h). `n`/`err` are repeated on every
  * row of a state (tiny — a state is O(k·log(n/k)) rows total). */
final case class MrlRow(group: String, pid: Int, n: Long, err: Long,
                        level: Int, pos: Int, value: Long)

/** One quantile estimate with its provable rank window. */
final case class MrlEst(group: String, q: String, r: Long, err_bound: Long,
                        est: Long, n: Long)

/** MRL/KLL-shaped mergeable quantile sketch — the missing member of the
  * incremental-state family: [[Incremental.histState]]'s fixed-bin
  * histogram has an exact merge law but static edges, so a skewed or
  * unbounded value domain wastes its resolution; this sketch adapts to
  * ANY integer value distribution with O(k·log(n/k)) state.
  *
  * Structure (Munro–Paterson / Manku–Rajagopalan–Lindsay): a weight-1
  * buffer of < k items plus at most one sorted run of exactly k items per
  * level h, carrying weight 2^h. A full buffer sorts into a level-0 run;
  * two runs at level h merge-sort and keep alternate elements (offset
  * alternating per level) to form one run at h+1 — binary-counter
  * carries, so insert is amortized O(log k) and the state never exceeds
  * k·(log₂(n/k)+2) values.
  *
  * '''Provable error ledger, not a probabilistic bound.''' Each
  * compaction at level h changes the weighted count of items ≤ v, for
  * EVERY v, by at most 2^h (the classic collapse lemma: dropping
  * alternate elements of a merged pair of weight-2^h runs moves any
  * prefix weight by at most one element's weight). The sketch adds
  * exactly 2^h to `err` per compaction, so at all times
  * |estRank(v) − trueRank(v)| ≤ err for every v — a deterministic
  * worst-case invariant that survives arbitrary merges (ledgers add).
  * The driver oracle leans on it: [[mrlQuantileReport]] joins each
  * estimate back to the corpus and checks the TRUE rank lands inside
  * [r − err, r − 1 + err] — a violation fails the hash gate.
  *
  * '''Merge = the 100 TB story.''' Raw values never shuffle: partials
  * build per input partition (one pass, no shuffle), only O(k log n)
  * state rows move, and group states merge again into rollups
  * ([[mrlMergeStates]]) without ever re-touching data — same contract as
  * [[Incremental.mergeStates]] but for quantiles on skewed domains.
  * Determinism: partials fold rows in partition order and merges fold
  * partials in ascending pid (then group) order, so a fixed input
  * partitioning reproduces bit-identical states run to run.
  *
  * Reference anchor: the reference has no sketch layer (Neo4j computes
  * exact aggregates, `retrieval/retriever.py:25`); this extends the
  * engine's mergeable-state family per SURVEY §2's pipeline-operator
  * mandate.
  */
object QuantileSketch {

  /** Mutable task-local sketch; never serialized by Spark — state crosses
    * task boundaries only as [[MrlRow]]s. */
  private[graft] final class MrlSketch(val k: Int) {
    require(k >= 2 && k % 2 == 0, s"k must be even and ≥ 2, got $k")
    var n = 0L
    var err = 0L
    private[graft] val buf = new ArrayBuffer[Long](k)
    // levels(h): sorted runs of exactly k values, weight 2^h; at rest
    // (post-carry) each level holds at most one run
    private[graft] val levels = ArrayBuffer.empty[ArrayBuffer[Array[Long]]]
    private val parity = ArrayBuffer.empty[Int]

    def insert(v: Long): Unit = { n += 1; push(v) }

    private def push(v: Long): Unit = {
      buf += v
      if (buf.length >= k) {
        val run = buf.toArray
        java.util.Arrays.sort(run)
        buf.clear()
        promote(run, 0)
      }
    }

    private def promote(run0: Array[Long], h0: Int): Unit = {
      var run = run0
      var h = h0
      var carrying = true
      while (carrying) {
        // levels and parity are extended independently: rebuild() grows
        // `levels` directly (parity is private and intentionally does not
        // round-trip through rows), so a rebuilt sketch used as an insert
        // or merge DESTINATION arrives with levels longer than parity
        while (levels.length <= h) levels += ArrayBuffer.empty
        while (parity.length <= h) parity += 0
        val slot = levels(h)
        if (slot.isEmpty) { slot += run; carrying = false }
        else {
          val other = slot.remove(slot.length - 1)
          val merged = new Array[Long](2 * k)
          var i = 0; var j = 0; var o = 0
          while (i < k && j < k) {
            if (other(i) <= run(j)) { merged(o) = other(i); i += 1 }
            else { merged(o) = run(j); j += 1 }
            o += 1
          }
          while (i < k) { merged(o) = other(i); i += 1; o += 1 }
          while (j < k) { merged(o) = run(j); j += 1; o += 1 }
          val off = parity(h)
          parity(h) = 1 - off
          val kept = new Array[Long](k)
          var p = 0
          while (p < k) { kept(p) = merged(2 * p + off); p += 1 }
          err += 1L << h
          run = kept
          h += 1
        }
      }
    }

    /** Fold another sketch in: ledgers add, weight-1 items re-buffer,
      * runs carry at their own level (ascending, like binary addition). */
    def mergeFrom(o: MrlSketch): Unit = {
      require(o.k == k, s"mergeFrom across k: $k vs ${o.k}")
      n += o.n
      err += o.err
      o.buf.foreach(push)
      var h = 0
      while (h < o.levels.length) {
        o.levels(h).foreach(run => promote(run.clone(), h))
        h += 1
      }
    }

    /** (value, weight) pairs sorted by value, equal values coalesced. */
    def weighted(): Array[(Long, Long)] = {
      val all = ArrayBuffer.empty[(Long, Long)]
      buf.foreach(v => all += ((v, 1L)))
      var h = 0
      while (h < levels.length) {
        levels(h).foreach(_.foreach(v => all += ((v, 1L << h))))
        h += 1
      }
      all.sortBy(_._1).foldLeft(ArrayBuffer.empty[(Long, Long)]) {
        case (acc, (v, w)) =>
          if (acc.nonEmpty && acc.last._1 == v)
            acc(acc.length - 1) = (v, acc.last._2 + w)
          else acc += ((v, w))
          acc
      }.toArray
    }

    /** Smallest sketch value whose cumulative weight reaches rank `r`
      * (1 ≤ r ≤ n). Guarantee: true #{x ≤ est} ≥ r − err and true
      * #{x < est} ≤ r − 1 + err. */
    def query(r: Long): Long = {
      require(n > 0, "query on an empty sketch")
      val ws = weighted()
      var cum = 0L
      var i = 0
      while (i < ws.length) {
        cum += ws(i)._2
        if (cum >= r) return ws(i)._1
        i += 1
      }
      ws.last._1
    }

    /** Canonical row form: buffer items serialize SORTED (the parity
      * counters intentionally do not round-trip — dropping them never
      * weakens the err invariant, and rebuilds reset them identically so
      * end-to-end results stay deterministic). */
    def toRows(group: String, pid: Int): Iterator[MrlRow] = {
      val b = buf.sorted.iterator.zipWithIndex
        .map { case (v, i) => MrlRow(group, pid, n, err, -1, i, v) }
      val r = levels.iterator.zipWithIndex.flatMap { case (runs, h) =>
        runs.iterator.flatMap(_.iterator.zipWithIndex.map {
          case (v, i) => MrlRow(group, pid, n, err, h, i, v)
        })
      }
      b ++ r
    }
  }

  /** Rebuild one sketch from the rows of a single (group, pid) state. */
  private[graft] def rebuild(rows: Array[MrlRow], k: Int): MrlSketch = {
    val s = new MrlSketch(k)
    s.n = rows.head.n
    s.err = rows.head.err
    rows.filter(_.level == -1).sortBy(_.pos).foreach(r => s.buf += r.value)
    rows.filter(_.level >= 0).groupBy(_.level).toArray.sortBy(_._1)
      .foreach { case (h, rs) =>
        require(rs.length == k, s"level $h run has ${rs.length} ≠ k=$k rows")
        while (s.levels.length <= h) s.levels += ArrayBuffer.empty
        s.levels(h) += rs.sortBy(_.pos).map(_.value)
      }
    s
  }

  /** Phase 1: one shuffle-free pass building a per-(partition, group)
    * sketch; emits only state rows. Group cardinality should be modest
    * (each task holds every group's sketch — pre-repartition by group
    * first if it is not). */
  def mrlPartials(items: DataFrame, groupCol: String, valueCol: String,
                  k: Int): Dataset[MrlRow] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col(groupCol).cast("string"), col(valueCol).cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val m = scala.collection.mutable.LinkedHashMap.empty[String, MrlSketch]
        it.foreach { case (g, v) =>
          m.getOrElseUpdate(g, new MrlSketch(k)).insert(v)
        }
        m.iterator.flatMap { case (g, s) => s.toRows(g, pid) }
      }
  }

  /** Phases 1+2: per-group final states. Only sketch rows shuffle;
    * partials fold in ascending pid order (deterministic for a fixed
    * input partitioning). */
  def mrlGroupStates(items: DataFrame, groupCol: String, valueCol: String,
                     k: Int): Dataset[MrlRow] = {
    val spark = items.sparkSession
    import spark.implicits._
    mrlPartials(items, groupCol, valueCol, k)
      .groupByKey(_.group)
      .flatMapGroups { (g: String, rows: Iterator[MrlRow]) =>
        val acc = new MrlSketch(k)
        rows.toArray.groupBy(_.pid).toArray.sortBy(_._1)
          .foreach { case (_, rs) => acc.mergeFrom(rebuild(rs, k)) }
        acc.toRows(g, -1)
      }
  }

  /** Roll any set of group states up into one named sketch — states
    * merge without re-touching data, folded in group order. */
  def mrlMergeStates(states: Dataset[MrlRow], k: Int,
                     asGroup: String): Dataset[MrlRow] = {
    val spark = states.sparkSession
    import spark.implicits._
    states.groupByKey(_ => asGroup)
      .flatMapGroups { (g: String, rows: Iterator[MrlRow]) =>
        val acc = new MrlSketch(k)
        rows.toArray.groupBy(r => (r.group, r.pid)).toArray.sortBy(_._1)
          .foreach { case (_, rs) => acc.mergeFrom(rebuild(rs, k)) }
        acc.toRows(g, -1)
      }
  }

  /** Quantile estimates per group: target rank r = ⌈pct·n/100⌉ (floored
    * at 1), with the sketch's own err ledger as the rank window. */
  def mrlEstimates(states: Dataset[MrlRow], k: Int,
                   qs: Seq[(String, Int)]): Dataset[MrlEst] = {
    val spark = states.sparkSession
    import spark.implicits._
    states.groupByKey(_.group)
      .flatMapGroups { (g: String, rows: Iterator[MrlRow]) =>
        val s = rebuild(rows.toArray, k)
        qs.iterator.map { case (name, pct) =>
          val r = math.max(1L, (pct * s.n + 99L) / 100L)
          MrlEst(g, name, r, s.err, s.query(r), s.n)
        }
      }
  }

  /** End-to-end driver surface: per-group sketches plus an `__all__`
    * rollup merged FROM THE STATES, then every estimate verified against
    * its exact corpus rank in one extra scan — output is
    * (grp, q, n, ok) where `ok` certifies trueRank(est) ∈
    * [r − err, r − 1 + err]. `ok` is provably true for a correct sketch
    * (the compaction lemma), so the DuckDB oracle can assert it as a
    * constant while the exact `n` pins the group partition — an
    * implementation bug that breaks the ledger flips `ok` and fails the
    * hash gate. The verification scan broadcasts the handful of estimate
    * rows and fans each corpus row into (own group, __all__): one read,
    * one tiny aggregate. */
  def mrlQuantileReport(items: DataFrame, groupCol: String, valueCol: String,
                        k: Int, qs: Seq[(String, Int)]): DataFrame = {
    val spark = items.sparkSession
    // "__all__" is the rollup sentinel; a corpus group with that literal
    // name would union its state with the rollup's under one key and
    // double-count in the verification fan. Fail fast inside the existing
    // scan (codegen'd, no extra pass) instead of corrupting both rows.
    val raw = items.select(
      when(col(groupCol).cast("string") === lit("__all__"),
        raise_error(lit(
          s"group column '$groupCol' contains '__all__', which collides " +
            "with the rollup sentinel")))
        .otherwise(col(groupCol).cast("string")).as("grp"),
      col(valueCol).cast("long").as("v"))
    val states = mrlGroupStates(raw, "grp", "v", k)
    val withAll = states.unionAll(mrlMergeStates(states, k, "__all__"))
    val ests = mrlEstimates(withAll, k, qs).toDF()
    val fan = raw.select(
      explode(array(col("grp"), lit("__all__"))).as("grp"), col("v"))
    fan.join(broadcast(ests.withColumnRenamed("group", "grp")), Seq("grp"))
      .groupBy(col("grp"), col("q"), col("r"), col("err_bound"),
        col("est"), col("n"))
      .agg(
        sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("c_le"),
        sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("c_lt"))
      .select(col("grp"), col("q"), col("n"),
        (col("c_le") >= col("r") - col("err_bound") &&
          col("c_lt") <= col("r") - 1L + col("err_bound")).as("ok"))
      .orderBy("grp", "q")
  }
}
