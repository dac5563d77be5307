package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — partial aggregate STATE as data.
  *
  * The 100 TB pattern: never re-scan history. Each ingest batch (a day, an
  * hour, a partition) reduces to a per-key state row of the mergeable
  * tuple (count, sum, min, max); any rollup — day→month, shard→global,
  * yesterday+today — is a tiny merge of state tables, associative and
  * commutative by construction. `avg` and friends derive from the state
  * at read time; they are NOT stored (a stored avg can't merge).
  *
  * The merge law (state of union = merge of states) is proven on real
  * data by the `incr_agg_rollup` catalog entry: Spark computes through
  * daily partials + merge, the DuckDB oracle aggregates directly — the
  * hash gate accepts only if both paths agree exactly. Count/min/max are
  * order-insensitive; the double sum is reassociated by the merge, so
  * derived averages are rounded in query/oracle pairs like every other
  * float column.
  */
object Incremental {

  /** Reduce a batch to per-key aggregate state. */
  def aggState(df: DataFrame, keyCols: Seq[String],
               valCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(valCol).as("cnt"), sum(valCol).as("sum"),
      min(valCol).as("min"), max(valCol).as("max"))

  /** Merge any union of state tables into one (same key columns). */
  def mergeStates(states: DataFrame, keyCols: Seq[String]): DataFrame =
    states.groupBy(keyCols.map(col): _*).agg(
      sum("cnt").as("cnt"), sum("sum").as("sum"),
      min("min").as("min"), max("max").as("max"))

  /** Read-time finalization: derive the non-mergeable aggregates. */
  def finalize(state: DataFrame, roundTo: Int): DataFrame =
    state.select(
      state.columns.toSeq.filterNot(Set("cnt", "sum", "min", "max")).map(col) ++
        Seq(col("cnt"),
          round(col("sum").cast("double"), roundTo).as("sum"),
          round((col("sum") / col("cnt")).cast("double"), roundTo).as("avg"),
          round(col("min").cast("double"), roundTo).as("min"),
          round(col("max").cast("double"), roundTo).as("max")): _*)

  // ---- mergeable QUANTILE state: a fixed-bin integer histogram ----
  // count/sum/min/max merge trivially; percentiles don't — unless the
  // state is a histogram, whose merge law is element-wise Long addition
  // (exact, associative, commutative — same class as count). Bins are
  // fixed-width from 0 with the last bin open-ended (values clamp into
  // [0, bins-1]), so the bin function is a single floor-divide every
  // engine computes identically; p-th percentiles derive at READ time as
  // the first bin where 100·cum ≥ p·cnt (all-integer — no float ever
  // enters the state or the derivation).

  /** Reduce a batch to per-key histogram state: (cnt, hist[bins]). */
  def histState(df: DataFrame, keyCols: Seq[String], valCol: String,
                width: Int, bins: Int): DataFrame = {
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor(col(valCol) / width).cast("int")))
    df.withColumn("__bin", bin)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        array((0 until bins).map(b =>
          sum(when(col("__bin") === b, 1L).otherwise(0L))): _*).as("hist"))
  }

  /** Merge histogram states: element-wise sum (same key columns). */
  def mergeHistStates(states: DataFrame, keyCols: Seq[String],
                      bins: Int): DataFrame =
    states.groupBy(keyCols.map(col): _*).agg(
      sum("cnt").as("cnt"),
      array((0 until bins).map(b =>
        sum(element_at(col("hist"), b + 1))): _*).as("hist"))

  /** Read-time percentile derivation: for each requested integer percent
    * p, the 0-based first bin whose cumulative count covers p% (`p_bin`)
    * and its lower value bound (`p_lo = bin · width`, exact Long). The
    * O(bins²) prefix fold is over a 32-element literal-width array —
    * constant per row, all inside codegen. */
  def finalizeHist(state: DataFrame, width: Int, bins: Int,
                   percents: Seq[Int]): DataFrame = {
    val cums = transform(sequence(lit(1), lit(bins)),
      i => aggregate(slice(col("hist"), lit(1), i), lit(0L), (a, x) => a + x))
    val qCols = percents.flatMap { p =>
      val b = (lit(bins) - size(filter(cums,
        c => c * lit(100L) >= col("cnt") * lit(p)))).cast("int")
      Seq(b.as(s"p${p}_bin"),
        (b.cast("long") * width).as(s"p${p}_lo"))
    }
    state.select(
      state.columns.toSeq.filterNot(Set("cnt", "hist")).map(col) ++
        (col("cnt") +: qCols): _*)
  }
}
