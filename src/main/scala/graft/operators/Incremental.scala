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
}
