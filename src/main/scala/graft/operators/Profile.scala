package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time data profiling (ANALYZE-style): per-column row/null/distinct
  * counts and min/max, computed in ONE pass over the table — all per-column
  * aggregates live in a single aggregate node (Catalyst plans the multiple
  * exact count-distincts via Expand), and the wide result row is unpivoted
  * to one row per column with a single explode. min/max render as strings
  * so heterogeneous column types share one output schema.
  */
object Profile {

  /** Hierarchical ROLLUP profile over two dimensions: per-(c1, c2) rows,
    * per-c1 subtotals, and the grand total in ONE pass (Spark plans rollup
    * as a single Expand + aggregate — no re-scan per level). `gid` is the
    * standard grouping bitmask (c1 = MSB), 0 = leaf, 3 = grand total. */
  def rollupProfile(df: DataFrame, c1: String, c2: String,
                    measure: String): DataFrame =
    df.rollup(c1, c2)
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"),
        round(sum(measure), 2).as("sum_measure"))

  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nulls"),
      count_distinct(col(c)).as(s"__${c}_ndv"),
      min(col(c)).cast("string").as(s"__${c}_min"),
      max(col(c)).cast("string").as(s"__${c}_max"))) :+
      count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__${c}_nulls").as("n_nulls"),
        col(s"__${c}_ndv").as("n_distinct"),
        col(s"__${c}_min").as("min_val"),
        col(s"__${c}_max").as("max_val"))): _*)).as("p"))
      .select("p.*")
  }

  /** Declarative data-quality gate (the Deequ/Great-Expectations shape):
    * each rule is a name plus a VIOLATION-counting DataFrame; the report
    * is one row per rule with its violation count and pass flag — the
    * artifact a pipeline checks before promoting a batch. Rules run as
    * independent aggregates (each its own narrow scan or join), unioned
    * into one report; nothing is collected until the rule results, which
    * are one row each. */
  def checkReport(rules: Seq[(String, DataFrame)]): DataFrame =
    rules.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"),
          (col("n_violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
}
