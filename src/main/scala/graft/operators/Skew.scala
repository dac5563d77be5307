package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §7.4 item 6 — hub nodes like a popular
  * FieldOfStudy make 2-hop joins and count-distincts lopsided).
  *
  * AQE's skew-join splitting (on by default) handles the join side at
  * runtime; these cover the aggregation side, where a single hot grouping
  * key serializes into one reducer:
  *
  *  - [[saltedCountDistinct]]: two-phase distinct count — salt the key,
  *    partial-distinct per (key, salt), then merge. The hot key's work
  *    spreads over `salts` reducers; result is exact.
  *  - [[saltedSum]]: same two-phase shape for algebraic aggregates.
  */
object Skew {

  /** Exact count-distinct per group, resistant to hot groups: phase 1
    * dedups (group, value) within (group, salt) partitions, phase 2 sums
    * partial distinct counts — correct because value→salt is deterministic,
    * so a value never lands in two salt buckets of the same group. */
  def saltedCountDistinct(df: DataFrame, groupCol: String, valueCol: String,
                          salts: Int = 16): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(salts)))
    salted
      .groupBy(col(groupCol), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(col(groupCol))
      .agg(sum(col("__partial")).as("n_distinct"))
  }

  /** Two-phase sum with a random salt: spreads a hot group over `salts`
    * partial aggregates before the final (tiny) merge. For sums Spark's
    * map-side partial aggregation usually suffices; this is the explicit
    * form for extreme skew or when partial agg is defeated (e.g. high
    * per-key cardinality after an explode). */
  def saltedSum(df: DataFrame, groupCol: String, valueCol: Column,
                salts: Int = 16): DataFrame = {
    df
      .withColumn("__salt", pmod(spark_partition_id().cast("long"), lit(salts)))
      .groupBy(col(groupCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(groupCol))
      .agg(sum(col("__partial")).as("total"))
  }
}
