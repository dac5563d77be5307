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

  /** Skew-safe equi-join: the big side carries a deterministic salt in
    * [0, salts), the small side is replicated once per salt value, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `salts` reducers instead of serializing into one. The result set is
    * EXACTLY the plain join (the salt is internal and dropped); the salt
    * function is hash-of-all-big-columns, so any value works — it only
    * spreads rows, it never routes them. The explicit form of what AQE's
    * skew split does at runtime, for when AQE can't help: pre-shuffled
    * bucketed inputs, stream-static joins, or a replicated-side size
    * known small enough that `salts`× replication beats a skew stall. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val sb = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val ss = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    sb.join(ss, Seq(key, "__salt")).drop("__salt")
  }
}
