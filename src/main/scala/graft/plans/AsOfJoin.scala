package graft.plans

import org.apache.spark.sql.DataFrame

/** Public facade for the native as-of join — the catalog's one
  * whole-operator Catalyst extension (logical node + planner strategy +
  * physical sort-merge exec, see
  * [[org.apache.spark.sql.graftbridge.AsOfJoinExec]]). Same semantics as
  * the compositional [[graft.operators.Joins.asofJoin]] (inclusive
  * at-or-before, int64 key/ts, pre-deduped right side), but planned as a
  * single streaming merge with O(1) per-partition state instead of
  * union+window.
  *
  * `values` are the right-side columns attached to each left row
  * (nullable on no match); their names must not collide with left
  * columns.
  */
object AsOfJoin {
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           values: Seq[String]): DataFrame =
    org.apache.spark.sql.graftbridge.AsOfJoinSupport
      .asof(left, right, key, ts, values)
}
