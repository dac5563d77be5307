package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-memory frequency estimation for unbounded key
  * universes (the streaming-safe complement of [[TextOps.topNgrams]]'s
  * exact heavy-hitter pass). depth×width counters; estimate = min over
  * rows; never underestimates, overestimates by at most ε·N with
  * probability 1−δ (ε = e/width, δ = e^−depth).
  *
  * The row hash is MD5-derived through DIGIT-ONLY extraction
  * (strip [a-f], take 6 digits, pad) — deliberately portable arithmetic
  * so the full sketch AND its estimates are bit-reproducible in ANSI SQL:
  * the driver oracle rebuilds the sketch and gets identical counters
  * (same trick family as the minhash lexicographic-min md5). At 100 TB
  * the build is one map-side-combinable groupBy over depth×|input| rows,
  * the sketch itself is depth×width rows (KBs — broadcastable), and
  * probes never touch the corpus.
  */
object Sketch {

  private def bucket(row: Int, keyCol: String, width: Int): String =
    s"cast(substr(concat(regexp_replace(md5(concat('$row|', $keyCol)), " +
      s"'[a-f]', ''), '000000'), 1, 6) as bigint) % $width"

  /** Build the sketch: one row per (row, bucket) with its collision count.
    * `items` carries one row per key OCCURRENCE in `keyCol`. */
  def countMin(items: DataFrame, keyCol: String, depth: Int,
               width: Int): DataFrame = {
    val lanes = (0 until depth).map(d =>
      expr(s"struct(cast($d as int) as row, ${bucket(d, keyCol, width)} as bucket)"))
    items.select(explode(array(lanes: _*)).as("lane"))
      .select(col("lane.row"), col("lane.bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`'s `keyCol` values against a built sketch:
    * min over the depth rows of the addressed counters. The sketch side is
    * broadcast — probing is joinless on the corpus. The join is LEFT so an
    * empty addressed cell (stored sparsely as no row) contributes its true
    * counter value 0 — a never-inserted probe key estimates 0 whenever ANY
    * of its cells is collision-free, which is the actual CMS min semantics
    * (an inner join would silently take the min over non-empty cells only
    * and overestimate such keys). */
  def estimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    val lanes = (0 until depth).map(d =>
      expr(s"struct(cast($d as int) as row, ${bucket(d, keyCol, width)} as bucket)"))
    probes.select(col(keyCol), explode(array(lanes: _*)).as("lane"))
      .select(col(keyCol), col("lane.row"), col("lane.bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol).agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** KMV (k-minimum-values) distinct-count sketch over the same portable
    * digit-only md5 hash (uniform over [0, 1e6)). The sketch is the k
    * smallest DISTINCT hash values — built by TakeOrdered (per-partition
    * bottom-k heaps, no global sort) and MERGEABLE: the union of two
    * sketches re-bottom-k'd is the sketch of the union, the property that
    * makes it a per-partition/per-day rollup primitive at 100 TB. The
    * 1e6 hash space caps resolvable cardinality (~collisions past ~1e5
    * distinct); widen the digit take for bigger universes — in BOTH
    * engines together. */
  def kmvSketch(items: DataFrame, keyCol: String, k: Int): DataFrame =
    items.select(expr(
        s"cast(substr(concat(regexp_replace(md5(cast($keyCol as string)), " +
          s"'[a-f]', ''), '000000'), 1, 6) as bigint)").as("h"))
      .distinct().orderBy("h").limit(k)

  /** Merge KMV sketches (any union of `h`-column sketch frames): dedup
    * shared hashes, keep the k smallest — the rollup step. */
  def kmvMerge(sketches: DataFrame, k: Int): DataFrame =
    sketches.distinct().orderBy("h").limit(k)

  /** Distinct-count estimate from a KMV sketch: (k−1)·M div h_k, exact
    * when the universe never filled the sketch (n < k). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n"), max("h").as("hk"))
      .select(when(col("n") < k, col("n"))
        .otherwise(expr(s"((${k} - 1) * 1000000) div hk"))
        .as("distinct_est"))
}
