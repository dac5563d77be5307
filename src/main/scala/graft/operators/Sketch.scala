package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    s"cast(substr(concat(translate(md5(concat('$row|', $keyCol)), " +
      s"'abcdef', ''), '000000'), 1, 6) as bigint) % $width"

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
        s"cast(substr(concat(translate(md5(cast($keyCol as string)), " +
          s"'abcdef', ''), '000000'), 1, 6) as bigint)").as("h"))
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

  /** Portable integer HyperLogLog (Flajolet et al. 2007) over the same
    * digit-free md5 hash family — unlike the engine's built-in
    * approx_count_distinct (whose registers are private), every step here
    * is ANSI-SQL-reproducible, so the sketch AND its estimate are
    * hash-exact cross-engine:
    *
    *  - h = 60-bit md5 prefix; bucket = h mod m; rest = h div m (54 bits)
    *  - ρ = leading-zero rank of rest in the 54-bit domain (a generated
    *    comparison CASE — no float log anywhere)
    *  - register r_b = max ρ per bucket, empty buckets r = 0
    *  - Σ 2^(54−r) is an EXACT Long (the 2^-r harmonic sum scaled by
    *    2^54), and the α·m² bias factor applies as two integer divisions
    *
    * No small-range linear-counting correction (it needs ln); this is the
    * raw HLL estimator, mergeable by register max — the per-partition /
    * per-day rollup shape, 64 Longs of state per group at ANY scale. */
  def hllRho(rest: Column, bits: Int): Column =
    (bits - 1 to 0 by -1).foldLeft(when(rest === 0L, lit(bits + 1))) {
      (acc, k) => acc.when(rest >= (1L << k), lit(bits - k))
    }

  /** Deterministic sharded heavy-hitter summary — the relational form of
    * SpaceSaving/Misra-Gries (Agarwal et al., "Mergeable Summaries",
    * PODS'12) without their stream-order dependence, which would break
    * oracle replay: the portable digit-only md5 routes every key to
    * exactly ONE of `nShards` disjoint shards; each shard retains only its
    * `capacity` most frequent keys (count desc, key asc) plus one
    * residual bound `err_ub` — the max count it dropped. Because shards
    * PARTITION the key space, every retained count is exact and any key
    * with true count > its shard's `err_ub` is guaranteed retained: the
    * SpaceSaving guarantee with exact (not ±εN) counts.
    *
    * Scale shape: the count pass is one map-side-combined groupBy (the
    * same pass an exact top-k needs); the ARTIFACT is the point — a
    * nShards·(capacity+1)-row summary that stands in for the full count
    * table in rollups and merges by [[heavyHittersMerge]], so per-day /
    * per-source summaries compose without ever re-touching the corpus. */
  def heavyHitters(items: DataFrame, keyCol: String, nShards: Int,
                   capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("cnt").desc, col("key"))
    val ranked = items
      .select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .withColumn("shard", expr(
        s"cast(substr(concat(translate(md5(concat('hh|', key)), " +
          s"'abcdef', ''), '000000'), 1, 6) as bigint) % $nShards"))
      .withColumn("rk", row_number().over(w))
    val err = ranked.where(col("rk") > capacity)
      .groupBy("shard").agg(max("cnt").as("e"))
    ranked.where(col("rk") <= capacity)
      .join(broadcast(err), Seq("shard"), "left")
      .select(col("shard"), col("key"), col("cnt"),
        coalesce(col("e"), lit(0L)).as("err_ub"))
  }

  /** Merge heavy-hitter summaries built over DISJOINT row sets with the
    * same (nShards, capacity): per (shard, key) the exact counts add; a
    * summary that dropped the key contributes at most its shard's err_ub,
    * so the merged bound is Σ err_ub over ALL inputs for that shard
    * (absent keys' true mass is what the bound covers), re-trimmed to
    * capacity with the same deterministic rule. `summaries` is the union
    * of summary frames, each tagged with a distinct value in a `part`
    * column (which summary a row came from — without it, two summaries
    * reporting the same err_ub for a shard would collapse to one). */
  def heavyHittersMerge(summaries: DataFrame, capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("cnt").desc, col("key"))
    val errTot = summaries.groupBy("part", "shard").agg(max("err_ub").as("pe"))
      .groupBy("shard").agg(sum("pe").as("e"))
    val merged = summaries.groupBy("shard", "key")
      .agg(sum("cnt").as("cnt"))
      .withColumn("rk", row_number().over(w))
    val dropped = merged.where(col("rk") > capacity)
      .groupBy("shard").agg(max("cnt").as("d"))
    merged.where(col("rk") <= capacity)
      .join(broadcast(errTot), Seq("shard"), "left")
      .join(broadcast(dropped), Seq("shard"), "left")
      .select(col("shard"), col("key"), col("cnt"),
        (coalesce(col("e"), lit(0L)) + coalesce(col("d"), lit(0L))).as("err_ub"))
  }

  /** HLL registers for `keyCol`: one row per bucket (all m present). */
  def hllSketch(items: DataFrame, keyCol: String, m: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val regs = items
      .select(expr(s"cast(conv(substr(md5(cast($keyCol as string)), 1, 15)," +
        " 16, 10) as bigint)").as("h"))
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("rest"))
      .select(col("bucket"), hllRho(col("rest"), 54).as("rho"))
      .groupBy("bucket").agg(max("rho").cast("long").as("r"))
    (0 until m).map(_.toLong).toDF("bucket")
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0L)).as("r"))
  }

  /** Estimate from HLL registers: α·m²·2^55 / Σ2^(55−r) with α = 709/1000
    * (the m = 64 constant as an integer rational) and registers clamped at
    * 40 (≈10^12 per-bucket cardinality — far past any real input) so every
    * product stays inside Long; pow(2, k) is exact in IEEE doubles and
    * casts exactly, with k ≥ 15 after the clamp (a NEGATIVE exponent would
    * hit the Spark-truncates/DuckDB-rounds cast divergence). */
  def hllEstimate(sketch: DataFrame, m: Int): DataFrame =
    sketch.agg(sum(expr("cast(pow(2, 55 - least(r, 40)) as bigint)")).as("s"))
      .select(expr(
        s"((($m * 36028797018963968) div s) * 709 div 1000) * $m")
        .as("distinct_est"))

  /** Per-group KMV sketches: the k smallest distinct portable hashes of
    * `keyExpr` per `groupCol` value. One distinct + one bottom-k window
    * over the (group, hash) pairs — the only pass that ever touches the
    * corpus; everything downstream runs on ≤ k rows per group. */
  def kmvGroupSketch(items: DataFrame, groupCol: String, keyExpr: String,
                     k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("h")
    items.select(col(groupCol).as("g"), expr(
        s"cast(substr(concat(translate(md5(cast(($keyExpr) as string)), " +
          s"'abcdef', ''), '000000'), 1, 6) as bigint)").as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** KMV set algebra over every group pair: union/intersection cardinality
    * estimates and Jaccard in integer micro-units, all derived from the
    * merged bottom-k sketch (Beyer et al., SIGMOD'07: ρ = shared fraction
    * of the merged sketch, |A∪B| from its k-th value, |A∩B| = ρ·|A∪B|).
    *
    * Scale shape: the corpus is scanned ONCE by [[kmvGroupSketch]]; the
    * pair enumeration is sketches×groups — k·g² rows for g groups, driver
    * data at any corpus size (sketch tables are the broadcast side by
    * construction). Exactly the shape that answers "how much vocabulary do
    * every two sources share" over 100 TB without ever joining the corpus
    * to itself. */
  def kmvSetOps(sketches: DataFrame, k: Int): DataFrame = {
    val sk = sketches.cache()
    val groups = sk.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    // union multiset of the two sketches per pair, deduped with membership
    // flags, then re-bottom-k'd (the KMV merge law)
    val tagged = pairs.join(broadcast(sk), col("ga") === col("g"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
      .union(pairs.join(broadcast(sk), col("gb") === col("g"))
        .select(col("ga"), col("gb"), col("h"), lit(0).as("in_a"), lit(1).as("in_b")))
    val merged = tagged.groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("ga", "gb").orderBy("h")
    merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("n"), max("h").as("hk"),
        sum(expr("in_a * in_b")).as("shared"))
      .select(col("ga"), col("gb"),
        when(col("n") < k, col("n"))
          .otherwise(expr(s"(($k - 1) * 1000000) div hk"))
          .as("union_est"),
        expr("(shared * 1000000) div n").as("jac_micro"))
      .withColumn("inter_est", expr("(jac_micro * union_est) div 1000000"))
  }

  /** Per-group HLL registers (same portable hash/ρ family as
    * [[hllSketch]]): m rows per group, every bucket present so downstream
    * algebra never needs a fill join. One corpus pass — the group key just
    * rides the register groupBy. */
  def hllGroupSketch(items: DataFrame, groupCol: String, keyExpr: String,
                     m: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val regs = items
      .select(col(groupCol).as("g"),
        expr(s"cast(conv(substr(md5(cast(($keyExpr) as string)), 1, 15)," +
          " 16, 10) as bigint)").as("h"))
      .select(col("g"), (col("h") % m).as("bucket"),
        expr(s"h div $m").as("rest"))
      .select(col("g"), col("bucket"), hllRho(col("rest"), 54).as("rho"))
      .groupBy("g", "bucket").agg(max("rho").cast("long").as("r"))
    items.select(col(groupCol).as("g")).distinct()
      .crossJoin(broadcast((0 until m).map(_.toLong).toDF("bucket")))
      .join(regs, Seq("g", "bucket"), "left")
      .select(col("g"), col("bucket"),
        coalesce(col("r"), lit(0L)).as("r"))
  }

  /** HLL set algebra over every group pair: the union sketch is the
    * register-wise max (the HLL merge law — EXACT, the union sketch is
    * identical to sketching the concatenated inputs), |A∩B| follows by
    * inclusion–exclusion clamped at 0 (the one place HLL can go negative),
    * and Jaccard in integer micro-units. Everything downstream of the one
    * [[hllGroupSketch]] corpus pass runs on the m·g-row register table —
    * the constant-memory alternative to [[kmvSetOps]] (64 Longs per group
    * FOREVER vs bottom-k hash lists), at the price of the cruder
    * inclusion–exclusion intersection. */
  def hllSetOps(sketches: DataFrame, m: Int): DataFrame = {
    def est(s: String) =
      s"((($m * 36028797018963968) div $s) * 709 div 1000) * $m"
    val perGroup = sketches.groupBy("g")
      .agg(sum(expr("cast(pow(2, 55 - least(r, 40)) as bigint)")).as("s"))
      .select(col("g"), expr(est("s")).as("est"))
    val groups = sketches.select("g").distinct()
    groups.select(col("g").as("ga"))
      .crossJoin(broadcast(groups.select(col("g").as("gb"))))
      .filter(col("ga") < col("gb"))
      .join(broadcast(sketches.select(col("g").as("ga"), col("bucket"),
        col("r").as("ra"))), Seq("ga"))
      .join(broadcast(sketches.select(col("g").as("gb"), col("bucket"),
        col("r").as("rb"))), Seq("gb", "bucket"))
      .groupBy("ga", "gb")
      .agg(sum(expr(
        "cast(pow(2, 55 - least(greatest(ra, rb), 40)) as bigint)")).as("s"))
      .select(col("ga"), col("gb"), expr(est("s")).as("union_est"))
      .join(broadcast(perGroup.select(col("g").as("ga"),
        col("est").as("est_a"))), Seq("ga"))
      .join(broadcast(perGroup.select(col("g").as("gb"),
        col("est").as("est_b"))), Seq("gb"))
      .select(col("ga"), col("gb"), col("union_est"),
        greatest(expr("est_a + est_b - union_est"), lit(0L)).as("inter_est"))
      .withColumn("jac_micro", expr("(inter_est * 1000000) div union_est"))
  }
}
