package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val occurrences =
    (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(5)("gamma") ++
      Seq.fill(1)("delta") ++ ('a' to 'z').map(c => s"noise_$c"))
      .toDF("k")

  private def truth: Map[String, Long] =
    occurrences.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates never underestimate and are exact at generous width") {
    val keys = occurrences.select("k").distinct()
    val wide = Sketch.countMin(occurrences, "k", depth = 4, width = 4096)
    val est = Sketch.estimate(wide, keys, "k", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = truth
    t.foreach { case (k, n) => assert(est(k) === n, s"width 4096 should be collision-free for $k") }

    val tight = Sketch.countMin(occurrences, "k", depth = 4, width = 8)
    val estT = Sketch.estimate(tight, keys, "k", depth = 4, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    t.foreach { case (k, n) => assert(estT(k) >= n, s"CMS must never underestimate $k") }
    assert(t.keys.exists(k => estT(k) > t(k)), "width 8 with 30 keys must collide somewhere")
  }

  test("a never-inserted probe with any collision-free cell estimates 0") {
    // generous width: a fresh key's addressed cells are all empty, so the
    // min must be an explicit 0 row — not a dropped key (inner-join bug)
    // and not the min over whatever non-empty cells it collides with
    val wide = Sketch.countMin(occurrences, "k", depth = 4, width = 4096)
    val est = Sketch.estimate(wide, Seq("never_seen_key").toDF("k"), "k",
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("never_seen_key" -> 0L))
  }

  test("KMV: exact below k, mergeable, estimate within 3x at k=64") {
    // below k: the sketch holds every distinct hash → estimate is exact
    val small = (1 to 30).map(i => s"v$i").toDF("k")
    val exact = Sketch.kmvEstimate(Sketch.kmvSketch(small, "k", 64), 64)
      .first().getLong(0)
    assert(exact === 30L)
    // mergeability: bottom-k of the union of two sketches = sketch of union
    val a = (1 to 500).map(i => s"x$i").toDF("k")
    val b = (250 to 750).map(i => s"x$i").toDF("k")
    val merged = Sketch.kmvMerge(
      Sketch.kmvSketch(a, "k", 64).unionByName(Sketch.kmvSketch(b, "k", 64)),
      64)
    val direct = Sketch.kmvSketch(a.unionByName(b), "k", 64)
    assert(merged.collect().map(_.getLong(0)).sorted
      sameElements direct.collect().map(_.getLong(0)).sorted)
    // estimate quality: 750 distinct, k=64 → crude but in the right decade
    val est = Sketch.kmvEstimate(direct, 64).first().getLong(0)
    assert(est > 250L && est < 2250L, s"estimate $est far from 750")
  }

  test("sketch size is bounded by depth x width regardless of input") {
    val sk = Sketch.countMin(occurrences, "k", depth = 3, width = 8)
    assert(sk.count() <= 3L * 8)
    // total mass per row equals the input size (every occurrence lands once per row)
    val mass = sk.groupBy("row").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(mass === Set(occurrences.count()))
  }

  test("HLL: estimate within the m=64 error band, registers mergeable") {
    import spark.implicits._
    val n = 5000
    val items = (0 until n).map(i => s"key-$i").toDF("k")
    val est = Sketch.hllEstimate(Sketch.hllSketch(items, "k", 64), 64)
      .collect().head.getLong(0)
    // m = 64 → ~13% standard error; allow 3σ
    assert(math.abs(est - n).toDouble / n < 0.4, s"est $est for $n")
    // mergeability: register-wise max of two halves == whole
    val a = Sketch.hllSketch(items.where($"k" < "key-3"), "k", 64)
    val b = Sketch.hllSketch(items.where($"k" >= "key-3"), "k", 64)
    val merged = a.unionByName(b).groupBy("bucket")
      .agg(max("r").as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = Sketch.hllSketch(items, "k", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === whole)
  }

  test("HLL rho: generated comparison chain equals leading-zero rank") {
    import spark.implicits._
    val vals = Seq(0L, 1L, 2L, 3L, (1L << 53), (1L << 53) - 1, 12345L,
      (1L << 40) + 7L)
    val got = vals.toDF("rest")
      .select(Sketch.hllRho(col("rest"), 54).as("rho"))
      .collect().map(_.getInt(0)).toSeq
    val want = vals.map {
      case 0L => 55
      case v  => 54 - (63 - java.lang.Long.numberOfLeadingZeros(v))
    }
    assert(got === want)
  }

  test("KMV set ops: exact union/Jaccard/intersection below k") {
    import spark.implicits._
    // A = {a..e} (5), B = {c..f} (4): union 6, inter 3 → jac 500000
    val items = (Seq("a", "b", "c", "d", "e").map(("A", _)) ++
      Seq("c", "d", "e", "f").map(("B", _))).toDF("g", "tok")
    val sk = Sketch.kmvGroupSketch(items, "g", "tok", k = 128)
    val r = Sketch.kmvSetOps(sk, k = 128).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("ga") === "A" && row.getAs[String]("gb") === "B")
    assert(row.getAs[Long]("union_est") === 6L)
    assert(row.getAs[Long]("jac_micro") === 500000L)
    assert(row.getAs[Long]("inter_est") === 3L)
  }

  test("KMV set ops: saturated sketches estimate within 35% at k=64") {
    import spark.implicits._
    // two 1200-key universes overlapping in 600 keys: union 1800, jac 1/3
    val a = (0 until 1200).map(i => ("A", s"k$i"))
    val b = (600 until 1800).map(i => ("B", s"k$i"))
    val items = (a ++ b).toDF("g", "tok")
    val sk = Sketch.kmvGroupSketch(items, "g", "tok", k = 64)
    // sketches really are bounded at k per group
    assert(sk.groupBy("g").count().collect().map(_.getLong(1)).forall(_ == 64L))
    val row = Sketch.kmvSetOps(sk, k = 64).collect().head
    val unionEst = row.getAs[Long]("union_est").toDouble
    val interEst = row.getAs[Long]("inter_est").toDouble
    assert(math.abs(unionEst - 1800) / 1800 < 0.35, s"union_est $unionEst")
    assert(math.abs(interEst - 600) / 600 < 0.35, s"inter_est $interEst")
  }

  test("HLL set ops: union sketch equals the sketch of the concatenation") {
    import spark.implicits._
    // the merge law is EXACT: register-wise max of A and B must equal the
    // registers of A ∪ B sketched directly — so union_est(A,B) from
    // hllSetOps must equal hllEstimate over the concatenated items
    val a = (0 until 800).map(i => ("A", s"k$i"))
    val b = (400 until 1400).map(i => ("B", s"k$i"))
    val items = (a ++ b).toDF("g", "tok")
    val setops = Sketch.hllSetOps(
      Sketch.hllGroupSketch(items, "g", "tok", m = 64), m = 64)
      .collect().head
    val direct = Sketch.hllEstimate(
      Sketch.hllSketch(items.select(col("tok")), "tok", m = 64), m = 64)
      .collect().head.getLong(0)
    assert(setops.getAs[Long]("union_est") === direct)
  }

  test("HLL set ops: estimates within 40% at m=64, Jaccard in range") {
    import spark.implicits._
    // union 1400, inter 400 → jac ≈ 285714 micro; raw HLL at m=64 has
    // ~13% standard error per estimate and inclusion-exclusion compounds
    // it, so assert loose bands (the cross-engine hash gate is the
    // exactness check; this pins estimator sanity)
    val a = (0 until 800).map(i => ("A", s"k$i"))
    val b = (400 until 1400).map(i => ("B", s"k$i"))
    val r = Sketch.hllSetOps(
      Sketch.hllGroupSketch((a ++ b).toDF("g", "tok"), "g", "tok", m = 64),
      m = 64).collect().head
    val u = r.getAs[Long]("union_est").toDouble
    val i = r.getAs[Long]("inter_est").toDouble
    assert(math.abs(u - 1400) / 1400 < 0.4, s"union_est $u")
    assert(math.abs(i - 400) / 400 < 0.8, s"inter_est $i")
    val jac = r.getAs[Long]("jac_micro")
    assert(jac > 0L && jac < 1000000L)
  }

  test("HLL set ops: disjoint groups clamp intersection at zero") {
    import spark.implicits._
    val items = ((0 until 500).map(i => ("A", s"a$i")) ++
      (0 until 500).map(i => ("B", s"b$i"))).toDF("g", "tok")
    val r = Sketch.hllSetOps(
      Sketch.hllGroupSketch(items, "g", "tok", m = 64), m = 64)
      .collect().head
    // inclusion-exclusion can go negative on disjoint sets; the clamp
    // keeps inter_est (and so jac) at a meaningful 0 floor
    assert(r.getAs[Long]("inter_est") >= 0L)
    assert(r.getAs[Long]("jac_micro") < 200000L)
  }

  test("KMV set ops: every pair appears once, ga < gb") {
    import spark.implicits._
    val items = (for (g <- Seq("A", "B", "C", "D"); i <- 0 until 20)
      yield (g, s"$g-$i")).toDF("g", "tok")
    val sk = Sketch.kmvGroupSketch(items, "g", "tok", k = 32)
    val rows = Sketch.kmvSetOps(sk, k = 32)
      .select("ga", "gb").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.length === 6) // C(4,2)
    assert(rows.forall { case (a, b) => a < b })
    assert(rows.toSet.size === 6)
  }

  test("heavy hitters: retained counts exact, guarantee covers the bound") {
    val t = truth
    val summ = Sketch.heavyHitters(occurrences, "k", nShards = 2, capacity = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // capacity bounds the summary, retained counts are the EXACT counts
    summ.groupBy(_._1).foreach { case (_, rows) => assert(rows.length <= 3) }
    summ.foreach { case (_, k, c, _) => assert(c === t(k), s"count for $k") }
    // the SpaceSaving guarantee: any key with true count > its shard's
    // err_ub must be retained — so every heavyweight key survives
    val errOf = summ.map(s => s._1 -> s._4).toMap
    val kept = summ.map(_._2).toSet
    assert(kept.contains("alpha") && kept.contains("beta"))
    t.foreach { case (k, n) =>
      if (!kept.contains(k))
        // the key's shard must exist in the summary with a bound >= n
        assert(errOf.values.exists(_ >= n) || n <= errOf.values.max)
    }
  }

  test("heavy hitters merge: disjoint halves recombine to exact counts") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      (i.toLong, if (rnd.nextInt(10) < 6) s"hot_${rnd.nextInt(3)}"
                 else s"cold_${rnd.nextInt(50)}"))
    val df = rows.toDF("id", "k")
    val full = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val halves = Seq(0, 1).map { p =>
      Sketch.heavyHitters(df.where(pmod(col("id"), lit(2)) === p),
          "k", nShards = 2, capacity = 4)
        .withColumn("part", lit(p))
    }
    val merged = Sketch.heavyHittersMerge(
        halves.reduce(_ unionByName _), capacity = 4)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // hot keys were heavy in BOTH halves → retained in both → merged count
    // is the exact full-corpus count
    for (h <- 0 until 3) {
      val k = s"hot_$h"
      val m = merged.find(_._1 == k)
      assert(m.isDefined, s"$k must survive the merge")
      assert(m.get._2 === full(k), s"merged count for $k is exact")
    }
    // bound sanity: err_ub is nonnegative and merged summary stays bounded
    assert(merged.forall(_._3 >= 0L))
    assert(merged.length <= 2 * 4)
  }
}
