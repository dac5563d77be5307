package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Synthetic ×N scale stress for the three shuffle-heaviest families
  * (SURVEY §4's 10× proof): the driver testdata is capped at sf0.1
  * (read-only), so a derived corpus is built by union+id-shift — N
  * disjoint copies of the sf0.1 graph/documents, ids offset per copy,
  * names kept (anchors match in EVERY copy, so the matched workload
  * scales ×N too, not just the scanned bytes).
  *
  * Asserted at both scales:
  *  - WORK scales exactly ×N everywhere: 2-hop matches and BFS reached
  *    mass (disjoint id spaces), and banded-dedup pairs (the copy index
  *    rides in every band key, so copies never share a bucket and each
  *    reproduces the ×1 bucket histogram — identical valve behavior);
  *  - RUNTIME grows ~linearly: t(×N)/t(×1) stays far under the quadratic
  *    signature (bound 4·N — generous for local[4] noise; quadratic
  *    would be ~N²);
  *  - PLANS keep their shape at ×N: no CartesianProduct, no
  *    BroadcastNestedLoopJoin (anchored sides stay broadcast equi-joins).
  *
  * The full 10× run takes minutes, is tagged
  * [[ScaleStressSpec.Stress]], and is gated behind SPARK_GRAFT_STRESS=1 —
  * plain `sbt test` runs the ×3 sanity variant; the 10× numbers recorded
  * in SURVEY §4 come from
  * `SPARK_GRAFT_STRESS=1 sbt "testOnly graft.ScaleStressSpec"`.
  */
object ScaleStressSpec {
  object Stress extends Tag("graft.Stress")
}

class ScaleStressSpec extends SparkSpec {
  import ScaleStressSpec.Stress

  private val dir = "/root/testdata/sf0.1"
  private val Shift = 100000000000L // > every TpchGraph base (1e9..6e9)

  private lazy val base = graft.graph.TpchGraph.load(spark, dir)
  private lazy val baseSigs = graft.operators.Dedup.simhashSignatures(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 32)
    .localCheckpoint(true) // signature computation is shared, not timed

  /** N disjoint copies: id columns offset by copy·Shift; the optional
    * copy-mixed signature xor keeps Hamming geometry WITHIN a copy
    * (xor by a constant preserves all pairwise distances) while spreading
    * copies across the band keyspace. */
  private def scaledGraph(n: Int): graft.graph.PropertyGraph = {
    def copies = spark.range(n).select(col("id").as("__copy"))
    def shift(df: DataFrame, idCols: Set[String]) = df.crossJoin(copies)
      .select(df.columns.map(c =>
        if (idCols(c)) (col(c) + col("__copy") * Shift).as(c) else col(c)): _*)
    graft.graph.PropertyGraph(
      shift(base.nodes, Set("nodeId")), shift(base.rels, Set("src", "dst")))
  }

  /** Copy-disjoint signatures: each 8-bit band of the 32-bit signature is
    * widened to 12 bits carrying the copy index in its high nibble —
    * buckets never mix across copies (band keys differ in the copy bits),
    * within-copy Hamming distances are preserved exactly (the copy bits
    * cancel under xor), so at ×n every copy reproduces the ×1 bucket
    * histogram and the pair count scales EXACTLY ×n with identical valve
    * behavior. */
  private def scaledSigs(n: Int): DataFrame = {
    require(n <= 16, "copy index must fit the band's high nibble")
    val widened = (0 until 4).map { b =>
      shiftleft(shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L)), 12 * b)
        .bitwiseOR(shiftleft(col("__copy"), 12 * b + 8))
    }.reduce(_.bitwiseOR(_))
    baseSigs.crossJoin(spark.range(n).select(col("id").as("__copy")))
      .select((col("doc_id") + col("__copy") * Shift).as("doc_id"),
        widened.as("simhash"))
  }

  /** Wall clock of build+materialize, min of 2 full runs. */
  private def bench(run: => Long): (Long, Double) = {
    def once: (Long, Double) = {
      val t0 = System.nanoTime()
      val m = run
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val (m1, t1) = once
    val (_, t2) = once
    (m1, math.min(t1, t2))
  }

  private def assertShape(df: DataFrame, what: String): Unit = {
    val exec = df.queryExecution.executedPlan
    assert(exec.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty, s"$what went cartesian:\n$exec")
    // the copy replicator itself is a deliberate crossJoin against the
    // tiny Range(n) frame; any OTHER nested-loop join is a lost equi-join
    exec.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.foreach { j =>
      assert(j.left.toString.contains("Range (") ||
        j.right.toString.contains("Range ("),
        s"$what lost its equi-join (nested loop without the copy Range):\n$j")
    }
  }

  private def twoHopDf(n: Int): DataFrame =
    graft.operators.Patterns.concreteTwoHop(scaledGraph(n),
      "Nation", "NATION_5", "FROM_NATION", "Customer", "PLACED", "Order")

  private def dedupDf(n: Int): DataFrame =
    graft.operators.Dedup.simhashBandPairs(scaledSigs(n),
      bits = 48, bands = 4, maxDist = 2, maxBucket = 64)

  private def stressAt(n: Int): Unit = {
    // ---- 2-hop join: matches scale exactly ×n (disjoint copies) ----
    val (h1, ht1) = bench(twoHopDf(1).count())
    val (hN, htN) = bench(twoHopDf(n).count())
    info(f"twohop  ×1: $h1%8d rows ${ht1}%6.2f s   ×$n: $hN%8d rows ${htN}%6.2f s   ratio ${htN / ht1}%5.2f")
    assert(hN === h1 * n, s"2-hop matches must scale exactly ×$n")
    assertShape(twoHopDf(n), "twohop")
    assert(htN / ht1 < 4.0 * n,
      f"twohop runtime ratio ${htN / ht1}%.1f exceeds the linear envelope")

    // ---- capped banded dedup: within-copy pairs are isomorphic ----
    val (d1, dt1) = bench(dedupDf(1).count())
    val (dN, dtN) = bench(dedupDf(n).count())
    info(f"dedup   ×1: $d1%8d rows ${dt1}%6.2f s   ×$n: $dN%8d rows ${dtN}%6.2f s   ratio ${dtN / dt1}%5.2f")
    assert(dN === d1 * n,
      s"dedup pairs must scale exactly ×$n (copy-disjoint band keys)")
    assertShape(dedupDf(n), "dedup")
    assert(dtN / dt1 < 4.0 * n,
      f"dedup runtime ratio ${dtN / dt1}%.1f exceeds the linear envelope")

    // ---- srcKeyedMinDist BFS: reached mass scales exactly ×n ----
    def bfsMass(k: Int): Long = graft.graph.GraphAlgorithms
      .bfsLayers(scaledGraph(k), "Region", Seq("ASIA"), iters = 3)
      .agg(sum(col("n_nodes"))).collect().head.getLong(0)
    val (b1, bt1) = bench(bfsMass(1))
    val (bN, btN) = bench(bfsMass(n))
    info(f"bfs     ×1: $b1%8d mass ${bt1}%6.2f s   ×$n: $bN%8d mass ${btN}%6.2f s   ratio ${btN / bt1}%5.2f")
    assert(bN === b1 * n, s"BFS reached mass must scale exactly ×$n")
    assert(btN / bt1 < 4.0 * n,
      f"bfs runtime ratio ${btN / bt1}%.1f exceeds the linear envelope")
  }

  test("×3 sanity: 2-hop, capped banded dedup, BFS scale ~linearly") {
    stressAt(3)
  }

  test("×10 stress: 2-hop, capped banded dedup, BFS scale ~linearly",
    Stress) {
    assume(sys.env.get("SPARK_GRAFT_STRESS").contains("1"),
      "set SPARK_GRAFT_STRESS=1 to run the 10× stress")
    stressAt(10)
  }
}
