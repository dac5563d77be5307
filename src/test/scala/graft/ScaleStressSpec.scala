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

  // ---- planted-hub skew for the anchored 2-hop family (§7.4) ----

  /** [[scaledGraph]] plus one planted HUB per copy: a Nation named
    * "HUB_NATION" (the SAME name in every copy, so a name anchor matches
    * all n hubs) wired by FROM_NATION to EVERY customer of its copy and
    * by IN_REGION to every region — the deliberately degenerate degree
    * distribution (hub degree = |customers|, ~1000× the median nation)
    * that §7.4 flags as the 2-hop scale risk. */
  private def hubGraph(n: Int): graft.graph.PropertyGraph = {
    val g0 = scaledGraph(n)
    val copies = spark.range(n).select(col("id").as("__copy"))
    val hubNodes = copies.select(
        (col("__copy") * Shift + lit(7000000000L)).as("nodeId"),
        lit("Nation").as("label"), lit("HUB_NATION").as("name"))
      .withColumn("labels", array(lit("Nation"), lit("_Entity_")))
      .withColumn("nameEmbedding", lit(null).cast("array<double>"))
    val hubOfCopy = expr(s"nodeId div ${Shift}L * ${Shift}L + 7000000000L")
    val custRels = g0.nodes.where(col("label") === "Customer")
      .select(lit("FROM_NATION").as("relType"),
        col("nodeId").as("src"), hubOfCopy.as("dst"))
    val regRels = g0.nodes.where(col("label") === "Region")
      .select(lit("IN_REGION").as("relType"),
        hubOfCopy.as("src"), col("nodeId").as("dst"))
    graft.graph.PropertyGraph(
      g0.nodes.unionByName(hubNodes),
      g0.rels.unionByName(custRels).unionByName(regRels))
  }

  /** The anchored 2-hop THROUGH the hub, via the dialect (the exact
    * query family a user writes): every copy's anchor matches its hub,
    * whose first-hop fan-out is the whole customer population. The
    * DISTINCT count keeps the customer ids (distinct values, realistic
    * shuffle bytes) flowing through the hot hub-keyed hop — count(*)
    * would let column pruning shrink the hot partitions to a few
    * constant columns that compress to almost nothing. */
  private def hubDf(n: Int): DataFrame =
    graft.cypher.Planner.run(hubGraph(n),
      """MATCH (c:Customer)-[e1:FROM_NATION]-(n:Nation {name: "HUB_NATION"})-[e2:IN_REGION]-(r:Region)
        |RETURN count(DISTINCT c) AS n_cust, count(*) AS n_rows""".stripMargin)

  private def hubCount(n: Int): Long = hubDf(n).collect().head.getLong(1)

  /** Final (post-AQE) physical plan of an EXECUTED DataFrame. */
  private def finalPlan(df: DataFrame) = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** Collect across AQE's query-stage boundaries: `QueryStageExec` is a
    * LEAF wrapper (plain `collect` never sees inside a materialized
    * stage), so descend into `.plan` explicitly. */
  private def collectAll[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val kids = p match {
      case q: QueryStageExec        => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other                    => other.children
    }
    pf.lift(p).toSeq ++ kids.flatMap(collectAll(_)(pf))
  }

  test("planted-hub 2-hop: structural skew killers keep the walltime linear") {
    // matches = |customers| × |regions| per copy — hand-derivable and
    // exactly ×n (disjoint copies)
    val (h1, t1) = bench(hubCount(1))
    val n = if (sys.env.get("SPARK_GRAFT_STRESS").contains("1")) 10 else 3
    val (hN, tN) = bench(hubCount(n))
    info(f"hub2hop ×1: $h1%8d rows ${t1}%6.2f s   ×$n: $hN%8d rows ${tN}%6.2f s   ratio ${tN / t1}%5.2f")
    assert(hN === h1 * n, s"hub 2-hop matches must scale exactly ×$n")
    // sub-quadratic envelope: the hub's fan-out rides ONE broadcast
    // anchor pre-filter (meet-in-the-middle) — a per-hub-key quadratic
    // blowup would land far outside 4·n
    assert(tN / t1 < 4.0 * n,
      f"hub 2-hop runtime ratio ${tN / t1}%.1f exceeds the linear envelope")
    assertShape(hubDf(n), "hub2hop")
  }

  test("planted-hub 2-hop: AQE splits the hot hub key when the join shuffles") {
    // Force the residual case the broadcast hint normally absorbs: with
    // broadcast OFF (the anchor's explicit broadcast() hint still wins,
    // so the anchor leg stays a broadcast join — only the UNHINTED hop
    // falls to sort-merge), every frontier row of a copy carries its
    // hub's nodeId, so the hop-2 shuffle lands ~|customers| rows on n
    // keys. Thresholds are scaled down so the split fires at spec data
    // sizes (shuffle sizes are SERIALIZED+COMPRESSED bytes, so ~500 KB
    // of hot rows measure ~100-200 KB); 32 shuffle partitions keep the
    // MEDIAN partition empty so the n hot keys stand out the way a hub
    // does among thousands of keys at 100 TB, where the default 256 MB
    // threshold fires the same way.
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      // splitting a skewed partition may break the downstream join's
      // copartitioning and cost an extra shuffle — at spec sizes that
      // trade is forced so the SPLIT mechanism itself is what's asserted
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // skew SPLITTING works at map-output granularity: a hot reduce
      // partition can only be split across the mappers that produced it.
      // At spec sizes AQE coalesces the upstream stage to ~1 task, which
      // makes every partition single-mapper and unsplittable — at real
      // scale the map side has hundreds of tasks, so coalescing is
      // disabled here to restore the multi-mapper provenance the split
      // depends on.
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val df = hubDf(3)
      val h = df.collect().head.getLong(1)
      collectAll(df.queryExecution.executedPlan) {
        case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => q
      }.foreach { q =>
        val sizes = q.mapStats.map(_.bytesByPartitionId).getOrElse(Array.empty)
        info(s"[stage ${q.id}] nonzero=${sizes.count(_ > 0)} " +
          s"top=${sizes.sorted.reverse.take(4).mkString(",")}")
      }
      val smjs = collectAll(df.queryExecution.executedPlan) {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(smjs.nonEmpty,
        s"expected the hop join to shuffle with broadcast off:\n${finalPlan(df)}")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE skew split did not fire on the hub key:\n${finalPlan(df)}")
      // r12 VERDICT #7 upgrade: don't just assert the skew-join FLAG —
      // assert the hot reduce partition was genuinely split into ≥2
      // tasks. A split manifests as the skewed side's AQEShuffleRead
      // carrying ≥2 PartialReducerPartitionSpec entries for the SAME
      // reducer index (each covering a distinct mapper range — exactly
      // the multi-mapper provenance a hub key has at 100 TB).
      val splitMultiplicity = collectAll(df.queryExecution.executedPlan) {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => r
      }.flatMap(_.partitionSpecs).collect {
        case p: org.apache.spark.sql.execution.PartialReducerPartitionSpec =>
          p.reducerIndex
      }.groupBy(identity).map(_._2.size)
      info(s"hot-partition split multiplicity: " +
        s"${splitMultiplicity.toSeq.sorted.reverse.take(4).mkString(",")}")
      assert(splitMultiplicity.exists(_ >= 2),
        s"hot partition was not split into >=2 tasks:\n${finalPlan(df)}")
      // same result under the forced shuffle+split plan
      assert(h === hubCount(1) * 3)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
