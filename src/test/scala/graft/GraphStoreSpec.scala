package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphStore

/** Bucketed graph storage: hop joins over bucketed tables must plan
  * WITHOUT a shuffle exchange — the 100 TB co-location guarantee. */
class GraphStoreSpec extends SparkSpec {

  private def shuffleFree(df: org.apache.spark.sql.DataFrame): Boolean = {
    df.count() // finalize any adaptive plan
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }

  test("bucketed hop join and edge self-join plan without shuffles") {
    val g = MicroGraph(spark)
    GraphStore.writeBucketed(g, "micro", buckets = 4)
    val bg = GraphStore.readBucketed(spark, "micro")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // hop join: nodes(nodeId) ⋈ rels(src) — bucketed on the join keys
      val hop = bg.nodes.join(bg.rels, bg.nodes("nodeId") === bg.rels("src"))
      assert(shuffleFree(hop), hop.queryExecution.executedPlan.toString)
      // 2-hop shape: rels ⋈ rels on dst=src — probe side bucketed
      val self = bg.rels.as("a").join(bg.rels.as("b"), col("a.src") === col("b.src"))
      assert(shuffleFree(self), self.queryExecution.executedPlan.toString)
      // correctness identical to the unbucketed graph
      assert(hop.count() ===
        g.nodes.join(g.rels, g.nodes("nodeId") === g.rels("src")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("labelsMutated survives the bucketed write/read round trip") {
    // the flag is session state not derivable from the stored rows
    // cheaply — without persistence a reloaded label-mutated graph
    // silently stops matching secondary labels (ADVICE r16)
    val g = MicroGraph(spark)
    val mutated = graft.cypher.Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}) SET a:Flagged""")
    assert(mutated.labelsMutated)
    GraphStore.writeBucketed(mutated, "lmut", buckets = 4)
    val back = GraphStore.readBucketed(spark, "lmut")
    assert(back.labelsMutated,
      "labelsMutated must be restored from table metadata")
    // the real contract: the added label still anchors a MATCH
    val hits = graft.cypher.Planner.run(back,
      """MATCH (n:Flagged) RETURN n.name AS name""")
      .collect().map(_.getString(0)).toSeq
    assert(hits === Seq("Alice"))
    // an UNMUTATED graph reloads with the flag off (keeps the pushable
    // primary-label read path)
    GraphStore.writeBucketed(g, "lmut0", buckets = 4)
    assert(!GraphStore.readBucketed(spark, "lmut0").labelsMutated)
  }

  test("driver-data bucketed graph: same one-hop rows, shuffle-free hop join") {
    val dir = "/root/testdata/sf0.001"
    val g = graft.graph.TpchGraph.load(spark, dir)
    GraphStore.writeBucketed(g, "sf0001", buckets = 4)
    val bg = GraphStore.readBucketed(spark, "sf0001")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the hop join the bucketing exists for: no Exchange below it
      val hop = bg.nodes.join(bg.rels, bg.nodes("nodeId") === bg.rels("src"))
      assert(shuffleFree(hop), hop.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // query-surface equivalence on driver data: bucketed j2 ≡ unbucketed j2
    val a = graft.operators.Patterns.oneHop(bg, "Region", Seq("ASIA", "EUROPE"))
      .collect().map(_.toString).sorted
    val b = graft.operators.Patterns.oneHop(g, "Region", Seq("ASIA", "EUROPE"))
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
  }

  test("disk-materialized adjacency: per-round frontier join has no " +
    "exchange and no sort on the adjacency side; BFS rows identical") {
    val dir = "/root/testdata/sf0.001"
    val g = graft.graph.TpchGraph.load(spark, dir)
    GraphStore.writeBucketedAdj(g, "adjspec", buckets = 4)
    val adj = GraphStore.readBucketedAdj(spark, "adjspec")

    // the shuffle-fallback shape (state too big to broadcast): force the
    // non-broadcast join and inspect ONE round's frontier ⋈ adjacency plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val frontier = g.nodes
        .where(col("label") === "Region" && col("name") === "ASIA")
        .select(col("nodeId").as("v"))
      val round = adj.join(frontier, col("v") === col("a"))
        .select(col("b")).distinct()
      round.count()
      val exec = round.queryExecution.executedPlan
      // find the frontier ⋈ adjacency join and isolate its ADJACENCY
      // subtree: the bucketing must satisfy the join's distribution, so
      // that whole branch plans without any shuffle exchange
      val joinSides = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          Seq(j.left, j.right)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          Seq(j.left, j.right)
      }.flatten
      val adjSide = joinSides.filter(_.toString.contains("adjspec_adj"))
      assert(adjSide.nonEmpty, s"no join over the bucketed adjacency:\n$exec")
      adjSide.foreach { side =>
        val shuffles = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }
        assert(shuffles.isEmpty,
          s"adjacency side must read bucket metadata, not reshuffle:\n$side")
        assert(side.toString.contains("Bucketed: true"),
          s"adjacency scan must be bucketed:\n$side")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }

    // the one-line swap end to end: BFS over the disk adjacency must
    // produce EXACTLY the in-memory adjPairs rows
    val disk = graft.graph.GraphAlgorithms
      .bfsLayers(g, "Region", Seq("ASIA"), iters = 6, adj = adj)
      .collect().map(_.toString).sorted
    val mem = graft.graph.GraphAlgorithms
      .bfsLayers(g, "Region", Seq("ASIA"), iters = 6)
      .collect().map(_.toString).sorted
    assert(disk.nonEmpty && (disk sameElements mem))
  }
}
