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
}
