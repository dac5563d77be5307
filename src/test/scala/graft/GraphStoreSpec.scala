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
}
