package graft.graph

import org.apache.spark.sql.SparkSession

/** Bucketed persistence for the property graph — the 100 TB co-location
  * path (SURVEY §4 physical notes): nodes bucketed+sorted by `nodeId`,
  * relationships bucketed by `src`, same bucket count. Hop joins
  * (`nodeId = src`) and edge–edge self-joins then co-locate: Spark's
  * bucketing metadata satisfies the join's required distribution, so the
  * shuffle disappears from the plan (asserted in GraphStoreSpec).
  *
  * This mirrors what the reference gets from Neo4j's native adjacency
  * storage — except declaratively: the layout is table metadata, and every
  * query over the bucketed tables benefits without code changes.
  */
object GraphStore {

  /** Persist as bucketed managed tables `{prefix}_nodes` / `{prefix}_rels`. */
  def writeBucketed(g: PropertyGraph, prefix: String, buckets: Int): Unit = {
    g.nodes.write.mode("overwrite")
      .bucketBy(buckets, "nodeId").sortBy("nodeId")
      .saveAsTable(s"${prefix}_nodes")
    g.rels.write.mode("overwrite")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(s"${prefix}_rels")
  }

  def readBucketed(spark: SparkSession, prefix: String): PropertyGraph =
    PropertyGraph(spark.table(s"${prefix}_nodes"), spark.table(s"${prefix}_rels"))
}
