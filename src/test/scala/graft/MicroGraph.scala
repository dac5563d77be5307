package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** Hand-built micro property graph (FIXTURES.md §1, STaRK-MAG shape —
  * reference stark_neo4j_loading.py): 11 nodes / 13 edges covering a hub
  * node (FieldOfStudy 30), a parallel-edge pair of different types between
  * one node pair (e4/e12: 10-20), a self-loop (e13: 22-22), a null abstract
  * (node 21), and two nodes whose names differ only by Unicode NFC form
  * (40 composed / 41 decomposed).
  *
  * All expected results in the specs are hand-derived from this table.
  */
object MicroGraph {
  // (nodeId, label, name, abstract)
  val nodeRows: Seq[(Long, String, String, Option[String])] = Seq(
    (1L, "Institution", "MIT", None),
    (2L, "Institution", "Stanford", None),
    (10L, "Author", "Alice", None),
    (11L, "Author", "Bob", None),
    (12L, "Author", "Carol", None),
    (20L, "Paper", "P-alpha", Some("about dbs")),
    (21L, "Paper", "P-beta", None),
    (22L, "Paper", "P-gamma", Some("graphs")),
    (30L, "FieldOfStudy", "Databases", None),
    (40L, "Entity", "Caf\u00e9", None),      // composed e-acute
    (41L, "Entity", "Cafe\u0301", None))   // decomposed e + combining acute

  // (relType, src, dst)
  val relRows: Seq[(String, Long, Long)] = Seq(
    ("AFFILIATED_WITH", 10L, 1L),   // e1
    ("AFFILIATED_WITH", 11L, 1L),   // e2
    ("AFFILIATED_WITH", 12L, 2L),   // e3
    ("WRITES", 10L, 20L),           // e4  — parallel with e12
    ("WRITES", 10L, 21L),           // e5
    ("WRITES", 11L, 20L),           // e6
    ("WRITES", 12L, 22L),           // e7
    ("HAS_TOPIC", 20L, 30L),        // e8
    ("HAS_TOPIC", 21L, 30L),        // e9
    ("HAS_TOPIC", 22L, 30L),        // e10 — 30 is the hub
    ("CITES", 22L, 20L),            // e11
    ("REVIEWS", 10L, 20L),          // e12 — parallel with e4
    ("CITES", 22L, 22L))            // e13 — self-loop

  def apply(spark: SparkSession): PropertyGraph = {
    import spark.implicits._
    val nodes: DataFrame = nodeRows
      .toDF("nodeId", "label", "name", "abstract")
      .withColumn("labels", array(col("label"), lit("_Entity_")))
      // deterministic 4-dim "nameEmbedding" so vector queries are testable:
      // basis-ish vectors derived from nodeId
      .withColumn("nameEmbedding", array(
        (col("nodeId") % 4 === 0).cast("double"),
        (col("nodeId") % 4 === 1).cast("double"),
        (col("nodeId") % 4 === 2).cast("double"),
        (col("nodeId") % 4 === 3).cast("double")))
    val rels: DataFrame = relRows.toDF("relType", "src", "dst")
    PropertyGraph(nodes, rels)
  }
}
