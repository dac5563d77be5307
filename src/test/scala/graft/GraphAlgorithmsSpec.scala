package graft

import org.apache.spark.sql.functions._
import graft.graph.{GraphAlgorithms, PropertyGraph}

class GraphAlgorithmsSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: Seq[(Long, Long)], nodes: Seq[(Long, String)]): PropertyGraph =
    PropertyGraph(
      nodes.map { case (id, lbl) => (id, lbl, s"n$id") }
        .toDF("nodeId", "label", "name"),
      edges.map { case (s, d) => ("E", s, d) }.toDF("relType", "src", "dst"))

  test("k-core keeps the triangle and peels the tail") {
    // triangle 1-2-3 with tail 3-4: node 4 has degree 1 → peeled at k=2;
    // 3 keeps degree 2 from the triangle and survives
    val graph = g(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)),
      Seq(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"))
    val out = GraphAlgorithms.kCoreSizes(graph, k = 2, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("A" -> 2L, "B" -> 1L))
  }

  test("k-core peeling cascades: a chain dissolves completely") {
    // path 1-2-3-4: ends die first, then the middle — needs 2 rounds
    val graph = g(Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      Seq(1L -> "A", 2L -> "A", 3L -> "A", 4L -> "A"))
    val out = GraphAlgorithms.kCoreSizes(graph, k = 2, iters = 3).collect()
    assert(out.isEmpty)
    // one round is NOT enough — the fixed iteration count is load-bearing
    val partial = GraphAlgorithms.kCoreSizes(graph, k = 2, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(partial === Map("A" -> 2L))
  }

  test("driver-data k-core reaches a fixed point within the unrolled rounds") {
    val graph = graft.graph.TpchGraph(spark, "/root/testdata/sf0.001")
    val at6 = GraphAlgorithms.kCoreSizes(graph, k = 3, iters = 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val at8 = GraphAlgorithms.kCoreSizes(graph, k = 3, iters = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(at6 === at8, "6 peeling rounds must already be the fixed point")
    assert(at6.nonEmpty)
  }
}
