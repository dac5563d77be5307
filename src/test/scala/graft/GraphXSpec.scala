package graft

import graft.graph.GraphXBridge

/** GraphX bridge: degree parity with the bidirected view, iterative algos. */
class GraphXSpec extends SparkSpec {
  private lazy val g = MicroGraph(spark)

  test("degrees match the bidirected edge view (self-loop counts twice)") {
    val d = GraphXBridge.degrees(spark, g).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Int]("degree")).toMap
    // hand-derived: Alice(10): e1,e4,e5,e12 → 4; hub 30: e8,e9,e10 → 3;
    // P-gamma(22): e7,e10,e11 + self-loop e13 ×2 → 5
    assert(d(10L) === 4)
    assert(d(30L) === 3)
    assert(d(22L) === 5)
    // isolated nodes (40,41) don't appear
    assert(!d.contains(40L) && !d.contains(41L))
  }

  test("connected components: Café nodes isolated, rest one component") {
    val sizes = GraphXBridge.componentSizes(spark, g).collect()
      .map(r => r.getAs[Long]("n_nodes") -> r.getAs[Long]("n_components")).toMap
    // 9 connected nodes in one component; 40/41 are edge-less so GraphX
    // drops them from the vertex set built via Graph(vertices, edges)...
    // unless present: Graph keeps all vertices passed in, each its own comp.
    assert(sizes(9L) === 1L)
    assert(sizes(1L) === 2L)
  }

  test("pagerank ranks the hub above leaves") {
    val top = GraphXBridge.pageRankTopK(spark, g, 3).collect()
      .map(_.getAs[Long]("node_id"))
    // hub FieldOfStudy(30) and Paper 20 (cited + written + reviewed) lead
    assert(top.contains(30L))
  }
}
