package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms expressed as plain DataFrame plans (no GraphX
  * conversion): the right choice when the per-iteration work is a
  * join/aggregate Catalyst can optimize and the iteration count is small
  * and known — unlike PageRank/CC, which run to convergence and are faster
  * on GraphX's specialized Pregel runtime (measured; see GraphXBridge).
  */
object GraphAlgorithms {

  /** k-core decomposition by unrolled peeling: each round recomputes
    * distinct-neighbor degrees over the surviving edge set and removes
    * nodes with degree < k (two semi-joins — the edge payload never
    * widens). A FIXED `iters` rounds keeps the computation deterministic
    * and oracle-expressible; result parity with the oracle holds whether or
    * not peeling has converged (both unroll identically), and the spec
    * asserts a fixed point is actually reached on driver data.
    *
    * Returns per-label counts of nodes still carrying an edge after the
    * final round — the k-core membership report (the web-corpus
    * quality/spam-filter use of k-core).
    */
  def kCoreSizes(g: PropertyGraph, k: Int, iters: Int): DataFrame = {
    var adj = g.bidir.select(col("a"), col("b")).distinct()
    for (_ <- 1 to iters) {
      // each level is referenced three times by the next (degree count +
      // both semi-joins); without truncation the physical plan replicates
      // the subtree 3^iters times — the same blowup the oracle's
      // MATERIALIZED CTEs prevent. Eager localCheckpoint materializes the
      // level once and is GC-cleaned when the frame drops out of scope.
      adj = adj.localCheckpoint(true)
      val alive = adj.groupBy("a").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select(col("a").as("id"))
      adj = adj
        .join(alive.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("id").as("b")), Seq("b"), "left_semi")
    }
    adj.select(col("a")).distinct()
      .join(g.nodes, col("a") === col("nodeId"))
      .groupBy("label").agg(count(lit(1)).as("n_core"))
  }
}
