package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphXBridge, TpchGraph}

/** Dev harness: DataFrame-native static PageRank vs GraphX — timing and
  * exact-output diff, to decide which implementation backs the driver
  * entry. */
object DevPageRank {

  def dfPageRankTopK(spark: SparkSession, g: graft.graph.PropertyGraph,
                     k: Int, numIter: Int = 5): DataFrame = {
    val edges = g.rels.select(col("src"), col("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).cast("double").as("outdeg"))
    val edgesW = edges.join(deg, "src").persist()
    edgesW.count()
    val verts = g.nodes.select(col("nodeId")).persist()
    val nV = verts.count()
    var ranks = verts.select(col("nodeId"), lit(1.0).as("rank"))
    for (_ <- 1 to numIter) {
      val contribs = edgesW.join(ranks, edgesW("src") === ranks("nodeId"))
        .groupBy(col("dst")).agg(sum(col("rank") / col("outdeg")).as("msum"))
      ranks = verts.join(contribs, verts("nodeId") === contribs("dst"), "left")
        .select(verts("nodeId"),
          (lit(0.15) + lit(0.85) * coalesce(col("msum"), lit(0.0))).as("rank"))
    }
    val total = ranks.agg(sum(col("rank"))).first().getDouble(0)
    val norm = ranks.select(col("nodeId").as("node_id"),
      (col("rank") * lit(nV.toDouble) / lit(total)).as("rank"))
    norm.orderBy(col("rank").desc, col("node_id")).limit(k)
      .select(col("node_id"), round(col("rank"), 4).as("rank"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g = TpchGraph(spark, sfDir)
    GraphXBridge.materialize(spark, g)

    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      GraphXBridge.pageRankTopK(spark, g, 20).count()
      println(f"[gx] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      dfPageRankTopK(spark, g, 20).count()
      println(f"[df] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val gx = GraphXBridge.pageRankTopK(spark, g, 20).collect().map(_.toSeq)
    val df = dfPageRankTopK(spark, g, 20).collect().map(_.toSeq)
    println(s"[diff] identical=${gx.sameElements(df)}")
    if (!gx.sameElements(df))
      gx.zip(df).filter { case (a, b) => a != b }.take(5).foreach(println)
    spark.stop()
  }
}
