package graft

/** Dev harness: time one (or more, comma-separated) catalog queries with
  * the SAME protocol as Bench — warmed session, graph pre-loaded (LOAD
  * stage), interleaved passes, per-query localCheckpoint blocks freed at
  * query end — so single-query timings are comparable to the driver's
  * bench medians without a 138-query run. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("md5(cast(id as string)) m")
      .groupBy("m").count().count()
    val g = graft.graph.TpchGraph(spark, sfDir)
    g.nodes.count(); g.rels.count()
    graft.graph.GraphXBridge.materialize(spark, g)
    val loadRdds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val timings = collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to runs; name <- names) {
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      timings(name) = t :: timings.getOrElse(name, Nil)
      for ((id, rdd) <- spark.sparkContext.getPersistentRDDs
           if !loadRdds.contains(id)) rdd.unpersist(blocking = false)
    }
    for (name <- names) {
      val ok = timings(name).sorted
      println(f"[time] $name min=${ok.head}%.2f median=${ok(ok.length / 2)}%.2f max=${ok.last}%.2f over $runs runs")
    }
    spark.stop()
  }
}
