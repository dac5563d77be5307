package graft

import org.apache.spark.sql.functions._

/** Dev harness: time walkCorpus stage-by-stage to localize the sf0.1
  * regression (ranked-adjacency build vs per-step joins vs final rollup). */
object DevWalkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.graph.TpchGraph(spark, sfDir)
    g.nodes.count(); g.rels.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val adj = g.bidir.select(col("a"), col("b")).distinct()
    val e = time("bidir distinct count")(adj.count())
    println(s"[probe] edges=$e nodes=${g.nodes.count()}")

    import org.apache.spark.sql.expressions.Window
    val byA = Window.partitionBy(col("a")).orderBy(col("b"))
    val ranked0 = time("ranked0 build+checkpoint") {
      adj.select(col("a"), col("b"),
          (row_number().over(byA) - 1).cast("long").as("rnk"),
          count(lit(1)).over(byA.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)).as("deg"))
        .localCheckpoint(true)
    }
    val degT = ranked0.where(col("rnk") === 0)
      .select(col("a").as("n"), col("deg").as("ndeg"))
    val ranked = time("ranked join+checkpoint") {
      ranked0.as("r").join(degT.as("d"), col("r.b") === col("d.n"))
        .select(col("r.a").as("a"), col("r.b").as("b"),
          col("r.rnk").as("rnk"), col("d.ndeg").as("deg_b"))
        .localCheckpoint(true)
    }
    println(s"[probe] ranked rows=${ranked.count()}")

    val nodes = g.nodes.select(col("nodeId").as("start"), col("nodeId").as("c"))
    var cur = nodes.join(degT, col("c") === col("n"))
      .select(col("start"), col("c"), col("ndeg").as("deg"))
    for (t <- 1 to 3) {
      val h = graft.operators.Dedup.md5Long(concat(
        col("start").cast("string"), lit("_"),
        col("c").cast("string"), lit("_"), lit(t.toString)))
      val picked = cur.select(col("start"), col("c"),
        pmod(h, col("deg")).as("pick"))
      val next = picked.as("p").join(ranked.as("r"),
          col("p.c") === col("r.a") && col("p.pick") === col("r.rnk"))
        .select(col("p.start").as("start"), col("r.b").as("c"),
          col("r.deg_b").as("deg"))
      cur = time(s"step $t join+checkpoint")(next.localCheckpoint(true))
      println(s"[probe] step $t rows=${cur.count()}")
    }
    spark.stop()
  }
}
