package graft

/** Minimal driver-contract smoke: flagship entry row count (> 0) plus a
  * sanity pass that every catalog query plans (analysis succeeds) on the
  * smallest scale factor. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[smoke] entry rows = ${SparkEntry.entry(spark).count()}")
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, sfDir).queryExecution.assertAnalyzed()
    }
    println(s"[smoke] ${SparkEntry.queries.size} queries analyzed OK; " +
      s"${SparkEntry.oracleSql.size} oracles declared")
    spark.stop()
  }
}
