package graft

/** Dev harness: execute one catalog query and print the POST-execution
  * adaptive plan — the only place AQE runtime artifacts (ReusedExchange /
  * reused ShuffleQueryStage ids, runtime join switches) are visible;
  * `explain` before execution shows isFinalPlan=false without them. */
object DevFinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.warmBucketed(spark, sfDir)
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.collect().length // executes THIS Dataset's plan
    println(s"[finalplan] $name rows=$n")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
}
