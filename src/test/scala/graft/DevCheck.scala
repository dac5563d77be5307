package graft

/** Dev harness (kept deliberately — documented in the verify skill): dump
  * one catalog query as CSV, or its oracle SQL via DEV_SQL_OUT, for
  * oracle-SQL development. */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val out = if (args.length > 2) args(2) else s"/tmp/dev_$name"
    if (sys.env.contains("DEV_SQL_OUT")) {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.env("DEV_SQL_OUT")), OracleSqls.all(name))
      return
    }
    val spark = Sessions.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
    println(s"[dev] $name rows=${spark.read.option("header", "true").csv(out).count()}")
    spark.stop()
  }
}
