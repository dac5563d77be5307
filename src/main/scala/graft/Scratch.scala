package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    (1 to 3).foreach { i =>
      time(s"text_fingerprint #$i")(Queries.textFingerprint(spark, dir).count())
    }
    // after a GraphX pagerank (the suspected interference)
    time("gx_pagerank")(Queries.gxPageRankTopK(spark, dir).count())
    (1 to 3).foreach { i =>
      time(s"post-gx fingerprint #$i")(Queries.textFingerprint(spark, dir).count())
    }
    spark.stop()
  }
}
