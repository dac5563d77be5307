package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Temporary plan/profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val ngram = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
    ngram.count()
    val plan = ngram.queryExecution.executedPlan.toString
    println("[scratch] ngram ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(plan).length)
    println("[scratch] ngram Scan parquet count: " +
      "Scan parquet".r.findAllIn(plan).length)
    println("[scratch] ngram Exchange count: " +
      "Exchange".r.findAllIn(plan).length)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    (1 to 2).foreach { i =>
      time(s"ngram #$i")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
      time(s"minhash #$i")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    }
    val posts = Dedup.hashedPostings(Dedup.shingleSets(docs, "doc_id", "text", 3))
    time("posts only")(posts.count())
    time("posts again")(posts.count())
    val lists = posts.groupBy("h").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    time("lists")(lists.count())
    val pairs = lists.select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          y => struct(x.as("id1"), y.as("id2")))))).as("p"))
      .select(col("p.id1"), col("p.id2"))
    time("pairs")(pairs.count())
    time("common")(pairs.groupBy("id1","id2").agg(count(lit(1))).count())
    time("sizes")(posts.groupBy("doc_id").agg(count(lit(1))).count())
    spark.stop()
  }
}
