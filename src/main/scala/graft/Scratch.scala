package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Temporary profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup md5 agg")(docs.select(md5(col("text")).as("m")).groupBy("m").count().count())
    time("shingleSets")(Dedup.shingleSets(docs, "doc_id", "text", 3).count())
    time("shingleSets again")(Dedup.shingleSets(docs, "doc_id", "text", 3).count())
    val wdf = docs.select(col("doc_id"), graft.functions.words(col("text")).as("w"))
    time("words only")(wdf.select(sum(size(col("w")))).count())
    val w = col("w")
    time("A transform elem_at only")(wdf.select(col("doc_id"),
      transform(sequence(lit(0), size(w) - 3), i => element_at(w, i + 1)).as("s"))
      .where(size(col("s")) > 0).count())
    time("B + concat_ws x3")(wdf.select(col("doc_id"),
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))).as("s"))
      .where(size(col("s")) > 0).count())
    val zw = slice(zip_with(zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      slice(w, lit(3), greatest(size(w) - 2, lit(0))),
        (a, b) => concat(a, lit(" "), b)), lit(1), greatest(size(w) - 2, lit(1)))
    time("C zip_with shingles")(wdf.select(col("doc_id"), zw.as("s"))
      .where(size(col("s")) > 0).count())
    time("D C+distinct")(wdf.select(col("doc_id"), array_distinct(zw).as("s"))
      .where(size(col("s")) > 0).count())
    val sh = Dedup.shingleSets(docs, "doc_id", "text", 3).cache()
    sh.count()
    time("explode postings")(sh.select(col("doc_id"), explode(col("shingles")).as("shingle")).count())
    time("minhashSignatures")(Dedup.minhashSignatures(sh, 16).count())
    val sig = Dedup.minhashSignatures(sh, 16).cache(); sig.count()
    time("lshCandidatePairs")(Dedup.lshCandidatePairs(sig, 16, 4).count())
    val cand = Dedup.lshCandidatePairs(sig, 16, 4).cache(); cand.count()
    time("jaccardVerify")(Dedup.jaccardVerify(cand, sh, 0.5).count())
    val posts = sh.select(col("doc_id"), explode(col("shingles")).as("shingle")).cache()
    posts.count()
    time("posts self-join+agg") {
      posts.as("x").join(posts.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
        .agg(count(lit(1)).as("inter")).count()
    }
    time("full ngramJaccard")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    time("full minhashLsh")(Dedup.minhashLsh(docs, "doc_id", "text", 3, 16, 4, 0.5).count())
    spark.stop()
  }
}
