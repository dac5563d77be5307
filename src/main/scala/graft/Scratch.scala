package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary plan-audit harness (not part of the driver contract):
  * prints formatted plans for the load-bearing queries so pushdown /
  * broadcast / codegen can be eyeballed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def audit(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    audit("q3_revenue_by_nation")(Queries.q3RevenueByNation(spark, dir))
    audit("j2_onehop")(Queries.j2OneHop(spark, dir))
    audit("v1_cosine_topk")(Queries.v1CosineTopK(spark, dir))
    audit("dedup_minhash_lsh")(Queries.dedupMinhashLsh(spark, dir))
    audit("text_quality")(Queries.textQuality(spark, dir))
    spark.stop()
  }
}
