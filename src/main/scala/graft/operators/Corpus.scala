package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.tokenCountEstimate

/** The composed corpus-cleaning pipeline — the end-to-end shape a 100 TB
  * pre-training data run takes, built entirely from this package's
  * operators:
  *
  *   language gate (TextOps.langIdOf) →
  *   quality gate (TextOps.qualityScore) →
  *   exact-dup removal (keep min doc_id per content hash) →
  *   near-dup removal (MinHash+LSH pairs → connected components →
  *     keep each cluster's min doc_id) →
  *   per-source survivor stats.
  *
  * Scale shape: the two gates are narrow codegen'd scans; exact dedup is
  * one hash window; near-dup generation is the banded LSH path (bounded
  * candidates, no all-pairs) over the ALREADY-GATED subset — running LSH
  * after the cheap gates is the right order at scale since the gates
  * typically drop a large fraction of the corpus before the shuffle-heavy
  * stage.
  */
object Corpus {

  /** Survivor counts + token volume per source after the full cleaning
    * pipeline.
    *
    * The gated+exact-deduped corpus is referenced by three downstream
    * branches (LSH signatures, Jaccard verify, final stats) and Spark
    * replans the whole gate subtree per reference — the language/quality
    * expressions are the expensive part, so uncached this pipeline costs
    * 3× its own scan. It is persisted for the duration of the call and the
    * result — a per-source aggregate, ≤ |sources| rows by construction —
    * is materialized eagerly at the operator boundary so the cache can be
    * dropped before returning. */
  def cleanStats(docs: DataFrame, lang: String, minScore: Double,
                 shingleN: Int, numHashes: Int, numBands: Int,
                 threshold: Double): DataFrame = {
    val gated = docs
      .where(TextOps.langIdOf(col("text")) === lang)
      .where(TextOps.qualityScore(col("text")) >= minScore)
    // exact dedup: first (min doc_id) copy of each identical text survives
    val exactKept = gated
      .withColumn("__keeper",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .where(col("doc_id") === col("__keeper"))
      .drop("__keeper")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // near-dup removal over the survivors: every clustered doc except its
      // cluster keeper (the component's min doc_id) is dropped; unclustered
      // docs pass through (left_anti against the drop set)
      val clusters = Dedup.dupClusters(
        Dedup.minhashLsh(exactKept, "doc_id", "text",
          shingleN, numHashes, numBands, threshold))
      val drops = clusters.where(col("doc_id") =!= col("cluster")).select("doc_id")
      val result = exactKept.join(drops, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(tokenCountEstimate(col("text"))).as("total_tokens"))
      val spark = docs.sparkSession
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(result.collect().toSeq.asJava, result.schema)
    } finally exactKept.unpersist(blocking = false)
  }
}
