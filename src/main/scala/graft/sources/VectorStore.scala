package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.cosineSim
import graft.operators.Vectors

/** Persisted IVF vector index as STORAGE LAYOUT: one hive partition per
  * coarse cell. At 100 TB an ANN index is not an in-memory structure — it
  * is how the embedding table is laid out on disk. Writing each vector
  * into its nearest-centroid partition makes every probe a
  * partition-pruned scan: `WHERE cid IN (<nProbe cells>)` never opens the
  * other `nCentroids − nProbe` directories (PartitionFilters — asserted
  * in VectorStoreSpec), so query cost scales with nProbe/nCentroids of
  * the data, the same pruning fraction [[graft.operators.Vectors.ivfTopK]]
  * gets via its broadcast semi-join but enforced by the FILE LISTING, not
  * a runtime filter.
  *
  * Centroids are the same deterministic seeds as `ivfTopK`
  * (first-nCentroids by id), persisted next to the store so probing never
  * rescans the corpus; results hash-match the unpartitioned IVF oracle.
  */
object VectorStore {

  /** One-time layout write: assign each vector to its nearest centroid and
    * partition the parquet by the cell id; centroids land beside it.
    * `lloydIters = 0` keeps the deterministic first-n-by-id seeds (the
    * `ivfTopK` contract); `lloydIters > 0` refines them with that many
    * unrolled Lloyd rounds ([[Vectors.kmeansCentroids]] — the
    * `ivfKmeansTopK` contract), which balances cell occupancy, so the
    * on-disk partition sizes track the data's cluster structure instead of
    * whichever vectors happened to carry the lowest ids. */
  def writeIvf(emb: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int, path: String, lloydIters: Int = 0): Unit = {
    val vec = col(vecCol).cast("array<double>")
    val v = emb.select(col(idCol).as("id"), vec.as("v"))
    val centroids =
      if (lloydIters == 0)
        emb.orderBy(col(idCol)).limit(nCentroids)
          .select(col(idCol).as("cid"), vec.as("cv"))
      else Vectors.kmeansCentroids(v, nCentroids, lloydIters)
    centroids.write.mode("overwrite").parquet(path + ".centroids")
    Vectors.assignToCentroids(v, centroids)
      .write.mode("overwrite").partitionBy("cid").parquet(path)
  }

  /** Incremental maintenance — the piece that makes the layout viable at
    * 100 TB: new arrivals assign to the PERSISTED centroids (one broadcast
    * join over the batch only) and append into their cell partitions;
    * the corpus is never rescanned, the centroids never move (the
    * frozen-quantizer contract every production IVF store uses between
    * retrains — FAISS `add()` after `train()`), and dynamic partition
    * overwrite semantics are unnecessary because appends only ever add
    * files inside existing `cid=` directories. Probes see old and new
    * vectors identically, since assignment arithmetic is byte-for-byte
    * the write-path arithmetic. */
  def appendIvf(newRows: DataFrame, idCol: String, vecCol: String,
                path: String): Unit = {
    val spark = newRows.sparkSession
    val centroids = spark.read.parquet(path + ".centroids")
    Vectors.assignToCentroids(
        newRows.select(col(idCol).as("id"),
          col(vecCol).cast("array<double>").as("v")),
        centroids)
      .write.mode("append").partitionBy("cid").parquet(path)
  }

  /** Probe: rank cells by centroid similarity (a ≤ nCentroids-row driver
    * decision — the probe list IS tiny by construction), read only those
    * partitions, exact top-k inside. */
  def probeIvf(spark: SparkSession, path: String, idCol: String,
               query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val q = lit(query.toArray)
    val probeCids = spark.read.parquet(path + ".centroids")
      .withColumn("qsim", round(cosineSim(col("cv"), q), 6))
      .orderBy(col("qsim").desc, col("cid"))
      .limit(nProbe)
      .collect().map(_.getLong(0))
    spark.read.parquet(path)
      .where(col("cid").isin(probeCids: _*))
      .withColumn("similarity", round(cosineSim(col("v"), q), 6))
      .orderBy(col("similarity").desc, col("id"))
      .limit(k)
      .select(col("id").as(idCol), col("similarity"))
  }
}
