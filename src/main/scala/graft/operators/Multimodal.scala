package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed feature extraction via `mapPartitions` —
  * the JVM analog of a `mapInPandas` batch UDF: executor-side, batched by
  * partition, fixed output schema, no driver collect.
  *
  * The decode itself is a STUB (`decodeStub` — media codecs are not in this
  * environment): it deterministically derives "width/height/checksum" from
  * the payload bytes, standing in for a real thumbnail/resample/frame-sample
  * step. Everything around it — the binary column handling, the typed
  * `Dataset[MediaFeature]` encoder, the per-partition batch shape, the
  * partition-preserving plan — is the real, tested contract a production
  * decoder drops into.
  */
object Multimodal {

  final case class MediaFeature(doc_id: Long, n_bytes: Long,
                                width: Int, height: Int, checksum: Long)

  /** STUB decoder: a real implementation would parse the container format
    * and decode frames per batch (amortizing codec init per partition —
    * exactly why this is mapPartitions, not a per-row UDF). */
  def decodeStub(payload: Array[Byte]): MediaFeature = {
    val n = payload.length
    val first = if (n > 0) payload(0) & 0xff else 0
    val last = if (n > 0) payload(n - 1) & 0xff else 0
    MediaFeature(0L, n.toLong, first, last, n.toLong * 31L + first + last)
  }

  /** Feature extraction over (doc_id, payload) — one decoder instantiation
    * per partition, streamed through without materializing the partition. */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
                      idCol: String, payloadCol: String): Dataset[MediaFeature] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec handles, model weights)
        it.map { case (id, payload) => decodeStub(payload).copy(doc_id = id) }
      }
  }

  final case class FrameSample(doc_id: Long, frame_no: Int,
                               offset: Long, n_bytes: Int, checksum: Long)

  /** Frame sampling — the one-to-many decode shape (video → k frames,
    * audio → k windows): each payload fans out to `nFrames` evenly spaced
    * byte windows, decoded per partition (flatMap inside mapPartitions, so
    * codec init amortizes and output stays a fixed-schema typed Dataset).
    * The per-frame "decode" is the same honest stub as [[decodeStub]]
    * (rolling checksum over the window); a real frame decoder drops into
    * the window loop. Payloads shorter than `nFrames` emit one frame per
    * byte; empty payloads emit none. */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   idCol: String, payloadCol: String,
                   nFrames: Int): Dataset[FrameSample] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val n = p.length
          val k = math.min(nFrames, n)
          (0 until k).iterator.map { f =>
            val off = f.toLong * n / k
            val end = ((f + 1).toLong * n / k).toInt
            var sum = 0L
            var i = off.toInt
            while (i < end) { sum = sum * 31L + (p(i) & 0xff); i += 1 }
            FrameSample(id, f, off, end - off.toInt, sum)
          }
        }
      }
  }

  /** Per-source rollup of the extracted features (the oracle-checkable
    * driver query; joins features back to metadata). */
  def featureStats(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, docs, "doc_id", "text").toDF()
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_bytes").as("total_bytes"),
        sum("checksum").as("checksum_sum"),
        round(avg(col("width").cast("double")), 6).as("avg_first_byte"))
}
