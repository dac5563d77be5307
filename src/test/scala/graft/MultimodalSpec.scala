package graft

import graft.operators.Multimodal

/** Multimodal plumbing: typed mapPartitions feature extraction. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures decodes per partition with a fixed schema") {
    val docs = Seq((1L, "abc", "web"), (2L, "", "web"), (3L, "xyz!", "pdf"))
      .toDF("doc_id", "text", "source")
    val f = Multimodal.extractFeatures(spark, docs, "doc_id", "text")
      .collect().map(m => m.doc_id -> m).toMap
    assert(f(1L).n_bytes === 3L)
    assert(f(1L).width === 'a'.toInt)   // first byte
    assert(f(1L).height === 'c'.toInt)  // last byte
    assert(f(1L).checksum === 3L * 31 + 'a' + 'c')
    assert(f(2L) === Multimodal.MediaFeature(2L, 0L, 0, 0, 0L))
    assert(f(3L).height === '!'.toInt)
  }

  test("featureStats rolls up per source") {
    val docs = Seq((1L, "abc", "web"), (2L, "de", "web"))
      .toDF("doc_id", "text", "source")
    val r = Multimodal.featureStats(spark, docs).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("total_bytes") === 5L)
  }
}
