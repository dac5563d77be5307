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

  test("sampleFrames: one-to-many decode with even byte windows") {
    val docs = Seq(
      (1L, "abcdefgh"), // 8 bytes → 4 frames of 2
      (2L, "ab"),       // shorter than nFrames → one frame per byte
      (3L, ""))         // empty → no frames
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", "text", nFrames = 4)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).length === 4)
    assert(frames(1L).sortBy(_.frame_no).map(_.offset).toSeq === Seq(0L, 2L, 4L, 6L))
    assert(frames(1L).forall(_.n_bytes === 2))
    // frame 0 checksum = 'a'*31 + 'b'
    assert(frames(1L).find(_.frame_no == 0).get.checksum === 'a'.toLong * 31 + 'b'.toLong)
    assert(frames(2L).length === 2)
    assert(frames(2L).forall(_.n_bytes === 1))
    assert(!frames.contains(3L))
  }

  test("featureStats rolls up per source") {
    val docs = Seq((1L, "abc", "web"), (2L, "de", "web"))
      .toDF("doc_id", "text", "source")
    val r = Multimodal.featureStats(spark, docs).collect().head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("total_bytes") === 5L)
  }
}
