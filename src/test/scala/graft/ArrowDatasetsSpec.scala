package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.ArrowDatasets

/** S5 HF-arrow ingestion over the committed fixture (generated with
  * pyarrow stream IPC in the exact `save_to_disk` layout: dataset_dict.json
  * + per-split data-*.arrow shards; schema = the qa_with_retrieved_data
  * type family from SURVEY §1.2). */
class ArrowDatasetsSpec extends SparkSpec {

  private val fixture = "src/test/resources/qa_arrow"

  test("readSplit: schema and row values from stream-IPC shards") {
    val df = ArrowDatasets.readSplit(spark, s"$fixture/train")
    assert(df.schema === StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("question", StringType, nullable = true),
      StructField("answer_ids", ArrayType(LongType, containsNull = true), nullable = true),
      StructField("q_emb", ArrayType(FloatType, containsNull = true), nullable = true))))
    val rows = df.orderBy("id").collect()
    assert(rows.length === 3) // across two record batches
    assert(rows(0).getLong(0) === 0L)
    assert(rows(0).getString(1) === "Which papers is MIT connected to?")
    assert(rows(0).getSeq[Long](2) === Seq(20L, 21L))
    assert(rows(0).getSeq[Float](3) === Seq(1.0f, 0.0f, 0.0f, 0.0f))
    assert(rows(2).getSeq[Long](2) === Seq.empty) // empty list survives
    assert(rows(2).isNullAt(3))                   // null list survives
  }

  test("partial consumption (limit/take) neither hangs nor corrupts rows") {
    // exercises the abandoned-iterator path: the task stops pulling after
    // one row mid-shard, so the reader/allocator close via the
    // task-completion listener rather than exhaustion; a second full read
    // after the partial one must still see every row (fresh per-task
    // decode state, nothing shared or half-consumed)
    val first = ArrowDatasets.readSplit(spark, s"$fixture/train")
      .orderBy("id").take(1)
    assert(first.head.getLong(0) === 0L)
    assert(ArrowDatasets.readSplit(spark, s"$fixture/train").count() === 3L)
  }

  test("writeSplit round-trips the committed fixture exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("arrow_wb").toString
    val src = ArrowDatasets.readSplit(spark, s"$fixture/train")
    ArrowDatasets.writeSplit(src, s"$tmp/train")
    val back = ArrowDatasets.readSplit(spark, s"$tmp/train")
    assert(back.schema === src.schema)
    val a = src.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a === b) // values exact, incl. the empty list and the null list
    // the shard layout is the HF save_to_disk shape readSplit consumes
    val names = new java.io.File(s"$tmp/train").list().sorted.toSeq
    assert(names.count(_.matches("data-\\d{5}-of-\\d{5}\\.arrow")) > 0)
    assert(names.contains("state.json"))
  }

  test("writeDatasetDict round-trips both splits") {
    val tmp = java.nio.file.Files.createTempDirectory("arrow_dd").toString
    val dd = ArrowDatasets.readDatasetDict(spark, fixture)
    ArrowDatasets.writeDatasetDict(dd, tmp)
    val back = ArrowDatasets.readDatasetDict(spark, tmp)
    assert(back.keySet === Set("train", "valid"))
    assert(back("train").orderBy("id").collect().toSeq ===
      dd("train").orderBy("id").collect().toSeq)
    assert(back("valid").collect().toSeq === dd("valid").collect().toSeq)
  }

  test("writeSplit handles every supported scalar and list type") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, "a", 1.5, 2.5f, true, Seq(1L, 2L), Seq("x", "y")),
      (2L, 2, null.asInstanceOf[String], -0.5, 0f, false, Seq.empty[Long], null.asInstanceOf[Seq[String]]))
      .toDF("l", "i", "s", "d", "f", "b", "ll", "ls")
    val tmp = java.nio.file.Files.createTempDirectory("arrow_ty").toString
    ArrowDatasets.writeSplit(df, tmp)
    val back = ArrowDatasets.readSplit(spark, tmp).orderBy("l").collect()
    assert(back(0).getSeq[String](7) === Seq("x", "y"))
    assert(back(1).isNullAt(2) && back(1).isNullAt(7))
    assert(back(1).getSeq[Long](6) === Seq.empty)
    assert(back(0).getDouble(3) === 1.5 && back(0).getFloat(4) === 2.5f)
    assert(back(0).getBoolean(5) === true && back(1).getBoolean(5) === false)
  }

  test("writeSplit round-trips binary and struct columns (HF image shape)") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the datasets-library Image feature is struct<bytes: binary, path:
    // string> — the exact column an image dataset hands a training loader
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("raw", BinaryType, nullable = true),
      StructField("image", StructType(Seq(
        StructField("bytes", BinaryType, nullable = true),
        StructField("path", StringType, nullable = true))), nullable = true)))
    val rows = Seq(
      Row(1L, Array[Byte](1, 2, 3), Row(Array[Byte](9, 8), "a.png")),
      Row(2L, Array.emptyByteArray, Row(null, "b.png")),
      Row(3L, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("arrow_struct").toString
    ArrowDatasets.writeSplit(df, tmp)
    val back = ArrowDatasets.readSplit(spark, tmp)
    assert(back.schema === schema) // nullability survives the arrow header
    val by = back.orderBy("id").collect()
    assert(by(0).getAs[Array[Byte]](1).toSeq === Seq[Byte](1, 2, 3))
    assert(by(0).getStruct(2).getAs[Array[Byte]](0).toSeq === Seq[Byte](9, 8))
    assert(by(0).getStruct(2).getString(1) === "a.png")
    assert(by(1).getAs[Array[Byte]](1).length === 0)
    assert(by(1).getStruct(2).isNullAt(0))
    assert(by(1).getStruct(2).getString(1) === "b.png")
    assert(by(2).isNullAt(1) && by(2).isNullAt(2))
  }

  test("readDatasetDict: splits from dataset_dict.json") {
    val dd = ArrowDatasets.readDatasetDict(spark, fixture)
    assert(dd.keySet === Set("train", "valid"))
    assert(dd("train").count() === 3)
    assert(dd("valid").count() === 1)
    // the ingested split drops straight into the qa pipeline shape
    // (P9 non-empty filter over answer_ids, llm2.py:211)
    assert(dd("train").where(size(col("answer_ids")) > 0).count() === 2)
  }
}
