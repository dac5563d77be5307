package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Avro container fidelity: the catalog's `avro_roundtrip` drives
  * [[graft.sources.AvroFiles]] (avro-core DataFileWriter/Reader; Spark
  * ships no spark-avro DataSource). Adversarial strings, nulls, and the
  * full flat type subset must survive; the on-disk bytes must be real
  * Avro object-container files. */
class AvroFilesSpec extends SparkSpec {
  import spark.implicits._

  test("adversarial strings and nulls survive the Avro round trip") {
    val rows = Seq(
      (1L, "src", "en", "plain ascii"),
      (2L, "src", "en", "embedded \"quotes\" and , separator"),
      (3L, "src", "en", "line\nbreak and\ttab"),
      (4L, "src", "en", "café 日本語 Ümläut"),
      (5L, "src", "en", ""),
      (6L, "src", null, "null lang above"))
      .toDF("doc_id", "source", "lang", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-avro-spec").toString
    graft.sources.AvroFiles.write(rows.repartition(3), p)
    val back = graft.sources.AvroFiles.read(spark, p,
      StructType.fromDDL("doc_id LONG, source STRING, lang STRING, text STRING"))
    assert(back.count() === 6)
    assert(rows.exceptAll(back).count() === 0)
    assert(back.exceptAll(rows).count() === 0)
  }

  test("full flat type subset round-trips, including binary and booleans") {
    val schema = StructType.fromDDL(
      "id LONG, n INT, x DOUBLE, flag BOOLEAN, s STRING, b BINARY")
    val data = Seq(
      Row(1L, 7, 2.5, true, "a", Array[Byte](0, 1, -1, 127)),
      Row(2L, null, null, false, null, null),
      Row(null, -3, -0.0, null, "", Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
    val p = java.nio.file.Files.createTempDirectory("graft-avro-types").toString
    graft.sources.AvroFiles.write(df, p)
    val back = graft.sources.AvroFiles.read(spark, p, schema).collect()
      .sortBy(r => if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
    assert(back.length === 3)
    // null id sorts first
    assert(back(0).isNullAt(0) && back(0).getInt(1) === -3 &&
      back(0).getString(4) === "" && back(0).getAs[Array[Byte]](5).isEmpty)
    assert(back(1).getLong(0) === 1L && back(1).getBoolean(3) &&
      back(1).getAs[Array[Byte]](5).sameElements(Array[Byte](0, 1, -1, 127)))
    assert(back(2).getLong(0) === 2L && back(2).isNullAt(1) &&
      back(2).isNullAt(4) && back(2).isNullAt(5))
  }

  test("shards are real Avro object-container files") {
    val rows = Seq((1L, "s", "en", "t")).toDF("doc_id", "source", "lang", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-avro-magic").toString
    graft.sources.AvroFiles.write(rows.coalesce(1), p)
    val files = new java.io.File(p).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val head = java.nio.file.Files.readAllBytes(files.head.toPath)
    // container magic: 'O' 'b' 'j' 0x01 (Avro spec §Object Container Files)
    assert(head.take(4).sameElements(Array[Byte]('O', 'b', 'j', 1)))
    // header metadata carries the writer schema and the deflate codec
    val headStr = new String(head, "ISO-8859-1")
    assert(headStr.contains("avro.schema") && headStr.contains("deflate"))
  }
}
