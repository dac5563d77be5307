package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container files (the Hadoop-ecosystem row format next to
  * the columnar parquet/ORC pair) written and read with the Apache Avro
  * library already on Spark's classpath — Spark ships avro-core for its
  * internals but NOT the `spark-avro` DataSource module, so the
  * source/sink here drives the container format directly: schema-stamped
  * self-describing shards, deflate-compressed blocks, sync markers.
  *
  * Scale shape (same contract as [[TarShards]]): one `part-NNNNN.avro`
  * container per Spark partition on write — no driver materialization, the
  * caller's partitioning picks shard count/size; one binaryFile task per
  * shard on read with blocks decoded lazily inside the task. Avro files
  * are row-major and sync-marker-splittable in principle; shard-per-task
  * is the simpler equivalent when shards are written at bounded size.
  *
  * Column support is the flat interchange subset every roundtrip source
  * here uses: long/int/double/boolean/string/binary, all nullable
  * (union[null, T]).
  */
object AvroFiles {

  /** Avro record schema mirroring a flat Spark schema (nullable unions). */
  private[sources] def avroSchemaJson(schema: StructType): String = {
    var fields = SchemaBuilder.record("GraftRow").namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported Avro interchange type: ${f.name}: $other")
      }
      val union = Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), base))
      fields = fields.name(f.name).`type`(union).withDefault(null)
    }
    fields.endRecord().toString
  }

  /** Write one Avro container file per partition into `dir`. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(p)
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val n = math.max(df.rdd.getNumPartitions, 1)
    val dirStr = dir
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val avroSchema = new Schema.Parser().parse(json)
      val conf = new org.apache.hadoop.conf.Configuration()
      val shard = new Path(dirStr, f"part-$idx%05d-of-$n%05d.avro")
      val out = shard.getFileSystem(conf).create(shard, true)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.setCodec(CodecFactory.deflateCodec(6))
      w.create(avroSchema, out) // writer owns + closes the stream
      var written = 0L
      try {
        rows.foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < sparkSchema.length) {
            val v = if (r.isNullAt(i)) null else sparkSchema(i).dataType match {
              case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
              case _          => r.get(i).asInstanceOf[AnyRef]
            }
            rec.put(i, v)
            i += 1
          }
          w.append(rec)
          written += 1
        }
      } finally w.close()
      Iterator.single(idx -> written)
    }.collect() // tiny: one (idx, count) pair per shard — forces the write
    ()
  }

  /** Read Avro container shards back under the given flat Spark schema —
    * explicit schema like every roundtrip reader here (no inference scan;
    * the embedded writer schema is still what decodes each record, so a
    * field-order change or missing column fails loudly instead of
    * misbinding). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val json = avroSchemaJson(schema)
    val shards = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(dir)
      .select(col("content"))
    shards.mapPartitions { it =>
      val readerSchema = new Schema.Parser().parse(json)
      it.flatMap { r =>
        val reader = DataFileReader.openReader(
          new SeekableByteArrayInput(r.getAs[Array[Byte]](0)),
          new GenericDatumReader[GenericRecord](null, readerSchema))
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(schema.fields.indices.map { i =>
              (rec.get(i), schema(i).dataType) match {
                case (null, _) => null
                case (v, StringType) => v.toString // Utf8 → String
                case (v: java.nio.ByteBuffer, BinaryType) =>
                  val b = new Array[Byte](v.remaining()); v.get(b); b
                case (v, _) => v
              }
            })
          }
        }
      }
    }(enc)
  }
}
