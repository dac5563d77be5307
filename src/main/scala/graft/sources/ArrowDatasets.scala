package graft.sources

import java.io.ByteArrayInputStream
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S5 — HuggingFace `datasets` ingestion (SURVEY §2.1; reference
  * `load_from_disk` at llm1.py:119-124 over `qa/dataset_dict.json` +
  * per-split `data-*.arrow` shards). The on-disk format is Arrow IPC
  * *stream* files (despite the `.arrow` extension), one or more record
  * batches per shard.
  *
  * Scale shape: shards are read DISTRIBUTED — `binaryFile` gives one task
  * per shard, each decoding its batches locally with the Arrow runtime
  * Spark already ships; nothing is collected to the driver except one
  * stream HEADER (schema peek). A 100 TB HF dataset is thousands of
  * ~500 MB shards → thousands of parallel decode tasks, which is exactly
  * how `datasets` itself shards. For repeated analytical access, convert
  * once to parquet (`readSplit(...).write.parquet(...)`) and keep Arrow
  * ingestion at the boundary.
  *
  * Type family supported = the types the reference's QA sets actually use
  * (SURVEY §1.2-1.3): int64/int32, utf8/large_utf8, float32/64, bool, and
  * (large_)lists thereof.
  */
object ArrowDatasets {

  private def sparkType(t: ArrowType, children: Seq[Field]): DataType = t match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case _: ArrowType.Utf8 | _: ArrowType.LargeUtf8 => StringType
    case f: ArrowType.FloatingPoint =>
      if (f.getPrecision == FloatingPointPrecision.DOUBLE) DoubleType else FloatType
    case _: ArrowType.Bool => BooleanType
    case _: ArrowType.List | _: ArrowType.LargeList =>
      val c = children.head
      ArrayType(sparkType(c.getType, c.getChildren.asScala.toSeq), c.isNullable)
    case _: ArrowType.Binary | _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.Struct => StructType(children.map(c =>
      StructField(c.getName, sparkType(c.getType, c.getChildren.asScala.toSeq),
        c.isNullable)))
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  private def sparkSchema(s: org.apache.arrow.vector.types.pojo.Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, sparkType(f.getType, f.getChildren.asScala.toSeq),
        f.isNullable)))

  /** Arrow runtime objects → Spark external row values. Struct values
    * arrive as name→value maps whose iteration order is NOT the schema's,
    * so the Arrow field drives both the descent and the Row field order. */
  private def normalize(v: Any, f: Field): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case m: java.util.Map[_, _] =>
      val mm = m.asInstanceOf[java.util.Map[String, Any]]
      Row.fromSeq(f.getChildren.asScala.toSeq.map(cf =>
        normalize(mm.get(cf.getName), cf)))
    case l: java.util.List[_] =>
      val ef = f.getChildren.asScala.head
      l.asScala.toSeq.map(e => normalize(e, ef))
    case other => other
  }

  /** Lazy per-batch decode: only ONE record batch of boxed rows is
    * resident at a time (plus the shard bytes the binaryFile source
    * already holds) — materializing a whole ~500 MB shard as boxed Rows
    * on top of its byte array would roughly triple per-task memory. The
    * reader/allocator close when the iterator exhausts; the batch's rows
    * must be copied out before `loadNextBatch` overwrites the vectors,
    * which is what the per-batch buffer does. */
  private def decodeStream(bytes: Array[Byte]): Iterator[Row] = {
    // vars, not vals: close() nulls them so the task-completion listener
    // closure stops pinning the reader → ByteArrayInputStream → shard byte
    // array chain after a shard finishes (binaryFile packs several shards
    // per task; a val-capturing listener would keep every finished shard's
    // buffer live until task end — the exact cost this lazy decode avoids)
    var allocator: RootAllocator = new RootAllocator()
    var reader: ArrowStreamReader =
      new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    var closed = false
    // Close quietly: on the decode-failure path the allocator can itself
    // throw ("memory was leaked" after a partial batch load), which must
    // not mask the original corruption error being rethrown.
    def close(): Unit = if (!closed) {
      closed = true
      try reader.close() catch { case _: Exception => () }
      try allocator.close() catch { case _: Exception => () }
      reader = null
      allocator = null
    }
    // Safety net for abandoned iterators (limit/take/downstream failure
    // stops pulling mid-stream and exhaustion-close never runs): close at
    // task end instead of leaking the native allocator for the executor's
    // lifetime. Null TaskContext = driver-side use; exhaustion-close covers
    // it.
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    // the schema header read can itself fail (truncated/empty shard) — it
    // must not leak the just-created reader/allocator
    val root = try reader.getVectorSchemaRoot
      catch { case e: Throwable => close(); throw e }

    new Iterator[Iterator[Row]] {
      // memoized pending batch: hasNext must be idempotent (the Iterator
      // contract allows repeated hasNext before next), so the stream only
      // advances when nothing is buffered
      private var pending: Iterator[Row] = null
      def hasNext: Boolean = {
        if (pending != null) return true
        if (closed) return false
        val more = try reader.loadNextBatch() catch { case e: Throwable => close(); throw e }
        if (!more) { close(); return false }
        val vectors = root.getFieldVectors.asScala.toSeq
        // copy out before the next loadNextBatch overwrites the vectors
        pending = Array.tabulate(root.getRowCount)(i =>
          Row.fromSeq(vectors.map(v =>
            normalize(v.getObject(i), v.getField)))).iterator
        true
      }
      def next(): Iterator[Row] = {
        if (!hasNext) throw new NoSuchElementException("exhausted arrow stream")
        val b = pending; pending = null; b
      }
    }.flatten
  }

  /** Read one split directory (`{split}/data-*.arrow`) as a DataFrame.
    * Schema comes from the first shard's stream header (header-only read);
    * shard decode runs one task per file. */
  def readSplit(spark: SparkSession, dir: String): DataFrame = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.globStatus(new Path(p, "data-*.arrow")).map(_.getPath)
    require(shards.nonEmpty, s"no data-*.arrow shards under $dir")

    val schema = {
      val in = fs.open(shards.head)
      val allocator = new RootAllocator()
      val reader = new ArrowStreamReader(in, allocator)
      try sparkSchema(reader.getVectorSchemaRoot.getSchema)
      finally { reader.close(); allocator.close(); in.close() }
    }
    val rows = spark.read.format("binaryFile")
      .option("pathGlobFilter", "data-*.arrow").load(dir)
      .select("content").rdd
      .flatMap(r => decodeStream(r.getAs[Array[Byte]](0)))
    spark.createDataFrame(rows, schema)
  }

  // ---- write-back (`save_to_disk` emit: stream-IPC shards + JSON) ----

  /** Spark → Arrow schema, the inverse of [[sparkType]] over the same type
    * family. List children use the `item` name `datasets` itself writes. */
  private def arrowField(name: String, t: DataType, nullable: Boolean): Field = t match {
    case LongType => new Field(name,
      new FieldType(nullable, new ArrowType.Int(64, true), null), null)
    case IntegerType => new Field(name,
      new FieldType(nullable, new ArrowType.Int(32, true), null), null)
    case StringType => new Field(name,
      new FieldType(nullable, ArrowType.Utf8.INSTANCE, null), null)
    case DoubleType => new Field(name,
      new FieldType(nullable, new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE), null), null)
    case FloatType => new Field(name,
      new FieldType(nullable, new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE), null), null)
    case BooleanType => new Field(name,
      new FieldType(nullable, ArrowType.Bool.INSTANCE, null), null)
    case ArrayType(et, n) => new Field(name,
      new FieldType(nullable, ArrowType.List.INSTANCE, null),
      Seq(arrowField("item", et, n)).asJava)
    case BinaryType => new Field(name,
      new FieldType(nullable, ArrowType.Binary.INSTANCE, null), null)
    case StructType(fields) => new Field(name,
      new FieldType(nullable, ArrowType.Struct.INSTANCE, null),
      fields.toSeq.map(f => arrowField(f.name, f.dataType, f.nullable)).asJava)
    case other =>
      throw new IllegalArgumentException(s"unsupported spark type $other for arrow write")
  }

  private def arrowSchema(s: StructType): ArrowSchema =
    new ArrowSchema(s.fields.map(f => arrowField(f.name, f.dataType, f.nullable)).toSeq.asJava)

  /** Populate one top-level vector slot from a Spark external value. */
  private def setValue(v: org.apache.arrow.vector.FieldVector, i: Int,
                       t: DataType, value: Any): Unit = {
    import org.apache.arrow.vector._
    if (value == null) { v.setNull(i); return }
    (v, t) match {
      case (x: BigIntVector, _) => x.setSafe(i, value.asInstanceOf[Long])
      case (x: IntVector, _) => x.setSafe(i, value.asInstanceOf[Int])
      case (x: Float8Vector, _) => x.setSafe(i, value.asInstanceOf[Double])
      case (x: Float4Vector, _) => x.setSafe(i, value.asInstanceOf[Float])
      case (x: BitVector, _) => x.setSafe(i, if (value.asInstanceOf[Boolean]) 1 else 0)
      case (x: VarCharVector, _) =>
        x.setSafe(i, value.asInstanceOf[String].getBytes("UTF-8"))
      case (x: VarBinaryVector, _) =>
        x.setSafe(i, value.asInstanceOf[Array[Byte]])
      case (x: complex.StructVector, StructType(fields)) =>
        // HF image/audio columns are structs ({bytes, path}); populate each
        // child at the same index, recursing through this same dispatcher
        x.setIndexDefined(i)
        val row = value.asInstanceOf[Row]
        fields.toSeq.zipWithIndex.foreach { case (f, j) =>
          val child = x.getChild(f.name)
          setValue(child, i, f.dataType, row.get(j))
        }
      case (x: complex.ListVector, ArrayType(et, _)) =>
        // writer-based sparse population: ListVector fills offset holes for
        // skipped (null) positions on setValueCount
        val w = x.getWriter
        w.setPosition(i)
        w.startList()
        value.asInstanceOf[scala.collection.Seq[Any]].foreach {
          case null => w.writeNull()
          case e => et match {
            case LongType => w.bigInt().writeBigInt(e.asInstanceOf[Long])
            case IntegerType => w.integer().writeInt(e.asInstanceOf[Int])
            case DoubleType => w.float8().writeFloat8(e.asInstanceOf[Double])
            case FloatType => w.float4().writeFloat4(e.asInstanceOf[Float])
            case BooleanType => w.bit().writeBit(if (e.asInstanceOf[Boolean]) 1 else 0)
            case StringType =>
              val b = e.asInstanceOf[String].getBytes("UTF-8")
              val buf = x.getAllocator.buffer(b.length)
              try { buf.writeBytes(b); w.varChar().writeVarChar(0, b.length, buf) }
              finally buf.close()
            case other => throw new IllegalArgumentException(
              s"unsupported list element type $other for arrow write")
          }
        }
        w.endList()
      case (x, tt) => throw new IllegalArgumentException(
        s"vector ${x.getClass.getSimpleName} / type $tt mismatch")
    }
  }

  /** Encode a partition of rows as one stream-IPC shard (batched — only
    * `batchSize` rows of vector memory are resident at a time). */
  private def writeShard(out: java.io.OutputStream, schema: StructType,
                         rows: Iterator[Row], batchSize: Int): Long = {
    val allocator = new RootAllocator()
    val root = org.apache.arrow.vector.VectorSchemaRoot.create(arrowSchema(schema), allocator)
    val writer = new ArrowStreamWriter(root, null, java.nio.channels.Channels.newChannel(out))
    var total = 0L
    try {
      writer.start()
      while (rows.hasNext) {
        root.allocateNew()
        var i = 0
        while (rows.hasNext && i < batchSize) {
          val row = rows.next()
          val vectors = root.getFieldVectors.asScala
          var c = 0
          while (c < schema.length) {
            setValue(vectors(c), i, schema(c).dataType, row.get(c))
            c += 1
          }
          i += 1
        }
        root.setRowCount(i)
        total += i
        writer.writeBatch()
      }
      writer.end()
      total
    } finally {
      try writer.close() catch { case _: Exception => () }
      try root.close() catch { case _: Exception => () }
      try allocator.close() catch { case _: Exception => () }
    }
  }

  /** Write one split as HF-layout stream-IPC shards: `data-NNNNN-of-NNNNN
    * .arrow`, one shard per partition, written DISTRIBUTED (each task
    * streams its own partition through a bounded Arrow batch — nothing is
    * collected to the driver), plus the `state.json` a downstream
    * `load_from_disk` consumer expects. The inverse of [[readSplit]]:
    * `readSplit(writeSplit(df, dir)) ≡ df` over the supported type family.
    */
  def writeSplit(df: DataFrame, dir: String, batchSize: Int = 1024): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val n = math.max(df.rdd.getNumPartitions, 1)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val dirStr = dir
    df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      // executor-side default Hadoop config: resolves local and default-FS
      // paths; cluster-specific FS settings would ride in via
      // spark.hadoop.* which the executor conf picks up from core-site
      val conf = new org.apache.hadoop.conf.Configuration()
      val shard = new Path(dirStr, f"data-$idx%05d-of-$n%05d.arrow")
      val out = shard.getFileSystem(conf).create(shard, true)
      val written = try writeShard(out, schema, rows, batchSize) finally out.close()
      Iterator.single(idx -> written)
    }.collect() // tiny: one (idx, count) pair per shard — forces the write
    val dataFiles = (0 until n)
      .map(i => f"""{"filename": "data-$i%05d-of-$n%05d.arrow"}""")
      .mkString("[", ", ", "]")
    val state =
      s"""{
         |  "_data_files": $dataFiles,
         |  "_fingerprint": "graft-${math.abs(dir.hashCode).toHexString}",
         |  "_format_columns": null,
         |  "_format_kwargs": {},
         |  "_format_type": null,
         |  "_output_all_columns": false,
         |  "_split": null
         |}""".stripMargin
    val sOut = fs.create(new Path(p, "state.json"), true)
    try sOut.write(state.getBytes("UTF-8")) finally sOut.close()
  }

  /** Write a DatasetDict: `dataset_dict.json` naming the splits + one
    * subdirectory per split — the layout [[readDatasetDict]] (and HF
    * `load_from_disk`, llm1.py:119-124) consumes. */
  def writeDatasetDict(splits: Map[String, DataFrame], dir: String): Unit = {
    require(splits.nonEmpty, "empty DatasetDict")
    val spark = splits.head._2.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    splits.foreach { case (name, df) =>
      writeSplit(df, new Path(p, name).toString)
    }
    val json = splits.keys.toSeq.sorted
      .map(s => s""""$s"""").mkString("""{"splits": [""", ", ", "]}")
    val out = fs.create(new Path(p, "dataset_dict.json"), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read a `save_to_disk` DatasetDict directory: `dataset_dict.json` names
    * the splits, each split is a subdirectory of shards. */
  def readDatasetDict(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val p = new Path(dir, "dataset_dict.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val splits = """"splits"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"no splits array in $p"))
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    splits.map(s => s -> readSplit(spark, new Path(dir, s).toString)).toMap
  }
}
