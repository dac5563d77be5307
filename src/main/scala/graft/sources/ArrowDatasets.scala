package graft.sources

import java.io.ByteArrayInputStream
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
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
    case other =>
      throw new IllegalArgumentException(s"unsupported arrow type $other")
  }

  private def sparkSchema(s: org.apache.arrow.vector.types.pojo.Schema): StructType =
    StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.getName, sparkType(f.getType, f.getChildren.asScala.toSeq),
        f.isNullable)))

  /** Arrow runtime objects → Spark external row values. */
  private def normalize(v: Any): Any = v match {
    case null => null
    case t: org.apache.arrow.vector.util.Text => t.toString
    case l: java.util.List[_] => l.asScala.toSeq.map(normalize)
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
          Row.fromSeq(vectors.map(v => normalize(v.getObject(i))))).iterator
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
