package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for WebDataset tar shards — the connector rung
  * of Spark's extension surface (`TableProvider` → `Table` → `ScanBuilder`
  * → `Batch`), complementing the expression / optimizer-rule / physical-
  * operator rungs demonstrated elsewhere ([[graft.expr.CosineSimilarity]],
  * [[graft.GraftOptimizations]], [[graft.plans.AsOfJoin]]). Usage:
  *
  * {{{ spark.read.format("graft.sources.v2.TarDataSource").load(dir) }}}
  *
  * Three properties the [[graft.sources.TarShards.read]] composition
  * (binaryFile + mapPartitions) cannot express:
  *
  *  - '''One InputPartition per shard, planned by the source.''' The
  *    engine sees the true task granularity (a shard is the atomic unit of
  *    the WebDataset contract) instead of binaryFile's size-based packing.
  *  - '''Streaming decode.''' Entries parse straight off the
  *    `FSDataInputStream` 512-byte-block structure — a shard is never
  *    materialized as one byte array, so task memory is O(largest entry),
  *    not O(shard size). binaryFile loads the whole shard first.
  *  - '''Column pruning that skips I/O''' (`SupportsPushDownRequiredColumns`):
  *    when `payload` is pruned — every metadata query: sample counts, key
  *    listings, shard audits — the reader `skip()`s each entry's data
  *    blocks entirely and touches only headers: ~0.1% of the bytes of a
  *    real shard. The pruned schema is visible in `explain` like any V2
  *    source's ReadSchema.
  *
  * Schema: (shard string, key string, ext string, size long, payload
  * binary) — `size` comes free from the header, so pruned scans can still
  * aggregate byte totals without reading data blocks.
  *
  * The same table also reads as a STREAM (`spark.readStream.format(...)`):
  * [[TarMicroBatchStream]] turns the shard directory into a continuous
  * ingestion source — each micro-batch is the newly arrived shards under
  * the WebDataset monotone-naming contract, checkpoint-restartable,
  * with the identical reader and pruning path as batch.
  *
  * Reference anchor: WebDataset shard iteration (one tar = one loader
  * task) as used by large-scale training pipelines; the tar byte format
  * is the public POSIX ustar layout, shared with [[graft.sources.TarShards]].
  */
class TarDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TarTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object TarDataSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))
}

private[v2] class TarTable(path: String) extends Table with SupportsRead {
  require(path != null && path.nonEmpty, "graft-tar needs .load(<dir>)")

  override def name(): String = s"graft-tar:$path"
  override def schema(): StructType = TarDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(path)
}

private[v2] class TarScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TarDataSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of schema() in schema order; honoring it
    // exactly is what makes the payload skip legal
    required = requiredSchema

  override def build(): Scan = new TarScan(path, required)
}

private[v2] class TarScan(path: String, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TarMicroBatchStream(path, required)
  override def description(): String =
    s"graft-tar $path cols=${required.fieldNames.mkString(",")}"

  /** Size the scan for the optimizer: archive bytes when payload is read,
    * header bytes when it's pruned — so a pruned shard listing can qualify
    * for broadcast where the full read would not. The pruned estimate is
    * the WORST-CASE header fraction, not an optimistic average: every
    * entry occupies ≥ 1024 archive bytes (512 B header + ≥ 1 data block
    * for any non-empty payload) and a pruned read touches exactly its one
    * 512 B header block, so headers are at most half the archive. Using
    * /2 instead of an average-shaped /8 means a shard of many tiny
    * entries can never be under-estimated into a bad broadcast — at scale,
    * a missed broadcast costs a shuffle; a wrong one costs an OOM. Row
    * count stays unknown (entry counts need a scan). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = shardPartitions
      .map(_.asInstanceOf[TarShardPartition].len).sum
    private val scanned =
      if (required.fieldNames.contains("payload")) bytes
      else math.max(bytes / 2, 512L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(scanned)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }

  // listed ONCE per scan: planning and (possibly repeated) statistics
  // requests reuse it instead of re-listing remote storage
  private lazy val shardPartitions: Array[InputPartition] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards: Array[FileStatus] =
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
    // one partition per shard — the WebDataset task contract; stable order
    shards.sortBy(_.getPath.getName)
      .map(s => TarShardPartition(s.getPath.toString, s.getLen): InputPartition)
  }

  override def planInputPartitions(): Array[InputPartition] = shardPartitions

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.SparkSession.active
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    TarReaderFactory(conf, required.fieldNames)
  }
}

private[v2] case class TarShardPartition(shardPath: String, len: Long)
    extends InputPartition

/** Streaming form of the connector — continuous corpus ingestion, THE
  * arrival pattern for training shards (a crawler or exporter drops
  * `shard-NNNNN.tar` files; the pipeline picks each up exactly once).
  * Offsets are positions in the name-sorted directory listing, which is
  * correct under the WebDataset naming contract (monotone shard names,
  * append-only directory — the writer's `shard-NNNNN-of-MMMMM` names
  * satisfy it); each micro-batch is the slice of newly arrived shards,
  * one InputPartition per shard, same streaming ustar reader and column
  * pruning as the batch path. The offset survives checkpoint restarts
  * through the standard json round-trip, so a restarted query resumes
  * from the committed shard count instead of re-reading the corpus. */
private[graft] case class TarOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"n":$n}"""
}

private[graft] class TarMicroBatchStream(path: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val conf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  // the exact shape TarOffset.json() writes — nothing looser
  private val OffsetShape = """^\{"n":(\d+)\}$""".r

  private def shards(): Array[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
      .sortBy(_.getPath.getName)
  }

  override def initialOffset(): Offset = TarOffset(0)
  override def latestOffset(): Offset = TarOffset(shards().length)
  override def deserializeOffset(json: String): Offset = {
    // a malformed checkpoint must FAIL, not silently restart from 0 and
    // re-ingest the whole directory (breaking exactly-once) — so the
    // parse is anchored to the exact shape TarOffset.json() emits, and
    // the digits are bounded so toInt cannot throw an uncontrolled
    // NumberFormatException on a >9-digit run
    json.trim match {
      case OffsetShape(d) if d.length <= 9 => TarOffset(d.toInt)
      case _ =>
        throw new IllegalStateException(s"corrupt graft-tar offset: $json")
    }
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    shards().slice(start.asInstanceOf[TarOffset].n, end.asInstanceOf[TarOffset].n)
      .map(s => TarShardPartition(s.getPath.toString, s.getLen): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    TarReaderFactory(conf, required.fieldNames)
}

private[v2] case class TarReaderFactory(
    conf: SerializableConfiguration, columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TarPartitionReader(
      partition.asInstanceOf[TarShardPartition], conf, columns)
}

/** Streams one shard: 512-byte ustar headers, payload read only when the
  * `payload` column survived pruning — otherwise `skip()`ed. */
private[v2] class TarPartitionReader(
    part: TarShardPartition, conf: SerializableConfiguration,
    columns: Array[String]) extends PartitionReader[InternalRow] {

  private val BLOCK = 512
  private val needPayload = columns.contains("payload")
  private val shardName = part.shardPath.split('/').last
  private val in = {
    val p = new Path(part.shardPath)
    p.getFileSystem(conf.value).open(p)
  }
  private var row: InternalRow = _
  private var done = false
  // long-name override from an immediately preceding PAX 'x' (path=…
  // record) or GNU 'L' entry — consumed by the next regular entry, so
  // >100-byte names surface un-truncated instead of colliding on their
  // first 100 bytes
  private var pendingPath: String = null

  private def readFully(buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  /** PAX record stream: repeated `"<len> <key>=<value>\n"` where len is
    * the decimal byte length of the WHOLE record including itself. Any
    * malformed record aborts the walk (returning what was found so far
    * stays within the only-regular-entries-surface contract). */
  private def parsePaxPath(buf: Array[Byte]): Option[String] = {
    var i = 0
    var found: Option[String] = None
    while (i < buf.length) {
      var j = i
      var len = 0L
      while (j < buf.length && buf(j) >= '0' && buf(j) <= '9') {
        len = len * 10 + (buf(j) - '0'); j += 1
      }
      if (j >= buf.length || buf(j) != ' ' || len <= 0 ||
        i + len > buf.length || len > Int.MaxValue) return found
      val rec = new String(buf, j + 1, (i + len.toInt) - (j + 1), "UTF-8")
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path")
        found = Some(rec.substring(eq + 1).stripSuffix("\n"))
      i += len.toInt
    }
    found
  }

  private def parseOctal(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    // POSIX permits leading spaces/NULs in numeric fields — skip them
    // (the V1 TarShards parser does the same)
    while (i < off + len && (p(i) == ' ' || p(i) == 0)) i += 1
    while (i < off + len && p(i) != 0 && p(i) != ' ') {
      v = v * 8 + (p(i) - '0'); i += 1
    }
    v
  }

  @annotation.tailrec
  override final def next(): Boolean = {
    if (done) return false
    val hdr = new Array[Byte](BLOCK)
    if (!readFully(hdr) || hdr(0) == 0) { done = true; return false }
    var end = 0
    while (end < 100 && hdr(end) != 0) end += 1
    val name = new String(hdr, 0, end, "UTF-8")
    val size = parseOctal(hdr, 124, 12)
    val padded = ((size + BLOCK - 1) / BLOCK) * BLOCK
    // regular files only (typeflag '0' or NUL): PAX/GNU metadata entries
    // ('x', 'g', 'L', …) must not surface as rows — skip their data and
    // recurse to the next header (the V1 reader filters identically)
    val typeflag = hdr(156)
    if (typeflag == 'x'.toByte || typeflag == 'L'.toByte) {
      // PAX extended header / GNU longname: capture the path override for
      // the next regular entry instead of dropping it (a >1 MiB metadata
      // block is pathological — skip it rather than buffer it)
      if (size > 0 && size <= (1L << 20)) {
        val buf = new Array[Byte](size.toInt)
        if (!readFully(buf)) { done = true; return false }
        in.seek(in.getPos + (padded - size))
        pendingPath =
          if (typeflag == 'L'.toByte) {
            var e = 0
            while (e < buf.length && buf(e) != 0) e += 1
            new String(buf, 0, e, "UTF-8")
          } else parsePaxPath(buf).getOrElse(pendingPath)
      } else {
        // oversized metadata we refuse to buffer: its override is lost, and
        // any earlier pending override must not leak past this entry either
        in.seek(in.getPos + padded)
        pendingPath = null
      }
      next()
    } else if (typeflag != '0'.toByte && typeflag != 0.toByte) {
      // POSIX scopes a PAX 'x' / GNU 'L' override to the IMMEDIATELY
      // following entry; if that entry is non-regular (dir, symlink, 'g')
      // it consumes the override here — it must not attach to a later
      // unrelated regular file
      pendingPath = null
      in.seek(in.getPos + padded)
      next()
    } else {
    require(size <= Int.MaxValue - 8,
      s"tar entry '$name' is ${size} bytes — beyond the supported " +
        "single-entry ceiling (2 GiB); shard the sample instead")
    val payload: Array[Byte] =
      if (needPayload) {
        val buf = new Array[Byte](size.toInt)
        if (!readFully(buf)) { done = true; return false }
        // seek, not skip(): skip can return 0 at EOF (a truncated
        // archive would spin forever)
        in.seek(in.getPos + (padded - size))
        buf
      } else {
        // the pruning win: data blocks are never read
        in.seek(in.getPos + padded)
        null
      }
    val fullName =
      if (pendingPath != null) { val n = pendingPath; pendingPath = null; n }
      else name
    val dot = fullName.indexOf('.')
    val (key, ext) =
      if (dot < 0) (fullName, "")
      else (fullName.substring(0, dot), fullName.substring(dot + 1))
    val values: Array[Any] = columns.map {
      case "shard" => UTF8String.fromString(shardName)
      case "key" => UTF8String.fromString(key)
      case "ext" => UTF8String.fromString(ext)
      case "size" => size
      case "payload" => payload
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
    }
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
