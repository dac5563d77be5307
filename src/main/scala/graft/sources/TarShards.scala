package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shards: each sample is a group of files named
  * `<key>.<ext>` stored contiguously inside plain USTAR tar archives — the
  * de-facto interchange layout for multimodal training corpora (image +
  * caption + metadata triples streamed sequentially). Pure public byte
  * layout (POSIX ustar): 512-byte headers (name@0/100, octal size@124/12,
  * checksum@148/8, typeflag@156, magic "ustar"@257), file data rounded up
  * to 512, archive terminated by two zero blocks. No archive library —
  * fixed-offset arithmetic only, same dependency posture as the Arrow and
  * media decoders.
  *
  * Scale shape: shards are written AND read distributed. On write each
  * Spark partition streams its rows into its own `shard-NNNNN.tar` (no
  * driver materialization, no extra shuffle — the caller picks the
  * partitioning and therefore the shard count/size). On read `binaryFile`
  * yields one task per shard; entries decode lazily per shard. A 100 TB
  * corpus is then N independent shard tasks end-to-end, the exact shape
  * WebDataset training loaders consume.
  *
  * Contract: `key` is everything before the FIRST dot of the entry name,
  * `ext` the remainder (may itself contain dots, e.g. `seg.json`); entry
  * names must fit ustar's 100-byte name field (no prefix-field support —
  * training-data keys are short ids, not paths).
  */
object TarShards {

  private val BLOCK = 512

  // ---- USTAR header ----

  private def octal(v: Long, width: Int): Array[Byte] = {
    // %0(width-1)o + NUL — the classic tar numeric field encoding.
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val pad = width - 1 - s.length
    require(pad >= 0, s"value $v overflows $width-byte octal field")
    var i = 0
    while (i < pad) { b(i) = '0'.toByte; i += 1 }
    s.foreach { c => b(i) = c.toByte; i += 1 }
    b(width - 1) = 0
    b
  }

  private[sources] def entryHeader(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100, s"tar entry name over 100 bytes: $name")
    val h = new Array[Byte](BLOCK)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8)      // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8)        // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8)        // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12)      // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)     // chksum: spaces while summing
    h(156) = '0'.toByte                                // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5) // magic (NUL-terminated)
    h(263) = '0'.toByte; h(264) = '0'.toByte // ustar version "00"
    var sum = 0L
    h.foreach(b => sum += (b & 0xff))
    val c = octal(sum, 7)                              // "%06o\0" then a space
    System.arraycopy(c, 0, h, 148, 7)
    h(155) = ' '.toByte
    h
  }

  private def parseOctal(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (p(i) == ' '.toByte || p(i) == 0)) i += 1
    while (i < end && p(i) >= '0'.toByte && p(i) <= '7'.toByte) {
      v = (v << 3) + (p(i) - '0'.toByte); i += 1
    }
    v
  }

  private def cString(p: Array[Byte], off: Int, max: Int): String = {
    var end = off
    val lim = off + max
    while (end < lim && p(end) != 0) end += 1
    new String(p, off, end - off, "UTF-8")
  }

  /** Iterate (name, payload) over one in-memory tar archive; regular files
    * only (typeflag '0' or NUL), stops at the zero-block terminator. */
  private[sources] def entries(p: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var i = 0
      private var nextEntry: (String, Array[Byte]) = null
      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && i + BLOCK <= p.length) {
          if (p(i) == 0) { i = p.length; return } // zero block: end of archive
          val name = cString(p, i, 100)
          val size = parseOctal(p, i + 124, 12)
          val tf = p(i + 156)
          val dataStart = i + BLOCK
          val dataBlocks = ((size + BLOCK - 1) / BLOCK).toInt
          if (dataStart + size > p.length) { i = p.length; return } // truncated
          if (tf == '0'.toByte || tf == 0)
            nextEntry = (name, java.util.Arrays.copyOfRange(
              p, dataStart, dataStart + size.toInt))
          i = dataStart + dataBlocks * BLOCK
        }
      }
      advance()
      def hasNext: Boolean = nextEntry != null
      def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  // ---- write ----

  /** Write `df` (key: string, ext: string, payload: binary) as WebDataset
    * tar shards under `dir`, one `shard-NNNNN.tar` per Spark partition.
    * Rows already grouped/sorted by key within a partition stay contiguous
    * (the WebDataset sample contract); this function adds no shuffle. */
  def write(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val n = math.max(df.rdd.getNumPartitions, 1)
    val dirStr = dir
    df.select(col("key").cast("string"), col("ext").cast("string"),
        col("payload").cast("binary"))
      .rdd.mapPartitionsWithIndex { (idx, rows) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val shard = new Path(dirStr, f"shard-$idx%05d-of-$n%05d.tar")
        val out = shard.getFileSystem(conf).create(shard, true)
        var written = 0L
        try {
          rows.foreach { r =>
            val payload = r.getAs[Array[Byte]](2)
            val body = if (payload == null) Array.emptyByteArray else payload
            out.write(entryHeader(s"${r.getString(0)}.${r.getString(1)}",
              body.length.toLong))
            out.write(body)
            val rem = body.length % BLOCK
            if (rem != 0) out.write(new Array[Byte](BLOCK - rem))
            written += 1
          }
          out.write(new Array[Byte](2 * BLOCK)) // archive terminator
        } finally out.close()
        Iterator.single(idx -> written)
      }.collect() // tiny: one (idx, count) pair per shard — forces the write
    ()
  }

  // ---- read ----

  private val rowSchema = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Read every `*.tar` under `dir` as (shard, key, ext, payload) rows —
    * one binaryFile task per shard, entries decoded lazily per shard. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(rowSchema)
    val shards = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
    shards.mapPartitions { it =>
      it.flatMap { r =>
        val shardName = r.getString(0).split('/').last
        entries(r.getAs[Array[Byte]](1)).map { case (name, payload) =>
          val dot = name.indexOf('.')
          val (key, ext) =
            if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
          Row(shardName, key, ext, payload)
        }
      }
    }(enc)
  }

  /** The sample view: one row per (shard, key) with an ext→payload map —
    * what a training loader iterates. Keyed within shards only (the
    * WebDataset contract: a sample never spans shards), so the groupBy is
    * per-shard-local in key space even though Spark plans one hash
    * aggregate. */
  def readSamples(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir)
      .groupBy(col("shard"), col("key"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("payload"))))
        .as("parts"))
}
