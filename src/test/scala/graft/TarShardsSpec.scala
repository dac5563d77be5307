package graft

import org.apache.spark.sql.functions._
import graft.sources.TarShards

/** WebDataset tar-shard source/sink. Cross-validated both directions
  * against commons-compress (an independent USTAR implementation on the
  * Spark classpath): our archives parse there, its archives parse here. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-tar-spec").toString

  test("commons-compress parses our writer's archives (names, sizes, bytes)") {
    val dir = tmp()
    val df = Seq(
      ("k1", "txt", "hello tar".getBytes("UTF-8")),
      ("k1", "cls", "en".getBytes("UTF-8")),
      ("k2", "txt", Array.tabulate(1300)(i => (i % 251).toByte))) // >2 blocks
      .toDF("key", "ext", "payload").coalesce(1)
    TarShards.write(df, dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    val in = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.io.FileInputStream(shard))
    try {
      var got = Map.empty[String, Array[Byte]]
      var e = in.getNextEntry
      while (e != null) {
        assert(e.isFile)
        assert(in.canReadEntryData(e), s"unreadable entry ${e.getName}")
        got += e.getName -> in.readAllBytes()
        e = in.getNextEntry
      }
      assert(got.keySet === Set("k1.txt", "k1.cls", "k2.txt"))
      assert(new String(got("k1.txt"), "UTF-8") === "hello tar")
      assert(got("k2.txt").toSeq === Array.tabulate(1300)(i => (i % 251).toByte).toSeq)
    } finally in.close()
  }

  test("our parser reads commons-compress-written archives") {
    val dir = tmp()
    val f = new java.io.File(dir, "ext.tar")
    val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.FileOutputStream(f))
    for ((name, body) <- Seq("a.txt" -> "alpha", "b.json" -> """{"x":1}""")) {
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(name)
      val bytes = body.getBytes("UTF-8")
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    val got = TarShards.read(spark, dir)
      .collect().map(r => r.getString(1) + "." + r.getString(2) ->
        new String(r.getAs[Array[Byte]](3), "UTF-8")).toMap
    assert(got === Map("a.txt" -> "alpha", "b.json" -> """{"x":1}"""))
  }

  test("DSv2 reader skips directory and PAX metadata entries") {
    // a POSIX-format archive with a directory entry and a long name that
    // forces commons-compress to emit an 'x' PaxHeader entry: only the
    // two REGULAR files may surface as rows
    val dir = tmp()
    val f = new java.io.File(dir, "meta.tar")
    val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.FileOutputStream(f))
    out.setLongFileMode(
      org.apache.commons.compress.archivers.tar.TarArchiveOutputStream.LONGFILE_POSIX)
    out.putArchiveEntry(
      new org.apache.commons.compress.archivers.tar.TarArchiveEntry("subdir/"))
    out.closeArchiveEntry()
    val longName = "k" * 120 + ".txt" // > 100 bytes → PAX header entry
    for ((name, body) <- Seq("real.txt" -> "data", longName -> "long")) {
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(name)
      val bytes = body.getBytes("UTF-8")
      e.setSize(bytes.length.toLong)
      out.putArchiveEntry(e)
      out.write(bytes)
      out.closeArchiveEntry()
    }
    out.close()
    val rows = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
      .collect().map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](4), "UTF-8")))
    assert(rows.length === 2, s"metadata entries must not surface: ${rows.toSeq}")
    assert(rows.map(_._3).toSet === Set("data", "long"))
    assert(!rows.exists(_._1.contains("PaxHeader")))
    // the PAX 'path' override must be APPLIED, not just skipped: the
    // >100-byte name surfaces un-truncated (no silent key collisions)
    val longRow = rows.find(_._3 == "long").get
    assert(longRow._1 === "k" * 120, s"PAX path not applied: ${longRow._1}")
    assert(longRow._2 === "txt")
  }

  test("GNU longname ('L') entries are applied to the following file") {
    val dir = tmp()
    val f = new java.io.File(dir, "gnu.tar")
    val out = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.FileOutputStream(f))
    out.setLongFileMode(
      org.apache.commons.compress.archivers.tar.TarArchiveOutputStream.LONGFILE_GNU)
    val longName = "g" * 130 + ".bin"
    val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(longName)
    e.setSize(3L)
    out.putArchiveEntry(e); out.write("gnu".getBytes("UTF-8")); out.closeArchiveEntry()
    out.close()
    val rows = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
      .collect().map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](4), "UTF-8")))
    assert(rows.toSeq === Seq(("g" * 130, "bin", "gnu")))
  }

  test("a path override scopes to the IMMEDIATELY following entry only " +
    "(consumed by a skipped non-regular entry, not a later file)") {
    // hand-built USTAR bytes: commons-compress never emits the malformed
    // sequence under test — GNU 'L' longname, then a DIRECTORY entry (the
    // override's rightful-but-skipped target), then an unrelated regular
    // file which must surface under its OWN header name (POSIX scopes
    // overrides to the immediately following entry; ADVICE r9)
    def hdr(name: String, size: Long, typeflag: Byte): Array[Byte] = {
      val b = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, b, 0, nb.length)
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = ("%0" + (len - 1) + "o").format(v)
        System.arraycopy(s.getBytes("US-ASCII"), 0, b, off, s.length)
      }
      oct(420, 100, 8); oct(0, 108, 8); oct(0, 116, 8)
      oct(size, 124, 12); oct(0, 136, 12)
      b(156) = typeflag
      java.util.Arrays.fill(b, 148, 156, ' '.toByte)
      var sum = 0L; b.foreach(x => sum += x & 0xff)
      val cs = "%06o".format(sum).getBytes("US-ASCII")
      System.arraycopy(cs, 0, b, 148, cs.length)
      b(154) = 0; b(155) = ' '.toByte
      b
    }
    def padded(data: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOf(data, ((data.length + 511) / 512) * 512)
    val dir = tmp()
    val out = new java.io.FileOutputStream(new java.io.File(dir, "scope.tar"))
    val overrideName = "misattributed-long-name.txt".getBytes("UTF-8")
    out.write(hdr("././@LongLink", overrideName.length.toLong, 'L'.toByte))
    out.write(padded(overrideName))
    out.write(hdr("somedir/", 0L, '5'.toByte))          // skipped target
    val body = "plain".getBytes("UTF-8")
    out.write(hdr("plain.txt", body.length.toLong, '0'.toByte))
    out.write(padded(body))
    out.write(new Array[Byte](1024))                     // end-of-archive
    out.close()
    val rows = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
      .collect().map(r => (r.getString(1), r.getString(2),
        new String(r.getAs[Array[Byte]](4), "UTF-8")))
    assert(rows.toSeq === Seq(("plain", "txt", "plain")),
      s"stale override leaked onto an unrelated file: ${rows.toSeq}")
  }

  test("micro-batch offset parse is strict") {
    val ms = new graft.sources.v2.TarMicroBatchStream(tmp(),
      spark.read.format("graft.sources.v2.TarDataSource").load(tmp()).schema)
    assert(ms.deserializeOffset("""{"n":7}""").asInstanceOf[graft.sources.v2.TarOffset].n === 7)
    // foreign-but-digit-bearing, truncated, and overflow shapes must all
    // FAIL (silently restarting from 0 would re-ingest the directory)
    for (bad <- Seq("""{"x":123}""", """{"n":1""", "7", """{"n":12345678901}""",
        """{"n":-3}""", ""))
      assertThrows[IllegalStateException](ms.deserializeOffset(bad))
  }

  test("write/read round trip across multiple partitions") {
    val dir = tmp()
    val rows = (0 until 57).map(i =>
      (f"doc$i%04d", if (i % 2 == 0) "txt" else "bin",
        Array.tabulate(i * 7 % 900)(j => ((i * 31 + j) % 256).toByte)))
    TarShards.write(rows.toDF("key", "ext", "payload").repartition(5), dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".tar")) === 5)
    val back = TarShards.read(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(back === rows.map(t => (t._1, t._2, t._3.toSeq)).toSet)
  }

  test("readSamples groups a sample's entries into an ext→payload map") {
    val dir = tmp()
    TarShards.write(Seq(
      ("s1", "txt", "body".getBytes("UTF-8")),
      ("s1", "meta.json", """{"q":1}""".getBytes("UTF-8")),
      ("s2", "txt", "other".getBytes("UTF-8")))
      .toDF("key", "ext", "payload").coalesce(1), dir)
    val samples = TarShards.readSamples(spark, dir)
      .collect().map(r => r.getString(1) ->
        r.getMap[String, Array[Byte]](2)).toMap
    assert(samples.keySet === Set("s1", "s2"))
    assert(samples("s1").keys.toSet === Set("txt", "meta.json"))
    assert(new String(samples("s1")("meta.json"), "UTF-8") === """{"q":1}""")
  }

  test("DSv2 connector: full read matches TarShards.read row for row") {
    val dir = tmp()
    val rows = (0 until 41).map(i =>
      (f"k$i%04d", if (i % 3 == 0) "txt" else "cls",
        Array.tabulate(i * 11 % 700)(j => ((i * 17 + j) % 256).toByte)))
    TarShards.write(rows.toDF("key", "ext", "payload").repartition(3), dir)
    val v2 = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
    // one InputPartition per shard — the WebDataset task contract
    assert(v2.rdd.getNumPartitions === 3)
    val got = v2.collect().map(r => (r.getString(1), r.getString(2),
      r.getLong(3), r.getAs[Array[Byte]](4).toSeq)).toSet
    val want = rows.map(t => (t._1, t._2, t._3.length.toLong, t._3.toSeq)).toSet
    assert(got === want)
    // composition parity with the binaryFile+mapPartitions reader
    val v1 = TarShards.read(spark, dir)
      .collect().map(r => (r.getString(1), r.getString(2),
        r.getAs[Array[Byte]](3).toSeq)).toSet
    assert(got.map(t => (t._1, t._2, t._4)) === v1)
  }

  test("DSv2 connector: payload pruning reaches the scan, sizes still exact") {
    val dir = tmp()
    val rows = (0 until 20).map(i =>
      (f"k$i%03d", "txt", Array.fill(i * 50)(7.toByte)))
    TarShards.write(rows.toDF("key", "ext", "payload").coalesce(2), dir)
    val pruned = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
      .select("key", "size")
    // the pruned column set must reach the V2 scan (payload never read)
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=key,size"), s"scan not pruned:\n$scanDesc")
    val sizes = pruned.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (k, _, p) => assert(sizes(k) === p.length.toLong) }
    // header-only aggregate equals payload-length aggregate from a full read
    val full = spark.read.format("graft.sources.v2.TarDataSource").load(dir)
      .agg(sum(length(col("payload")).cast("long"))).collect()(0).getLong(0)
    assert(sizes.values.sum === full)
  }

  test("DSv2 streaming: new shards picked up exactly once across restarts") {
    val dir = tmp(); val ckpt = tmp() + "/ck"; val out = tmp() + "/out"
    def writeShard(name: String, rows: Seq[(String, String, Array[Byte])]): Unit = {
      val t = tmp()
      TarShards.write(rows.toDF("key", "ext", "payload").coalesce(1), t)
      val f = new java.io.File(t).listFiles().filter(_.getName.endsWith(".tar")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dir, name))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.v2.TarDataSource")
        .load(dir)
        .select("shard", "key", "size")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeShard("shard-00000.tar", Seq(("a", "txt", "AA".getBytes("UTF-8"))))
    writeShard("shard-00001.tar", Seq(("b", "txt", "BBB".getBytes("UTF-8"))))
    runOnce()
    val r1 = spark.read.parquet(out).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(r1.toSet === Set(("a", 2L), ("b", 3L)))
    // a new shard lands; a RESTARTED query resumes from the committed
    // offset and reads only the arrival — exactly-once per shard
    writeShard("shard-00002.tar", Seq(("c", "txt", "C".getBytes("UTF-8"))))
    runOnce()
    val r2 = spark.read.parquet(out).collect().map(_.getString(1))
    assert(r2.sorted.toSeq === Seq("a", "b", "c"), "each key exactly once")
  }

  test("e2e: streamed shards probe the persisted near-dup index") {
    // the composed continuous-ingestion pipeline: tar shards arrive (the
    // streaming V2 source), their text payloads probe the persisted
    // MinHash band index — the batch near-dup gate running live, with no
    // state store and no corpus rescan
    import graft.operators.Dedup
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val index = Dedup.minhashBandIndex(corpus, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4)
    val dir = tmp()
    TarShards.write(Seq(
        ("doc10", "txt",
          "alpha beta gamma delta epsilon zeta eta theta".getBytes("UTF-8")),
        ("doc11", "txt",
          "totally different words nothing shared here at all".getBytes("UTF-8")))
      .toDF("key", "ext", "payload").coalesce(1), dir)
    val arrivals = spark.readStream
      .format("graft.sources.v2.TarDataSource").load(dir)
      .select(expr("cast(substring(key, 4, 18) as long)").as("doc_id"),
        decode(col("payload"), "UTF-8").as("text"))
    val out = Dedup.streamingProbeNearDups(index, arrivals, "doc_id", "text",
      n = 3, numHashes = 16, numBands = 4, minAgree = 0.5)
    val q = out.writeStream.format("memory").queryName("tar_probe")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("tar_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).distinct
    // the duplicate arrival flags against doc 1 (full signature agreement);
    // the novel arrival passes the gate silently
    assert(rows.toSeq === Seq((10L, 1L, 1.0)))
  }

  test("zero-length payloads and the 100-byte name limit") {
    val dir = tmp()
    TarShards.write(Seq(("empty", "txt", Array.emptyByteArray))
      .toDF("key", "ext", "payload").coalesce(1), dir)
    val back = TarShards.read(spark, dir).collect()
    assert(back.length === 1)
    assert(back.head.getAs[Array[Byte]]("payload").length === 0)
    assertThrows[org.apache.spark.SparkException] {
      TarShards.write(Seq(("k" * 120, "txt", "x".getBytes("UTF-8")))
        .toDF("key", "ext", "payload").coalesce(1), tmp())
    }
  }
}
