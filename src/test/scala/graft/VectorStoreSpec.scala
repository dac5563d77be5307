package graft

import graft.operators.Vectors
import graft.sources.VectorStore

class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    (0L until 64L).map(i => (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }
  private val q = Seq(0.9, 0.1, -0.2, 0.3, 0.0, 0.5, -0.4, 0.2)

  test("partition-pruned probe matches the broadcast-semi-join IVF exactly") {
    val path = java.nio.file.Files.createTempDirectory("ivfstore")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    val pruned = VectorStore.probeIvf(spark, path, "vec_id", q, k = 5,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Vectors.ivfTopK(emb, "vec_id", "embedding", q, k = 5,
        nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned === direct)
    assert(pruned.nonEmpty)
  }

  test("kmeans-layout store matches the unpartitioned kmeans IVF exactly") {
    val path = java.nio.file.Files.createTempDirectory("ivfstorek")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path,
      lloydIters = 2)
    val pruned = VectorStore.probeIvf(spark, path, "vec_id", q, k = 5,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Vectors.ivfKmeansTopK(emb, "vec_id", "embedding", q, k = 5,
        nCentroids = 4, nProbe = 2, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned === direct)
    assert(pruned.nonEmpty)
    // still a partition-pruned scan with the trained layout
    val plan = VectorStore.probeIvf(spark, path, "vec_id", q, k = 5,
      nProbe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "probe must be partition-pruned")
  }

  test("the probe plan prunes partitions: only nProbe cells are listed") {
    val path = java.nio.file.Files.createTempDirectory("ivfstore2")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    val plan = VectorStore.probeIvf(spark, path, "vec_id", q, k = 5,
      nProbe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "probe must be partition-pruned")
    assert(plan.contains("cid#") || plan.contains("cid IN"),
      "the cell id must appear as a partition filter:\n" + plan)
    // the store wrote one directory per cell
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).sorted
    assert(dirs.length === 4, dirs.mkString(","))
  }

  test("rebalance splits hot cells, keeps probe parity, rewrites only " +
    "affected partitions, and records a manifest entry") {
    val path = java.nio.file.Files.createTempDirectory("ivfstore4")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    // skew one cell: a batch of arrivals engineered to land together
    // (tight cluster near the query direction)
    val batch = (2000L until 2040L).map(i =>
      (i, q.map(x => x * 0.95 + (i % 7) * 0.001)))
      .toDF("vec_id", "embedding")
    VectorStore.appendIvf(batch, "vec_id", "embedding", path)
    val before = VectorStore.probeIvf(spark, path, "vec_id", q, k = 10,
        nProbe = 64) // full probe = exact brute force over the store
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dirsBefore = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    val fileTimes = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(d =>
        d.getName -> d.listFiles().map(f =>
          f.getName -> f.lastModified()).toMap).toMap
    val split = VectorStore.rebalanceIvf(spark, path, maxRatio = 1.5,
      lloydIters = 2)
    assert(split.nonEmpty, "the planted hot cell must split")
    // occupancy actually improved: the split cells' halves are each
    // smaller than the pre-split hot cell
    val sizes = spark.read.parquet(path).groupBy("cid").count()
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val dirsAfter = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
    assert(dirsAfter.size === dirsBefore.size + split.size)
    // untouched partitions were not rewritten (same files, same mtimes)
    val untouched = dirsBefore -- split.map(c => s"cid=$c")
    for (d <- untouched) {
      val now = new java.io.File(path, d).listFiles().map(f =>
        f.getName -> f.lastModified()).toMap
      assert(now === fileTimes(d), s"partition $d was rewritten")
    }
    // probe parity: full probe is exact top-k — bit-identical pre/post
    val after = VectorStore.probeIvf(spark, path, "vec_id", q, k = 10,
        nProbe = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "rebalance changed exact probe results")
    // centroid table matches the cells on disk
    val cids = spark.read.parquet(path + ".centroids")
      .collect().map(_.getLong(0)).toSet
    assert(cids === sizes.keySet)
    // manifest records the split
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path + ".manifest")), "UTF-8")
    for (c <- split) assert(manifest.contains(s""""cid":$c"""))
    // idempotence at the same threshold after one pass on this fixture
    val again = VectorStore.rebalanceIvf(spark, path, maxRatio = 1.5,
      lloydIters = 2)
    val after2 = VectorStore.probeIvf(spark, path, "vec_id", q, k = 10,
        nProbe = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after2 === before,
      s"second rebalance (split=$again) broke probe parity")
  }

  test("retrain: new version probes bit-identical to a fresh kmeans build; " +
    "pointer is the commit point; appends follow the new version") {
    val base = java.nio.file.Files.createTempDirectory("ivfstore5")
    val path = base.resolve("emb").toString
    // v0: the frozen-seed layout a long-lived store starts from
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    val v = VectorStore.retrainIvf(spark, path, nCentroids = 4, lloydIters = 2)
    assert(v === 1)
    // same trainer as a fresh kmeans build → bit-identical probes
    val fresh = base.resolve("fresh").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, fresh,
      lloydIters = 2)
    val retrained = VectorStore.probeIvf(spark, path, "vec_id", q, k = 10,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val freshProbe = VectorStore.probeIvf(spark, fresh, "vec_id", q, k = 10,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(retrained === freshProbe)
    assert(retrained.nonEmpty)
    // the pointer names the new version; v0's directory is untouched
    assert(VectorStore.resolve(spark, path) === s"$path.v1")
    assert(new java.io.File(path).listFiles()
      .exists(_.getName.startsWith("cid=")), "v0 data must stay intact")
    // lineage: begin marker + completion entry
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path + ".manifest")), "UTF-8")
    assert(manifest.contains("\"op\":\"retrain-begin\""))
    assert(manifest.contains("\"op\":\"retrain\""))
    // post-retrain appends land in the NEW version
    val batch = Seq((9000L, q.map(_ * 0.99))).toDF("vec_id", "embedding")
    VectorStore.appendIvf(batch, "vec_id", "embedding", path)
    val after = VectorStore.probeIvf(spark, path, "vec_id", q, k = 1,
        nProbe = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(after === Seq(9000L))
    // a second retrain bumps to v2
    assert(VectorStore.retrainIvf(spark, path, nCentroids = 4,
      lloydIters = 2) === 2)
    assert(VectorStore.resolve(spark, path) === s"$path.v2")
    // a RE-INIT is a fresh v0: writeIvf clears the stale pointer, so
    // reads/appends target the rebuilt store, not the old version
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    assert(VectorStore.resolve(spark, path) === path)
    val reinit = VectorStore.probeIvf(spark, path, "vec_id", q, k = 1,
        nProbe = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(reinit.nonEmpty && reinit.head != 9000L) // v1's append is gone
  }

  test("e2e drift-triggered retrain: driftReport flags the drifted batch, " +
    "retrain restores pruned-probe recall") {
    import org.apache.spark.sql.functions._
    import graft.functions.cosineSim
    val path = java.nio.file.Files.createTempDirectory("ivfstore7")
      .resolve("emb").toString
    def unit(x: Double, y: Double, z: Double, w: Double) = Seq(x, y, z, w)
    // base distribution: two tight modes on +e1 and +e3
    val base = ((0L until 24L).map(i => (i, unit(1.0, 0.001 * i, 0, 0))) ++
      (100L until 124L).map(i => (i, unit(0, 0, 1.0, 0.001 * (i - 100)))))
      .toDF("vec_id", "embedding")
    VectorStore.writeIvf(base, "vec_id", "embedding", nCentroids = 2, path,
      lloydIters = 2)
    // a NEW mode halfway between the stale cells: paired tilt magnitudes
    // with alternating SIGN, so consecutive ids rank equally for the mode
    // query but assign to OPPOSITE old cells — the classic stale-quantizer
    // pathology (a drifted mode straddling a cell boundary)
    val drifted = (200L until 224L).map { i =>
      val j = ((i - 200) / 2 + 1).toDouble
      val s = (if (i % 2 == 0) 1 else -1) * 0.02 * j
      (i, unit(0.707 + s, 0, 0.707 - s, 0))
    }.toDF("vec_id", "embedding")
    VectorStore.appendIvf(drifted, "vec_id", "embedding", path)

    // the TRIGGER: per-vector best-centroid-similarity deciles, reference
    // (base) vs the appended batch, through Profile.driftReport — the
    // drifted batch must flag while a same-distribution holdout must not
    def bins(vs: org.apache.spark.sql.DataFrame) = {
      val cents = spark.read.parquet(
        VectorStore.resolve(spark, path) + ".centroids")
      vs.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .crossJoin(broadcast(cents))
        .withColumn("sim", cosineSim(col("v"), col("cv")))
        .groupBy("vec_id").agg(max("sim").as("best"))
        .select(floor(col("best") * 10).as("bin"))
    }
    val holdout = ((50L until 62L).map(i => (i, unit(1.0, 0.001 * i, 0, 0))) ++
      (150L until 162L).map(i => (i, unit(0, 0, 1.0, 0.001 * (i - 150)))))
      .toDF("vec_id", "embedding")
    def rollupL1(cur: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Profile.driftReport(bins(base), bins(cur), col("bin"))
        .where(col("bin") === -1L).select("l1_micro")
        .collect().head.getLong(0)
    val driftedL1 = rollupL1(drifted)
    val holdoutL1 = rollupL1(holdout)
    assert(driftedL1 > 5 * math.max(holdoutL1, 1L),
      s"drifted batch must flag (drifted=$driftedL1 vs holdout=$holdoutL1)")

    // BEFORE retrain: a query in the drifted direction at nProbe=1 sees
    // only one of the two straddled cells — recall loss vs brute force
    val q = unit(0.707, 0, 0.707, 0)
    def ids(nProbe: Int) = VectorStore.probeIvf(spark, path, "vec_id", q,
      k = 10, nProbe = nProbe).collect().map(_.getLong(0)).toSet
    val exact = ids(64)
    assert(exact.forall(_ >= 200L)) // brute force: all drifted-mode vectors
    val prunedBefore = ids(1)
    assert(prunedBefore != exact,
      "the stale quantizer must lose recall at nProbe=1 (mode straddles cells)")

    // the RESPONSE: full retrain re-learns the quantizer over the drifted
    // corpus; the drifted mode no longer straddles a ranking boundary and
    // the same pruned probe recovers the exact top-k (nProbe=2 of 4 cells
    // — still pruning half the store)
    VectorStore.retrainIvf(spark, path, nCentroids = 4, lloydIters = 4)
    assert(ids(2) === exact,
      "after retrain the pruned probe recovers the exact top-k")
  }

  test("rebalance on a corrupt store (empty centroids sidecar) fails clearly") {
    val path = java.nio.file.Files.createTempDirectory("ivfstore6")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    // plant skew so the rebalance reaches the centroid bookkeeping
    val batch = (3000L until 3040L).map(i =>
      (i, q.map(x => x * 0.95 + (i % 7) * 0.001)))
      .toDF("vec_id", "embedding")
    VectorStore.appendIvf(batch, "vec_id", "embedding", path)
    // corrupt: empty the sidecar (checkpoint breaks the read-write cycle)
    spark.read.parquet(path + ".centroids").limit(0).localCheckpoint(true)
      .write.mode("overwrite").parquet(path + ".centroids")
    val err = intercept[IllegalArgumentException](
      VectorStore.rebalanceIvf(spark, path, maxRatio = 1.1))
    assert(err.getMessage.contains("corrupt"))
  }

  test("incremental append: arrivals join their cells, corpus never rescanned") {
    val path = java.nio.file.Files.createTempDirectory("ivfstore3")
      .resolve("emb").toString
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    // an arrival engineered to be the query's nearest neighbor
    val batch = Seq((1000L, q.map(_ * 0.99))).toDF("vec_id", "embedding")
    VectorStore.appendIvf(batch, "vec_id", "embedding", path)
    val got = VectorStore.probeIvf(spark, path, "vec_id", q, k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 === 1000L, s"appended vector must probe first: ${got.toSeq}")
    // probe result ≡ a from-scratch store over corpus ∪ batch with the
    // SAME frozen centroids (seeds come from the original corpus ids, so
    // the quantizer is unchanged — the FAISS add-after-train contract)
    val all = emb.unionByName(batch)
    val direct = Vectors.ivfTopK(all, "vec_id", "embedding", q, k = 3,
        nCentroids = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === direct.toSeq)
    // append created no new cell directories and left the old files alone
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName)
    assert(dirs.length === 4)
  }
}
