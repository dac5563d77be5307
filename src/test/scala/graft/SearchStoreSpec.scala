package graft

import graft.sources.SearchStore
import graft.operators.Search

/** The persisted bucket-partitioned inverted index: probe parity with the
  * in-memory TF-IDF ranker, partition pruning in the probe plan, and the
  * driver-side bucket-hash twin. */
class SearchStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "vector search with a hash join"),
    (2L, "vector vector vector everywhere"),
    (3L, "window functions and a hash table"),
    (4L, "nothing relevant in this one"),
    (5L, "join the window to the vector"))
    .toDF("doc_id", "text")

  test("store probe reproduces the in-memory TF-IDF ranking exactly") {
    val path = java.nio.file.Files.createTempDirectory("searchstore")
      .resolve("index").toString
    SearchStore.write(docs, path, nBuckets = 8)
    val terms = Seq("vector", "hash", "join", "window")
    val direct = Search.tfidfTopK(docs, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val probed = SearchStore.probeTfidf(spark, path, terms, nBuckets = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(probed === direct)
    assert(probed.nonEmpty)
  }

  test("the probe plan prunes bucket partitions") {
    val path = java.nio.file.Files.createTempDirectory("searchstore2")
      .resolve("index").toString
    SearchStore.write(docs, path, nBuckets = 8)
    val plan = SearchStore.probeTfidf(spark, path, Seq("vector"),
      nBuckets = 8, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "probe must be partition-pruned")
    // the store wrote bucket directories
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(dirs.nonEmpty)
  }

  test("driver-side bucket twin matches the engine-side bucket column") {
    val path = java.nio.file.Files.createTempDirectory("searchstore3")
      .resolve("index").toString
    SearchStore.write(docs, path, nBuckets = 8)
    // the hive partition column reads back as INT (directory-name
    // inference) — normalize through toString
    val stored = spark.read.parquet(path)
      .select("term", "bucket").distinct()
      .collect().map(r => r.getString(0) -> r.get(1).toString.toLong).toMap
    stored.foreach { case (term, bucket) =>
      assert(SearchStore.bucketOf(term, 8) === bucket, s"term $term")
    }
  }

  test("append parity: incrementally built store probes like a one-shot build") {
    val oneShot = java.nio.file.Files.createTempDirectory("searchstore4")
      .resolve("index").toString
    SearchStore.write(docs, oneShot, nBuckets = 8)
    val incr = java.nio.file.Files.createTempDirectory("searchstore5")
      .resolve("index").toString
    SearchStore.write(docs.where($"doc_id" <= 2), incr, nBuckets = 8)
    SearchStore.append(docs.where($"doc_id" === 3L), incr, nBuckets = 8)
    SearchStore.append(docs.where($"doc_id" >= 4), incr, nBuckets = 8)
    val terms = Seq("vector", "hash", "join", "window")
    def probe(p: String) = SearchStore.probeTfidf(spark, p, terms,
      nBuckets = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(probe(incr) === probe(oneShot),
      "two appends later, ranking and scores are bit-identical")
    // sidecars merged, not replaced: df reflects the whole corpus
    val df = spark.read.parquet(incr + ".df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("vector") === 3L && df("hash") === 2L)
    assert(spark.read.parquet(incr + ".n").collect().head.getLong(0) === 5L)
  }
}
