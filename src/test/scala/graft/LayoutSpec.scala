package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Morton-key correctness and the observable clustering win of z-order. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("morton key interleaves bits low-to-high across dimensions") {
    // 2 dims × 2 bits, stats (0,3): scaled value == input value
    val rows = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(Layout.mortonKey(Seq(col("a"), col("b")),
        Seq((0.0, 3.0), (0.0, 3.0)), bits = 2).as("z"))
      .as[Long].collect().toSeq
    // a-bit i → position 2i, b-bit i → position 2i+1
    assert(rows === Seq(0L, 5L, 10L, 15L, 6L))
  }

  test("morton key clamps outliers and degenerate stats") {
    val z = Seq((100L, 5L)).toDF("a", "b")
      .select(Layout.mortonKey(Seq(col("a"), col("b")),
        Seq((0.0, 3.0), (5.0, 5.0)), bits = 2).as("z"))
      .as[Long].head()
    // a clamps to bucket 3 → bits at 0,2; constant b column → bucket 0
    assert(z === 5L)
  }

  test("z-order write clusters 2-D range predicates into few files") {
    val grid = spark.range(100).selectExpr("id AS a")
      .crossJoin(spark.range(100).selectExpr("id AS b"))
    val zdir = java.nio.file.Files.createTempDirectory("graft-z").toString
    Layout.zorderWrite(grid, Seq("a", "b"), zdir, numFiles = 16, bits = 8)

    val pdir = java.nio.file.Files.createTempDirectory("graft-plain").toString
    grid.repartition(16).write.mode("overwrite").parquet(pdir)

    val box = col("a") < 25 && col("b") < 25 // 1/16 of the key space
    // no rows lost by the rewrite
    assert(spark.read.parquet(zdir).count() === 10000L)
    assert(spark.read.parquet(zdir).where(box).count() === 625L)
    // round-robin layout smears the box over every file; z-order confines it
    val zTouched = Layout.filesTouched(spark, zdir, box)
    val pTouched = Layout.filesTouched(spark, pdir, box)
    assert(pTouched >= 12, s"expected smeared baseline, got $pTouched")
    assert(zTouched <= 4, s"expected clustered z-order, got $zTouched")
  }

  test("hive-partitioned write prunes at planning time via PartitionFilters") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
      .toDF("id", "kind", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-hive").toString
    Layout.partitionedWrite(df, "kind", dir)
    val filtered = spark.read.parquet(dir).where(col("kind") === "a")
    // the predicate must land in the scan's partition filters (planning-
    // time pruning), not survive as a data filter
    val scan = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.exists(_.toString.contains("kind")),
      s"kind filter missing from partitionFilters: ${scan.partitionFilters}")
    assert(!scan.dataFilters.exists(_.toString.contains("kind")),
      s"kind filter should not be a data filter: ${scan.dataFilters}")
    // only partition kind=a's on-disk files are read
    def parquetFiles(p: String): Long = {
      val d = new java.io.File(p)
      if (!d.isDirectory) 0L
      else d.listFiles().map(f =>
        if (f.isDirectory) parquetFiles(f.getPath)
        else if (f.getName.endsWith(".parquet")) 1L else 0L).sum
    }
    assert(Layout.filesTouched(spark, dir, col("kind") === "a") ===
      parquetFiles(s"$dir/kind=a"))
    assert(parquetFiles(dir) > parquetFiles(s"$dir/kind=a"))
    assert(filtered.collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("single-dimension predicates also prune under z-order") {
    val grid = spark.range(64).selectExpr("id AS a")
      .crossJoin(spark.range(64).selectExpr("id AS b"))
    val zdir = java.nio.file.Files.createTempDirectory("graft-z1").toString
    Layout.zorderWrite(grid, Seq("a", "b"), zdir, numFiles = 16, bits = 6)
    // a < 8 is 1/8 of the space; the curve keeps it in a minority of files
    val t = Layout.filesTouched(spark, zdir, col("a") < 8)
    assert(t <= 8, s"expected ≤ half the files for a 1/8 slice, got $t")
  }

  test("Hilbert index is a bijection onto 0..4^bits-1") {
    val bits = 3 // 8×8 grid
    val grid = spark.range(8).selectExpr("id AS x")
      .crossJoin(spark.range(8).selectExpr("id AS y"))
    val ds = grid.select(col("x"), col("y"),
      graft.functions.hilbertIndex(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ds.values.toSet === (0L until 64L).toSet)
    // interpreted path agrees with codegen (whole-stage codegen ran above)
    for (((x, y), d) <- ds)
      assert(graft.expr.HilbertIndex.xy2d(bits, x, y) === d)
  }

  test("Hilbert curve is continuous: consecutive keys are grid-adjacent") {
    val bits = 4 // 16×16
    val cells = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield (graft.expr.HilbertIndex.xy2d(bits, x, y), (x, y)))
      .sortBy(_._1).map(_._2)
    cells.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton, by contrast, jumps: it is the reason Hilbert exists
    val mortonJumps = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield ((0 until 4).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum, (x, y)))
      .sortBy(_._1).map(_._2)
      .sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1 }
    assert(mortonJumps > 0)
  }

  test("Hilbert write clusters 2-D range predicates into few files") {
    val grid = spark.range(100).selectExpr("id AS a")
      .crossJoin(spark.range(100).selectExpr("id AS b"))
    val hdir = java.nio.file.Files.createTempDirectory("graft-h").toString
    Layout.hilbertWrite(grid, ("a", "b"), hdir, numFiles = 16, bits = 8)
    val pdir = java.nio.file.Files.createTempDirectory("graft-hplain").toString
    grid.repartition(16).write.mode("overwrite").parquet(pdir)
    val box = col("a") < 25 && col("b") < 25 // 1/16 of the key space
    assert(spark.read.parquet(hdir).count() === 10000L)
    assert(spark.read.parquet(hdir).where(box).count() ===
      grid.where(box).count())
    val clustered = Layout.filesTouched(spark, hdir, box)
    val plain = Layout.filesTouched(spark, pdir, box)
    assert(clustered <= 4, s"hilbert touched $clustered of 16 files")
    assert(plain >= 12, s"random layout should touch most files, got $plain")
  }
}
