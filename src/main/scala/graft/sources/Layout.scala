package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-clustering layout: Z-order (Morton-curve) writes.
  *
  * At 100 TB the scan is the query: a filter on (a, b) over data laid out by
  * insertion order reads every file. Sorting by `a` alone prunes `a`-filters
  * but leaves `b`-filters unclustered. Interleaving the bits of both columns
  * into one Morton key and range-partitioning + sorting by it gives every
  * file a tight min/max envelope in BOTH dimensions, so parquet
  * footer stats (file- and row-group-level min/max) prune most files for
  * selective predicates on either or both columns — the standard lakehouse
  * OPTIMIZE ZORDER BY layout, built from plain Spark primitives:
  * one stats aggregate, one `repartitionByRange` on the key, one sorted
  * parquet write. No shuffle beyond the single range exchange.
  */
object Layout {

  /** Morton key over `cols`, each rank-scaled into `bits` bits using the
    * given (min, max) stats. Bits interleave low-to-high across dimensions,
    * so nearby (a, b) pairs get nearby keys. Pure codegen'd integer
    * arithmetic — `bits * cols.size` must fit in a signed Long (≤ 62). */
  def mortonKey(cols: Seq[Column], stats: Seq[(Double, Double)], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 62,
      s"${cols.size} dims × $bits bits must be ≤ 62")
    val maxBucket = (1L << bits) - 1
    val scaled = cols.zip(stats).map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else least(lit(maxBucket), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxBucket.toDouble + 1))
          .cast("long")))
    }
    val terms = for {
      (s, d) <- scaled.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(s, b).bitwiseAND(lit(1L)), b * cols.size + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` to `path` as parquet z-ordered on `zCols`: one tiny min/max
    * aggregate, then `repartitionByRange(numFiles)` + in-partition sort on
    * the Morton key (exactly one file per range ⇒ file min/max envelopes
    * are disjoint along the curve). Returns the key stats used, so tests
    * can recompute keys. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 16): Seq[(Double, Double)] = {
    val aggCols = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val statsRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val stats = zCols.indices.map(i =>
      (statsRow.getDouble(2 * i), statsRow.getDouble(2 * i + 1)))
    val keyed = df.withColumn("__z", mortonKey(zCols.map(col), stats, bits))
    keyed
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    stats
  }

  /** Hilbert key over two columns, each rank-scaled into `bits` bits with
    * the same stats scaling as [[mortonKey]]. The Hilbert curve is
    * continuous (consecutive keys are grid-adjacent), so file envelopes
    * along the curve are tighter than Morton's for the same data — the
    * OPTIMIZE ZORDER alternative lakehouses offer for 2-D clustering. */
  def hilbertKey(xy: (Column, Column), stats: Seq[(Double, Double)],
                 bits: Int): Column = {
    require(stats.size == 2, "hilbertKey is 2-D")
    require(2 * bits <= 62, s"2 × $bits bits must be ≤ 62")
    val maxBucket = (1L << bits) - 1
    val scaled = Seq(xy._1, xy._2).zip(stats).map { case (c, (lo, hi)) =>
      if (hi <= lo) lit(0L)
      else least(lit(maxBucket), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxBucket.toDouble + 1))
          .cast("long")))
    }
    graft.functions.hilbertIndex(scaled(0), scaled(1), bits)
  }

  /** Write `df` to `path` parquet Hilbert-clustered on `hCols` — the same
    * one-stats-aggregate + range-exchange + in-partition-sort shape as
    * [[zorderWrite]], ordered by the continuous curve instead. */
  def hilbertWrite(df: DataFrame, hCols: (String, String), path: String,
                   numFiles: Int, bits: Int = 15): Seq[(Double, Double)] = {
    val cols = Seq(hCols._1, hCols._2)
    val aggCols = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val statsRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val stats = cols.indices.map(i =>
      (statsRow.getDouble(2 * i), statsRow.getDouble(2 * i + 1)))
    val keyed = df.withColumn("__h",
      hilbertKey((col(hCols._1), col(hCols._2)), stats, bits))
    keyed
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
    stats
  }

  /** Hive-style partitioned write: one directory per distinct value of
    * `partCol`. A reader filter on the partition column prunes whole
    * directories at PLANNING time (`PartitionFilters` on the scan node) —
    * zero I/O for pruned partitions, the coarse-grained complement of
    * z-order's footer-stats file skipping (which still lists and opens
    * footers). Partition by low-cardinality routing columns; cluster
    * within partitions by z-order for high-cardinality predicates. */
  def partitionedWrite(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Files of `path` that contain at least one row matching `pred` — the
    * observable clustering quality of a layout (a perfectly clustered
    * selective predicate touches few files; parquet min/max pruning then
    * skips the rest of the scan). */
  def filesTouched(spark: SparkSession, path: String, pred: Column): Long =
    spark.read.parquet(path).where(pred)
      .select(input_file_name()).distinct().count()
}
