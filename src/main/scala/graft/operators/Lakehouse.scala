package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance — the MERGE INTO / CDC pair a lakehouse pipeline
  * runs on every ingest cycle: apply a changelog to a snapshot, and derive
  * a changelog by diffing two snapshots.
  *
  * Scale shape: `mergeSnapshot` touches the 100 TB snapshot with exactly
  * one key-partitioned anti-join (the changelog side is the small one —
  * AQE broadcasts it when it fits, which is the common case for an
  * incremental batch); the last-writer-wins window runs on the changelog
  * only, never the snapshot. `snapshotDiff` is one full-outer co-partition
  * join on the key — with both snapshots bucketed by key on disk (see
  * [[graft.sources.Layout]]) it plans shuffle-free. No driver-side state.
  */
object Lakehouse {

  /** Apply a changelog to a snapshot. `changes` carries the snapshot's
    * columns plus `seqCol` (monotone per key: larger = later) and `opCol`
    * ('U'/'I' upserts, 'D' deletes). Per key only the LATEST change
    * applies (ties broken toward delete, making replays idempotent);
    * unchanged snapshot rows pass through untouched. */
  def mergeSnapshot(snapshot: DataFrame, changes: DataFrame,
                    keyCols: Seq[String], seqCol: String,
                    opCol: String): DataFrame = {
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(seqCol).desc,
            when(col(opCol) === "D", 0).otherwise(1))))
      .where(col("_rn") === 1).drop("_rn")
    val kept = snapshot.join(
      latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    kept.unionByName(
      latest.where(col(opCol) =!= "D").drop(seqCol, opCol))
  }

  /** Time-travel read: the table AS OF `version`, reconstructed by folding
    * the first `version` changelog batches over the base snapshot with
    * [[mergeSnapshot]] (version 0 = the base). The log-structured read
    * path of every table format that stores a base + ordered deltas
    * (Delta/Iceberg/Hudi shape): each fold is one anti-join + union, so a
    * k-version read is k incremental merges, never a rewrite. */
  def readVersion(base: DataFrame, logs: Seq[DataFrame], version: Int,
                  keyCols: Seq[String], seqCol: String,
                  opCol: String): DataFrame = {
    require(version >= 0 && version <= logs.size,
      s"version $version outside [0, ${logs.size}]")
    logs.take(version).foldLeft(base)(
      (snap, log) => mergeSnapshot(snap, log, keyCols, seqCol, opCol))
  }

  /** Changelog between two snapshots of the same schema: keys only in
    * `after` → I, only in `before` → D, in both with any non-key column
    * differing (null-safe) → U. Unchanged keys are omitted. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val dataCols = after.columns.filterNot(keyCols.contains).toSeq
    val b = before.select(
      (keyCols.map(col) :+ struct(dataCols.map(col): _*).as("_b")): _*)
    val a = after.select(
      (keyCols.map(col) :+ struct(dataCols.map(col): _*).as("_a")): _*)
    b.join(a, keyCols, "full_outer")
      .withColumn("op",
        when(col("_b").isNull, lit("I"))
          .when(col("_a").isNull, lit("D"))
          .when(!(col("_b") <=> col("_a")), lit("U")))
      .where(col("op").isNotNull)
      .select((keyCols.map(col) :+ col("op")): _*)
  }

  /** Small-file compaction plan: within each partition, files are laid
    * end-to-end in `orderCol` order and a new compacted file is cut every
    * `targetBytes` of running offset (a file lands in the bin containing
    * its START byte — the [[Curation.packChunks]] convention, so no file
    * ever splits). The output is the post-compaction manifest with
    * zone-map columns: per compacted file, input-file count, bytes, and
    * the `orderCol` min/max it would carry — the clustering metadata
    * that keeps post-compaction scans prunable on the sort key.
    *
    * Scale: streaming ingest leaves thousands of KB-scale files per
    * partition; the plan is one keyed window (shuffle on the partition
    * key) plus one groupBy over the FILE MANIFEST — file contents are
    * never read. Rewriting then proceeds per bin, embarrassingly
    * parallel. */
  def compactionPlan(files: DataFrame, partCol: String, orderCol: String,
                     bytesCol: String, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("b", coalesce(col(bytesCol).cast("long"), lit(0L)))
      .withColumn("start_off", sum(col("b")).over(w) - col("b"))
      .withColumn("bin",
        floor(col("start_off") / lit(targetBytes)).cast("long"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum("b").as("bin_bytes"),
        min(col(orderCol)).as("zone_min"),
        max(col(orderCol)).as("zone_max"))
  }
}
