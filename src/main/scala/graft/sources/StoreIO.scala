package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durability helpers shared by the persisted-store layouts
  * ([[VectorStore]], [[SearchStore]]): maintenance ops mutate several
  * files (data partitions + sidecars), and a crash between steps must be
  * DETECTABLE and leave every individual artifact whole. Two tools:
  *
  *  - [[appendManifest]]: one JSON line per maintenance action in
  *    `<path>.manifest` — ops append a `*-begin` marker before their first
  *    mutation and a completion entry after the last, so an interrupted op
  *    shows as a begin with no matching completion.
  *  - [[overwriteViaRename]]: sidecar replacement as write-new + swap,
  *    never in place — a crash at any step leaves either the old or the
  *    new copy complete on disk.
  */
object StoreIO {

  /** Append JSON lines to `<path>.manifest` (created on first use).
    * Never rewrites the live file in place: the grown copy lands at
    * `.manifest.new` and renames over — a crash mid-write leaves the old
    * manifest intact, so the recovery markers it carries survive. */
  def appendManifest(spark: SparkSession, path: String,
                     lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + ".manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } else ""
    atomicWrite(fs, p, prior + lines.mkString("", "\n", "\n"))
  }

  /** Write a small file via temp + rename (atomic on any sane FS): the
    * destination either keeps its old content or carries the new one —
    * never a truncated in-between. */
  def atomicWrite(fs: org.apache.hadoop.fs.FileSystem,
                  dest: org.apache.hadoop.fs.Path, content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dest.toString + ".new")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (fs.exists(dest)) fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"rename $tmp -> $dest failed")
  }

  /** Overwrite a parquet dir via write-new + swap: the replacement is
    * fully written to `<dir>.new`, the old dir moves aside, the new one
    * renames in (single metadata ops on any FS with atomic rename), and
    * the old copy is deleted LAST. Rename failures THROW — a swap that
    * did not happen must never report success with the stale copy live. */
  def overwriteViaRename(spark: SparkSession, dir: String,
                         df: DataFrame): Unit = {
    df.write.mode("overwrite").parquet(dir + ".new")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(dir), old),
      s"rename $dir -> $old failed (swap aborted; old copy still live)")
    require(fs.rename(new org.apache.hadoop.fs.Path(dir + ".new"),
        new org.apache.hadoop.fs.Path(dir)),
      s"rename $dir.new -> $dir failed (recover from $old / $dir.new)")
    fs.delete(old, true)
  }
}
