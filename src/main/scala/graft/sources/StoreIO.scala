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
    val prior = readRecovering(fs, p).getOrElse("")
    atomicWrite(fs, p, prior + lines.mkString("", "\n", "\n"))
  }

  /** Write a small file via temp + OVERWRITING atomic rename: the
    * destination either keeps its old content or carries the new one —
    * never a truncated in-between, and never a WINDOW with neither (a
    * delete-then-rename pair would have one; for a version pointer that
    * window silently resurrects the pre-retrain store). The rename is
    * `FileContext.rename(OVERWRITE)` — one metadata op on HDFS and the
    * local FS alike. File systems without an `AbstractFileSystem`
    * binding fall back to delete+rename, whose crash window
    * [[readRecovering]] repairs from the surviving complete `.new`. */
  def atomicWrite(fs: org.apache.hadoop.fs.FileSystem,
                  dest: org.apache.hadoop.fs.Path, content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dest.toString + ".new")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(dest)) fs.delete(dest, false)
        require(fs.rename(tmp, dest), s"rename $tmp -> $dest failed")
    }
  }

  /** Read a small file maintained by [[atomicWrite]], repairing the
    * fallback path's crash window first: `dest` missing but a complete
    * `dest.new` present means the old copy was deleted and the rename
    * never ran — promote the survivor (it was fully written and closed
    * before the old copy was touched) instead of silently acting as if
    * the file never existed. Returns None only when neither copy is on
    * disk. */
  def readRecovering(fs: org.apache.hadoop.fs.FileSystem,
                     dest: org.apache.hadoop.fs.Path): Option[String] = {
    val tmp = new org.apache.hadoop.fs.Path(dest.toString + ".new")
    if (!fs.exists(dest) && fs.exists(tmp))
      require(fs.rename(tmp, dest), s"recovery rename $tmp -> $dest failed")
    if (!fs.exists(dest)) None
    else {
      val in = fs.open(dest)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
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
