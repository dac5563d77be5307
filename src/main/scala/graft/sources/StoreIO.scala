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

  /** Trailing commit marker appended to every [[atomicWrite]] payload
    * and stripped on read: a `.new` temp that CARRIES the marker was
    * fully written and closed (a crash mid-write truncates the tail, so
    * the marker is the first thing lost) — the recovery path promotes
    * ONLY validated survivors, never a half-written first write. */
  private val CommitMarker = "\n#graft-commit\n"

  /** Write a small file via temp + OVERWRITING atomic rename: the
    * destination either keeps its old content or carries the new one —
    * never a truncated in-between, and never a WINDOW with neither (a
    * delete-then-rename pair would have one; for a version pointer that
    * window silently resurrects the pre-retrain store). The rename is
    * `FileContext.rename(OVERWRITE)` — one metadata op on HDFS and the
    * local FS alike. File systems without an `AbstractFileSystem`
    * binding fall back to delete+rename, whose crash window
    * [[readRecovering]] repairs from the surviving marker-validated
    * `.new`. Maintenance ops assume a SINGLE writer per store (the
    * manifest's begin/completion protocol); readers may run
    * concurrently — [[readRecovering]] tolerates losing a promotion
    * race. */
  def atomicWrite(fs: org.apache.hadoop.fs.FileSystem,
                  dest: org.apache.hadoop.fs.Path, content: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dest.toString + ".new")
    val out = fs.create(tmp, true)
    try out.write((content + CommitMarker).getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
      fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (fs.exists(dest)) fs.delete(dest, false)
        renameInstall(fs, tmp, dest, content + CommitMarker)
    }
  }

  /** The fallback's install step. A concurrent reader's [[readRecovering]]
    * can promote OUR marker-validated `.new` between the caller's delete
    * and this rename; the new content is then already installed and the
    * failed rename is a LOST RACE, not a failed write — mirror
    * readRecovering's tolerance and verify the payload instead of
    * unconditionally throwing (r12 ADVICE). Package-private so the race's
    * post-promotion state is directly testable. */
  private[graft] def renameInstall(fs: org.apache.hadoop.fs.FileSystem,
                                     tmp: org.apache.hadoop.fs.Path,
                                     dest: org.apache.hadoop.fs.Path,
                                     expected: String): Unit = {
    // a promoted-away tmp surfaces as `false` on HDFS but as
    // FileNotFoundException on the local FS — both are the same lost race
    val renamed =
      try fs.rename(tmp, dest)
      catch { case _: java.io.FileNotFoundException => false }
    if (!renamed) {
      val installed =
        try fs.exists(dest) && readAll(fs, dest) == expected
        catch { case _: java.io.IOException => false }
      require(installed, s"rename $tmp -> $dest failed")
    }
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Strip the commit marker. Files written before the marker existed
    * (or by hand) read back verbatim — the marker is an optional suffix,
    * not a format break. */
  private def stripMarker(s: String): String =
    if (s.endsWith(CommitMarker)) s.dropRight(CommitMarker.length) else s

  /** Read a small file maintained by [[atomicWrite]], repairing the
    * fallback path's crash window first: `dest` missing but a
    * marker-validated `dest.new` present means the payload was fully
    * written and closed and only the rename is outstanding — promote the
    * survivor instead of silently acting as if the file never existed. A
    * `.new` WITHOUT the marker is a half-written first write and is
    * ignored (never deleted — it may be a concurrent writer's open
    * temp). Losing a promotion race to another reader is tolerated: if
    * the rename fails but `dest` has appeared, the winner's copy is
    * read. Returns None only when no valid copy is on disk. */
  def readRecovering(fs: org.apache.hadoop.fs.FileSystem,
                     dest: org.apache.hadoop.fs.Path): Option[String] = {
    val tmp = new org.apache.hadoop.fs.Path(dest.toString + ".new")
    if (!fs.exists(dest) && fs.exists(tmp)) {
      val surviving = try Some(readAll(fs, tmp))
                      catch { case _: java.io.IOException => None }
      surviving match {
        case Some(s) if s.endsWith(CommitMarker) =>
          // validated: promote (or yield to a racing promoter/writer)
          if (!fs.rename(tmp, dest) && !fs.exists(dest))
            throw new IllegalStateException(
              s"recovery rename $tmp -> $dest failed with no winner")
        case _ => () // truncated first write: no committed content exists
      }
    }
    if (!fs.exists(dest)) None
    else Some(stripMarker(readAll(fs, dest)))
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
