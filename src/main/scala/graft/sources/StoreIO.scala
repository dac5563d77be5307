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

  /** Append JSON lines to `<path>.manifest` (created on first use). */
  def appendManifest(spark: SparkSession, path: String,
                     lines: Seq[String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + ".manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } else ""
    val out = fs.create(p, true)
    try out.write((prior + lines.mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close()
  }

  /** Overwrite a parquet dir via write-new + swap: the replacement is
    * fully written to `<dir>.new`, the old dir moves aside, the new one
    * renames in (single metadata ops on any FS with atomic rename), and
    * the old copy is deleted LAST. */
  def overwriteViaRename(spark: SparkSession, dir: String,
                         df: DataFrame): Unit = {
    df.write.mode("overwrite").parquet(dir + ".new")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    fs.rename(new org.apache.hadoop.fs.Path(dir), old)
    fs.rename(new org.apache.hadoop.fs.Path(dir + ".new"),
      new org.apache.hadoop.fs.Path(dir))
    fs.delete(old, true)
  }
}
