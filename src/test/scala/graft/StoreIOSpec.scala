package graft

import graft.sources.{StoreIO, VectorStore}
import org.apache.hadoop.fs.Path

/** Durability semantics of the small-file layer under the persisted
  * stores (round-12 ADVICE fix): atomicWrite must never leave a window
  * with NEITHER copy on disk, and reads must recover the fallback
  * path's crash window (dest deleted, complete `.new` survivor) instead
  * of silently treating the file as absent — for the VectorStore version
  * pointer that silence would resurrect the pre-retrain store. */
class StoreIOSpec extends SparkSpec {

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val Marker = "\n#graft-commit\n"

  private def write(p: Path, s: String): Unit = {
    val out = fs(p).create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  test("atomicWrite overwrites in place with no .new residue") {
    val dir = java.nio.file.Files.createTempDirectory("storeio1")
    val dest = new Path(dir.resolve("ptr").toString)
    StoreIO.atomicWrite(fs(dest), dest, "v1")
    StoreIO.atomicWrite(fs(dest), dest, "v2")
    assert(StoreIO.readRecovering(fs(dest), dest) === Some("v2"))
    // the overwrite-rename consumed the temp — no stale survivor that a
    // LATER crash recovery could mistake for newer content
    assert(!fs(dest).exists(new Path(dest.toString + ".new")))
  }

  test("readRecovering promotes a COMMITTED .new survivor before reading") {
    val dir = java.nio.file.Files.createTempDirectory("storeio2")
    val dest = new Path(dir.resolve("ptr").toString)
    val tmp = new Path(dest.toString + ".new")
    // simulate the delete+rename fallback's crash window: the new copy
    // was fully written and closed (commit marker intact), the old copy
    // deleted, the rename never ran — dest missing, survivor complete
    write(tmp, "recovered" + Marker)
    assert(!fs(dest).exists(dest))
    assert(StoreIO.readRecovering(fs(dest), dest) === Some("recovered"))
    // the recovery is durable: promoted on disk, survivor consumed
    assert(fs(dest).exists(dest))
    assert(!fs(dest).exists(tmp))
    // absent entirely → None (no phantom recovery)
    val other = new Path(dir.resolve("none").toString)
    assert(StoreIO.readRecovering(fs(other), other) === None)
  }

  test("readRecovering NEVER promotes a truncated first write") {
    val dir = java.nio.file.Files.createTempDirectory("storeio2b")
    val dest = new Path(dir.resolve("ptr").toString)
    val tmp = new Path(dest.toString + ".new")
    // a crash mid-write of the very FIRST atomicWrite: dest never
    // existed and the temp is truncated (no commit marker) — promoting
    // it would durably corrupt the pointer; it must read as absent
    write(tmp, "/data/emb.v") // cut mid-path
    assert(StoreIO.readRecovering(fs(dest), dest) === None)
    assert(!fs(dest).exists(dest), "truncated temp must not be promoted")
    // and the temp is left alone (it may be a live writer's open file)
    assert(fs(dest).exists(tmp))
  }

  test("resolve recovers the version pointer from the crash window " +
    "instead of falling back to v0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("storeio3")
    val path = dir.resolve("emb").toString
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 31 + d).toDouble).toSeq))
      .toDF("vec_id", "embedding")
    VectorStore.writeIvf(emb, "vec_id", "embedding", nCentroids = 4, path)
    assert(VectorStore.retrainIvf(spark, path, nCentroids = 4) === 1)
    val ptr = new Path(path + ".current")
    val target = StoreIO.readRecovering(fs(ptr), ptr).get
    // reopen the window: pointer deleted, committed survivor left behind
    write(new Path(ptr.toString + ".new"), target + Marker)
    fs(ptr).delete(ptr, false)
    assert(VectorStore.resolve(spark, path) === s"$path.v1",
      "a crash inside the pointer flip must not resurrect v0")
    // and the recovery healed the pointer for every later reader
    assert(fs(ptr).exists(ptr))
  }

  test("fallback install tolerates losing the promotion race (r12 ADVICE)") {
    val dir = java.nio.file.Files.createTempDirectory("storeio5")
    val dest = new Path(dir.resolve("ptr").toString)
    val tmp = new Path(dest.toString + ".new")
    // the documented concurrent-reader race: between the writer's delete
    // and rename, a reader's readRecovering promoted the marker-validated
    // .new — at the writer's rename, tmp is GONE and dest already carries
    // the new payload. The failed rename must read as success.
    write(dest, "v2" + Marker)
    assert(!fs(dest).exists(tmp))
    graft.sources.StoreIO.renameInstall(fs(dest), tmp, dest, "v2" + Marker)
    assert(StoreIO.readRecovering(fs(dest), dest) === Some("v2"))
    // but a failed rename with the WRONG (or no) payload still throws —
    // the tolerance is payload-verified, never blind
    val bad = new Path(dir.resolve("bad").toString)
    write(bad, "stale" + Marker)
    intercept[IllegalArgumentException](graft.sources.StoreIO.renameInstall(
      fs(bad), new Path(bad.toString + ".new"), bad, "v9" + Marker))
    val gone = new Path(dir.resolve("gone").toString)
    intercept[IllegalArgumentException](graft.sources.StoreIO.renameInstall(
      fs(gone), new Path(gone.toString + ".new"), gone, "v9" + Marker))
    // and the normal path still renames the temp in
    val ok = new Path(dir.resolve("ok").toString)
    write(new Path(ok.toString + ".new"), "v3" + Marker)
    graft.sources.StoreIO.renameInstall(
      fs(ok), new Path(ok.toString + ".new"), ok, "v3" + Marker)
    assert(StoreIO.readRecovering(fs(ok), ok) === Some("v3"))
  }

  test("appendManifest keeps prior lines across the crash window") {
    val dir = java.nio.file.Files.createTempDirectory("storeio4")
    val path = dir.resolve("store").toString
    StoreIO.appendManifest(spark, path, Seq("""{"op":"a"}"""))
    val m = new Path(path + ".manifest")
    // window: manifest deleted, committed grown copy survives at .new
    val grown = StoreIO.readRecovering(fs(m), m).get + """{"op":"b"}""" + "\n"
    write(new Path(m.toString + ".new"), grown + Marker)
    fs(m).delete(m, false)
    StoreIO.appendManifest(spark, path, Seq("""{"op":"c"}"""))
    val all = StoreIO.readRecovering(fs(m), m).get
    assert(all === """{"op":"a"}""" + "\n" + """{"op":"b"}""" + "\n" +
      """{"op":"c"}""" + "\n")
  }
}
