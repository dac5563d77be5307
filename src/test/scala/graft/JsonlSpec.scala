package graft

import org.apache.spark.sql.functions._

/** JSONL interchange fidelity: Spark's json sink/source must round-trip
  * the string shapes real corpora contain — embedded quotes, newlines,
  * tabs, non-ASCII, empty strings, and nulls — because the catalog's
  * `jsonl_roundtrip` equality proof only exercises the driver corpus. */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("adversarial strings survive the JSONL write+read round trip") {
    val rows = Seq(
      (1L, "src", "en", "plain ascii"),
      (2L, "src", "en", "embedded \"quotes\" and \\ backslash"),
      (3L, "src", "en", "line\nbreak and\ttab"),
      (4L, "src", "en", "café 日本語 Ümläut"),
      (5L, "src", "en", ""),
      (6L, "src", null, "null lang above"))
      .toDF("doc_id", "source", "lang", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    rows.write.mode("overwrite").json(p)
    val back = spark.read
      .schema("doc_id LONG, source STRING, lang STRING, text STRING")
      .json(p)
    assert(back.count() === 6)
    assert(rows.exceptAll(back).count() === 0)
    assert(back.exceptAll(rows).count() === 0)
    // and the files really are one JSON object per line (independent parse)
    val f = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".json")).head
    val lines = java.nio.file.Files.readAllLines(f.toPath)
    lines.forEach { l =>
      assert(l.startsWith("{") && l.endsWith("}"), s"not a JSON line: $l")
    }
  }
}
