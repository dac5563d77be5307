package graft

/** CSV interchange fidelity: the RFC-4180 write/read options the catalog's
  * `csv_roundtrip` uses (double-quote escaping, quoted empty string,
  * multiLine read) must round-trip embedded quotes, separators, newlines,
  * non-ASCII, and empty vs null — the driver corpus only exercises its own
  * string shapes. */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  test("adversarial strings survive the CSV write+read round trip") {
    val rows = Seq(
      (1L, "src", "en", "plain ascii"),
      (2L, "src", "en", "embedded \"quotes\" and , separator"),
      (3L, "src", "en", "line\nbreak and\ttab"),
      (4L, "src", "en", "café 日本語 Ümläut"),
      (5L, "src", "en", ""),
      (6L, "src", null, "null lang above"))
      .toDF("doc_id", "source", "lang", "text")
    val p = java.nio.file.Files.createTempDirectory("graft-csv-spec").toString
    rows.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("emptyValue", "\"\"")
      .csv(p)
    val back = spark.read
      .schema("doc_id LONG, source STRING, lang STRING, text STRING")
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .option("nullValue", "\u0000")
      .csv(p)
    assert(back.count() === 6)
    assert(rows.exceptAll(back).count() === 0)
    assert(back.exceptAll(rows).count() === 0)
  }
}
