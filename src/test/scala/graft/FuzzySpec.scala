package graft

import graft.operators.Fuzzy
import org.apache.spark.sql.functions.col

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def pairs(names: Seq[String]): Set[(String, String)] =
    Fuzzy.nearNamePairs(names.toDF("name"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet

  test("finds substitution, insertion and deletion neighbors") {
    val out = pairs(Seq("red bolt", "red belt", "red bolts", "rd bolt", "blue gear"))
    assert(out === Set(
      ("red belt", "red bolt"),   // substitution
      ("red bolt", "red bolts"),  // insertion
      ("rd bolt", "red bolt")))   // deletion
  }

  test("verify step rejects distance-2 strings that share a variant") {
    // "xab" and "aby" share deletion variant "ab" but are distance 2
    val out = pairs(Seq("xab", "aby"))
    assert(out.isEmpty)
  }

  test("duplicate input names produce no self-pairs") {
    val out = Fuzzy.nearNamePairs(Seq("same", "same", "sames").toDF("name"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(out === Set(("same", "sames")))
  }

  test("matches brute-force levenshtein<=1 on the driver part names") {
    val names = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select($"p_name".as("name")).distinct()
    val blocked = Fuzzy.nearNamePairs(names)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    val brute = names.as("a").crossJoin(names.as("b"))
      .where(org.apache.spark.sql.functions.expr(
        "a.name < b.name AND levenshtein(a.name, b.name) <= 1"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "fixture should contain at least one near pair")
  }

  test("soundexCode: the classic reference codes") {
    import spark.implicits._
    val got = Seq("robert", "rupert", "tymczak", "pfister", "honeyman",
      "jackson", "lee")
      .toDF("name")
      .select(col("name"), Fuzzy.soundexCode(col("name")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("robert") === "R163")
    assert(got("rupert") === "R163")    // blocks with robert
    assert(got("tymczak") === "T522")   // cz collapse: adjacent same code
    assert(got("pfister") === "P236")   // p,f share code 1 → counted once
    assert(got("jackson") === "J250")   // cks run collapses to one 2
    assert(got("lee") === "L000")       // short word zero-pads
    // h maps to 0 like a vowel under the basic rule: h0 o0 n5 e0 y0 m5 a0 n5
    assert(got("honeyman") === "H555")
  }

  test("soundexBlocks groups phonetic variants into one block") {
    import spark.implicits._
    val blocks = Fuzzy.soundexBlocks(
      Seq("robert", "rupert", "robert", "lee").toDF("name")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(blocks("R163") === ((2L, 3L)))
    assert(blocks("L000") === ((1L, 1L)))
  }
}
