package graft

import graft.operators.Fuzzy

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
}
