package graft

import graft.operators.Blocklist
import graft.operators.Blocklist.AhoCorasick

/** Aho–Corasick automaton correctness (classic fixtures + randomized
  * brute-force equivalence under the leftmost-non-overlapping-per-pattern
  * convention) and the distributed scan rollup. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: per-pattern indexOf stepping — the replace() semantics. */
  private def brute(text: String, patterns: Seq[String]): Array[Long] =
    patterns.map { p =>
      var n = 0L; var from = 0
      var i = text.indexOf(p, from)
      while (i >= 0) { n += 1; from = i + p.length; i = text.indexOf(p, from) }
      n
    }.toArray

  test("classic she/he/his/hers fixture: suffix outputs all fire") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = new AhoCorasick(pats)
    // "ushers": she @1, he @2 (suffix of she), hers @2
    assert(ac.countMatches("ushers").toSeq === Seq(1L, 1L, 0L, 1L))
    assert(ac.countMatches("his house").toSeq === brute("his house", pats).toSeq)
  }

  test("self-overlapping pattern counts leftmost non-overlapping") {
    val ac = new AhoCorasick(Seq("aa"))
    assert(ac.countMatches("aaa").head === 1L)
    assert(ac.countMatches("aaaa").head === 2L)
    assert(ac.countMatches("aabaa").head === 2L)
  }

  test("randomized brute-force equivalence on a small alphabet") {
    val rnd = new scala.util.Random(11)
    val pats = Seq("ab", "aba", "ba", "bb", "abab", "b")
    val ac = new AhoCorasick(pats)
    for (_ <- 0 until 200) {
      val t = Seq.fill(rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b')
        .mkString
      assert(ac.countMatches(t).toSeq === brute(t, pats).toSeq, s"text '$t'")
    }
  }

  test("the automaton scan lifts to Structured Streaming statelessly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ac = new AhoCorasick(Seq("bad phrase", "worse"))
    val stream = MemoryStream[(Long, String)]
    // the same per-row scan as scanStats, as a streaming filter stage:
    // route documents with any hit to quarantine (ingest-time policy)
    val flagged = stream.toDF().toDF("doc_id", "text")
      .map { r =>
        (r.getLong(0), ac.countMatches(r.getString(1)).sum > 0)
      }(org.apache.spark.sql.Encoders.product[(Long, Boolean)])
      .toDF("doc_id", "quarantined")
    val q = flagged.writeStream.format("memory")
      .queryName("bl_test").outputMode("append").start()
    try {
      stream.addData((1L, "clean text"), (2L, "a bad phrase here"),
        (3L, "worse still"))
      q.processAllAvailable()
      val rows = spark.table("bl_test").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rows === Map(1L -> false, 2L -> true, 3L -> true))
    } finally q.stop()
  }

  test("scanStats rolls up hits, hit docs, and the weighted distribution") {
    val docs = Seq(
      (1L, "a", "the vector and the data"),   // vector:1 data:1 'the data':1
      (2L, "a", "nothing here"),
      (3L, "b", "data data data"))            // data:3
      .toDF("doc_id", "source", "text")
    val pats = Seq("vector", "data", "the data")
    val out = Blocklist.scanStats(spark, docs, "doc_id", "text", "source", pats)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // weights: vector=1, data=2, 'the data'=3
    assert(out("a") === ((2L, 1L, 3L, 1L + 2L + 3L)))
    assert(out("b") === ((1L, 1L, 3L, 6L)))
  }
}
