package graft

import graft.operators.TextOps

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def toks(text: String, merges: (String, String)*): Seq[String] =
    TextOps.bpeTokens(Seq((1L, text)).toDF("doc_id", "text"), merges)
      .collect().map(_.getString(0)).toSeq

  test("unmerged word splits to characters") {
    assert(toks("abc") === Seq("a", "b", "c"))
  }

  test("consecutive pair occurrences merge in one pass (shared boundary)") {
    assert(toks("ababab", ("a", "b")) === Seq("ab", "ab", "ab"))
  }

  test("overlapping occurrences merge leftmost-first non-overlapping") {
    assert(toks("aaa", ("a", "a")) === Seq("aa", "a"))
  }

  test("producer-before-consumer chain builds the full token") {
    assert(toks("the", ("t", "h"), ("th", "e")) === Seq("the"))
    assert(toks("and then", ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"))
      === Seq("and", "the", "n"))
  }

  test("rule order matters: earlier rank wins the shared character") {
    // (a,b) first consumes b, so (b,c) never applies
    assert(toks("abc", ("a", "b"), ("b", "c")) === Seq("ab", "c"))
    // reversed ranks: (b,c) merges first
    assert(toks("abc", ("b", "c"), ("a", "b")) === Seq("a", "bc"))
  }

  test("token concatenation rebuilds every word (no char lost)") {
    val docs = Seq((1L, "the running and rather interesting theory"))
      .toDF("doc_id", "text")
    val words = "the running and rather interesting theory".split(" ").toSeq
    val rebuilt = TextOps.bpeTokens(docs, Queries.bpeMerges)
      .collect().map(_.getString(0))
    // multiset of characters is preserved and no token is empty
    assert(rebuilt.forall(_.nonEmpty))
    assert(rebuilt.mkString.sorted === words.mkString.sorted)
  }
}
