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

  test("bpeTokenCount: scalar count == exploded token count, additive, " +
    "budget-contract safe") {
    import org.apache.spark.sql.functions._
    val merges = graft.Queries.bpeMerges
    val texts = Seq("the running and rather interesting theory",
      "Name: 12345\npattern: ['q0:PLACED']", "a", "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val scalar = docs
      .select(col("doc_id"),
        TextOps.bpeTokenCount(merges)(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: the exploded tokenizer's per-doc counts
    val exploded = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> TextOps.bpeTokens(Seq((1L, t)).toDF("doc_id", "text"), merges)
        .count()
    }.toMap
    assert(scalar === exploded)
    // additive over whitespace-separated concatenation (the budget
    // contract budgetedAssemble relies on)
    val joined = Seq((0L, texts(0) + " " + texts(1))).toDF("doc_id", "text")
      .select(TextOps.bpeTokenCount(merges)(col("text")))
      .collect().head.getLong(0)
    assert(joined === scalar(0L) + scalar(1L))
    // whitespace-only text counts zero
    assert(scalar(3L) === 0L)
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

  test("merge learning reproduces hand-derived Sennrich rounds") {
    // corpus: low low low lower newest newest
    // word hist: low:3 lower:1 newest:2
    // round 1 pair counts: (l,o)=4 (o,w)=4 (w,e)=3 (e,r)=1 (n,e)=2 (e,w)=2
    //   (e,s)=2 (s,t)=2 → max 4, tie (l,o) < (o,w) → merge (l,o)
    // round 2: (lo,w)=4 (w,e)=3 ... → merge (lo,w)
    // round 3: (w,e)=3? no — after round 2 'low'→[low], 'lower'→[low,e,r],
    //   'newest'→[n,e,w,e,s,t]: pairs (low,e)=1 (e,r)=1 (n,e)=2 (e,w)=2
    //   (w,e)=2 (e,s)=2 (s,t)=2 → max 2 six-way tie → lexicographic
    //   smallest a: (e,s) < (e,w) < (n,e) < (s,t) < (w,e) → merge (e,s)
    val docs = Seq((1L, "low low low lower newest newest"))
      .toDF("doc_id", "text")
    val out = TextOps.bpeLearnMerges(docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(out === Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "e", "s", 2L)))
  }

  test("merge learning stops early when every word is fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = TextOps.bpeLearnMerges(docs, k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // one merge exhausts the corpus: 'ab' has a single pair
    assert(out.toSeq === Seq((1, "a", "b")))
  }

  test("fertility: fully-merged words cost 1 token, unmerged cost chars") {
    import org.apache.spark.sql.functions.col
    // merges build 'the' and 'and' completely; 'xyz' stays 3 chars →
    // 5 tokens over 3 words → fertility 5e6 div 3
    val docs = Seq((1L, "s", "the and xyz")).toDF("doc_id", "source", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"))
    val r = graft.operators.TextOps.bpeFertility(docs, merges)
      .collect().head
    assert(r.getAs[Long]("n_words") === 3L)
    assert(r.getAs[Long]("n_tokens") === 5L)
    assert(r.getAs[Long]("fertility_micro") === 1666666L)
    // the arithmetic count must agree with the exploded tokenizer
    val exploded = graft.operators.TextOps.bpeTokens(docs, merges).count()
    assert(exploded === 5L)
  }
}
