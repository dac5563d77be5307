package graft

import graft.operators.LangModel

/** Hand-computed fixtures for the corpus-trained bigram likelihood score. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram score matches hand computation with add-one smoothing") {
    // corpus: "a b a b" (bigrams ab×2, ba×1), "a b" (ab×1), "c" (no bigrams
    // but c still counts toward the vocabulary) → V = {a,b,c} = 3
    // c2: ab=3, ba=1; c1: a=3, b=1
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    // doc 1: (2·(3+1)/(3+3) + 1·(1+1)/(1+3)) / 3 = (4/3 + 1/2) / 3
    val d1 = (2.0 * 4 / 6 + 1.0 * 2 / 4) / 3
    // doc 2: (3+1)/(3+3)
    val d2 = 4.0 / 6
    assert(out.keySet === Set(1L, 2L))            // doc 3 has no bigrams
    assert(out(1L)._1 === 3L)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(1L)._2 - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(out(2L)._2 - math.rint(d2 * 1e6) / 1e6) < 1e-9)
  }

  test("repeated boilerplate scores higher than a unique-token document") {
    val boiler = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val unique = Seq((100L, "zxq wvu tsr qpo nml"))
    val out = LangModel.bigramScore((boiler ++ unique).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(100L))
  }

  test("whitespace runs and empty docs tokenize like words()") {
    val docs = Seq((1L, "  x   y  "), (2L, ""), (3L, "   "), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = LangModel.bigramScore(docs, "doc_id", "text").collect()
    // only doc 1 has ≥ 2 tokens
    assert(out.map(_.getLong(0)).toSet === Set(1L))
    assert(out.head.getLong(1) === 1L)
  }

  test("trigram backoff: hand-derived scores at every backoff level") {
    import spark.implicits._
    // train "a b c a b c": C3(abc)=2, C2(ab)=2, C2(bc)=2, C1(b)=2, N=6
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "a b c"),  // seen trigram: (2·1e6) div 2 = 1,000,000
      (3L, "x b c"),  // bigram backoff: (4·2·1e6) div (10·2) = 400,000
      (5L, "b c b"),  // unigram backoff: (16·2·1e6) div (100·6) = 53,333
      (7L, "a b z"))  // unseen word: 0
      .toDF("doc_id", "text")
    val out = LangModel.trigramBackoffScore(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 1000000L, 0L)))
    assert(out(3L) === ((1L, 400000L, 1L)))
    assert(out(5L) === ((1L, 53333L, 1L)))
    assert(out(7L) === ((1L, 0L, 1L)))
  }
}
