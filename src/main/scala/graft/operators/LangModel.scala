package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the "how typical of the
  * corpus is this document" quality filter used by large-scale training-data
  * pipelines (CCNet-style model-based filtering, next to the rule-based
  * [[TextOps.qualityBySource]] heuristics).
  *
  * The model is trained on the scored corpus itself in the same job: bigram
  * and unigram-context counts plus vocabulary size, then every document is
  * scored by its mean add-one-smoothed bigram likelihood
  * `avg((c(w1,w2) + 1) / (c(w1,·) + |V|))`. Arithmetic mean of smoothed
  * probabilities rather than log-perplexity: it ranks documents the same
  * way for filtering, and it keeps the whole computation in IEEE +,*,/ —
  * exactly reproducible by the DuckDB oracle, where transcendental log
  * implementations are not bit-identical across engines.
  *
  * Scale shape: tokenization is one narrow scan; counts are two map-side-
  * combined aggregations keyed by bigram (the model tables are vocab-sized,
  * far smaller than the corpus); scoring joins the per-document distinct
  * bigrams (with multiplicity) back to the two count tables by key. No
  * driver-side model, no UDFs, no collect.
  */
object LangModel {

  /** Per-document smoothed bigram likelihood under the corpus-trained model.
    * Documents with fewer than two tokens have no bigrams and are omitted.
    *
    * Output: `doc_id`, `n_bigrams` (token count - 1), `score` (rounded to 6,
    * higher = more typical of the corpus).
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      graft.functions.words(col(textCol)).as("w"))
    val bigrams = toks
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("w"), lit(1), size(col("w")) - 1).as("w1"),
        slice(col("w"), lit(2), size(col("w")) - 1).as("w2"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // per-document distinct bigrams with multiplicity: the scoring join then
    // moves one row per (doc, bigram) instead of one per token position
    val perDoc = bigrams.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
    val c2 = perDoc.groupBy("w1", "w2").agg(sum("m").as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = toks.select(explode(col("w")).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    perDoc
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(
        sum("m").cast("long").as("n_bigrams"),
        round(
          sum(col("m") * (col("c2") + 1).cast("double") / (col("c1") + col("v")))
            / sum("m"), 6).as("score"))
  }

  /** HELD-OUT trigram scoring with stupid backoff (Brants et al., EMNLP'07
    * — the web-scale LM recipe: no normalization, fixed α = 0.4), entirely
    * in integer micro-units:
    *
    *   seen trigram:          (C3(abc) · 1e6)  div C2(ab)
    *   backoff to bigram:  (4 · C2(bc) · 1e6)  div (10 · C1(b))
    *   backoff to unigram: (16 · C1(c) · 1e6)  div (100 · N)
    *   unseen word:         0
    *
    * The model trains on `train` and scores `eval` — the split is what
    * makes backoff OBSERVABLE (a corpus scored against itself never backs
    * off) and is the proper held-out quality-filter shape. Per doc:
    * trigram count, summed score, and how many trigrams backed off.
    *
    * Scale shape: count tables are vocab-sized aggregates of the train
    * scan; scoring joins the eval doc's distinct trigrams (with
    * multiplicity) to them by key — map-side combined throughout, no
    * floats anywhere. */
  def trigramBackoffScore(train: DataFrame, eval_ : DataFrame,
                          idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      graft.functions.words(col(textCol)).as("w"))
    def grams(df: DataFrame, n: Int) = toks(df)
      .where(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(graft.functions.wordShinglesOf(col("w"), n)).as("g"))
      .select(col("doc_id"), split(col("g"), " ").as("p"))
    val t3 = grams(train, 3).groupBy(
        col("p")(0).as("a"), col("p")(1).as("b"), col("p")(2).as("c"))
      .agg(count(lit(1)).as("c3"))
    val t2 = grams(train, 2).groupBy(
        col("p")(0).as("x"), col("p")(1).as("y"))
      .agg(count(lit(1)).as("c2"))
    val t1 = toks(train).select(explode(col("w")).as("x"))
      .groupBy("x").agg(count(lit(1)).as("c1"))
    val n = toks(train).select(explode(col("w")).as("x"))
      .agg(count(lit(1)).as("n"))
    val evalTri = grams(eval_, 3).groupBy(col("doc_id"),
        col("p")(0).as("a"), col("p")(1).as("b"), col("p")(2).as("c"))
      .agg(count(lit(1)).as("m"))
    evalTri
      .join(t3, Seq("a", "b", "c"), "left")
      .join(t2.select(col("x").as("a"), col("y").as("b"),
        col("c2").as("c2ab")), Seq("a", "b"), "left")
      .join(t2.select(col("x").as("b"), col("y").as("c"),
        col("c2").as("c2bc")), Seq("b", "c"), "left")
      .join(t1.select(col("x").as("b"), col("c1").as("c1b")), Seq("b"), "left")
      .join(t1.select(col("x").as("c"), col("c1").as("c1c")), Seq("c"), "left")
      .crossJoin(broadcast(n))
      .withColumn("contrib",
        when(col("c3").isNotNull, expr("(c3 * 1000000) div c2ab"))
          .when(col("c2bc").isNotNull, expr("(4 * c2bc * 1000000) div (10 * c1b)"))
          .when(col("c1c").isNotNull, expr("(16 * c1c * 1000000) div (100 * n)"))
          .otherwise(lit(0L)))
      .groupBy("doc_id")
      .agg(sum("m").cast("long").as("n_trigrams"),
        sum(col("m") * col("contrib")).as("score_micro"),
        sum(when(col("c3").isNull, col("m")).otherwise(lit(0L)))
          .as("n_backoff"))
  }
}
