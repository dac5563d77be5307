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
}
