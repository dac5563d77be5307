package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph

/** LLM1 training-data generation (SURVEY §3.2; reference
  * training/generate_training_data_llm1.ipynb cells 3-4 + llm1.py:166-180)
  * re-expressed as ONE distributed DataFrame job.
  *
  * The reference maps over QA rows with `num_proc=8`, issuing per-row Neo4j
  * round-trips for the path-schema queries. Spark-first, the same
  * computation is a join pipeline over *all* questions at once:
  * explode entities → anchor join → hop joins → per-(question, path-schema)
  * aggregation with supervision counts — no driver-side loop, cluster-wide
  * parallelism, one shuffle per aggregation. This is the shape that holds
  * at 100 TB (per-row loops do not).
  *
  * Output schema mirrors `qa_with_cypher_queries`: one row per candidate
  * with `cypher_query`, `hits`, `num_results` (plus the schema fields the
  * template was built from), and [[bestLabelGate]] reproduces the llm1
  * training filter (recall ≥ 1 ∧ precision ≥ 0.1, llm1.py:61-66).
  */
object TrainingData {

  /** qa: (id, question, entities: array<string>, answer_ids: array<long>).
    * Returns one row per (question, 1-hop path schema): the templated
    * candidate + num_results + hits. */
  def oneHopCandidates(g: PropertyGraph, qa: DataFrame): DataFrame = {
    val anchors = qa
      .select(col("id"), explode(col("entities")).as("name"), col("answer_ids"))
      .join(g.nodes.select(col("nodeId").as("src_id"), col("label").as("src_label"),
        col("name")), Seq("name"))
    val hops = anchors
      .join(g.bidir.as("e"), col("src_id") === col("e.a"))
      .join(g.nodes.select(col("nodeId").as("tgt_id"), col("label").as("tgt_label")),
        col("e.b") === col("tgt_id"))
    hops
      .groupBy(col("id"), col("src_label"), col("name").as("src_name"),
        col("relType").as("rel_type"), col("tgt_label"))
      .agg(
        count_distinct(col("tgt_id")).as("num_results"),
        count_distinct(when(array_contains(col("answer_ids"), col("tgt_id")),
          col("tgt_id"))).as("hits"))
      .withColumn("cypher_query", concat(
        lit("MATCH (x1:"), col("src_label"), lit(" {name: \""), col("src_name"),
        lit("\"})-[r1:"), col("rel_type"), lit("]-(x2:"), col("tgt_label"),
        lit(") RETURN DISTINCT x2.name AS name")))
  }

  /** 2-hop variant of [[oneHopCandidates]] — same single-job shape with one
    * more edge join and full trail semantics (r1 ≠ r2 on the stored-edge
    * identity triple, tgt ≠ src). */
  def twoHopCandidates(g: PropertyGraph, qa: DataFrame): DataFrame = {
    val anchors = qa
      .select(col("id"), explode(col("entities")).as("name"), col("answer_ids"))
      .join(g.nodes.select(col("nodeId").as("src_id"), col("label").as("src_label"),
        col("name")), Seq("name"))
    val hops = anchors
      .join(g.bidir.as("e1"), col("src_id") === col("e1.a"))
      .join(g.nodes.select(col("nodeId").as("mid_id"), col("label").as("mid_label")),
        col("e1.b") === col("mid_id"))
      .join(g.bidir.as("e2"), col("mid_id") === col("e2.a"))
      .join(g.nodes.select(col("nodeId").as("tgt_id"), col("label").as("tgt_label")),
        col("e2.b") === col("tgt_id"))
      .where(col("tgt_id") =!= col("src_id") &&
        !(col("e1.relType") === col("e2.relType") &&
          col("e1.src") === col("e2.src") && col("e1.dst") === col("e2.dst")))
    hops
      .groupBy(col("id"), col("src_label"), col("name").as("src_name"),
        col("e1.relType").as("rel1_type"), col("mid_label"),
        col("e2.relType").as("rel2_type"), col("tgt_label"))
      .agg(
        count_distinct(col("tgt_id")).as("num_results"),
        count_distinct(when(array_contains(col("answer_ids"), col("tgt_id")),
          col("tgt_id"))).as("hits"))
      .withColumn("cypher_query", concat(
        lit("MATCH (x1:"), col("src_label"), lit(" {name: \""), col("src_name"),
        lit("\"})-[r1:"), col("rel1_type"), lit("]-(x2:"), col("mid_label"),
        lit(")-[r2:"), col("rel2_type"), lit("]-(x3:"), col("tgt_label"),
        lit(") RETURN DISTINCT x3.name AS name")))
  }

  /** 2-path variant: both endpoints anchored in the question's entity set
    * (the double-UNWIND cross product U2), middle node counted — one job
    * for every question at once, trail semantics included. */
  def twoPathCandidates(g: PropertyGraph, qa: DataFrame): DataFrame = {
    val anchors = qa
      .select(col("id"), explode(col("entities")).as("name"), col("answer_ids"))
      .join(g.nodes.select(col("nodeId").as("a_id"), col("label").as("a_label"),
        col("name")), Seq("name"))
    val left = anchors.select(col("id"), col("answer_ids"),
      col("a_id").as("src1_id"), col("a_label").as("src1_label"), col("name").as("src1_name"))
    val right = anchors.select(col("id").as("id2"),
      col("a_id").as("src2_id"), col("a_label").as("src2_label"), col("name").as("src2_name"))
    val hops = left
      .join(g.bidir.as("e1"), col("src1_id") === col("e1.a"))
      .join(g.nodes.select(col("nodeId").as("mid_id"), col("label").as("mid_label")),
        col("e1.b") === col("mid_id"))
      .join(g.bidir.as("e2"), col("mid_id") === col("e2.a"))
      .join(right, col("e2.b") === col("src2_id") && col("id") === col("id2"))
      .where(col("src1_id") =!= col("src2_id") &&
        !(col("e1.relType") === col("e2.relType") &&
          col("e1.src") === col("e2.src") && col("e1.dst") === col("e2.dst")))
    hops
      .groupBy(col("id"), col("src1_label"), col("src1_name"),
        col("e1.relType").as("rel1_type"), col("mid_label"),
        col("e2.relType").as("rel2_type"), col("src2_label"), col("src2_name"))
      .agg(
        count_distinct(col("mid_id")).as("num_results"),
        count_distinct(when(array_contains(col("answer_ids"), col("mid_id")),
          col("mid_id"))).as("hits"))
      .withColumn("cypher_query", concat(
        lit("MATCH (x1:"), col("src1_label"), lit(" {name: \""), col("src1_name"),
        lit("\"})-[r1:"), col("rel1_type"), lit("]-(x2:"), col("mid_label"),
        lit(")-[r2:"), col("rel2_type"), lit("]-(x3:"), col("src2_label"),
        lit(" {name: \""), col("src2_name"),
        lit("\"}) RETURN DISTINCT x2.name AS name")))
  }

  /** T4 rank-biased candidate sampling, distributed (SURVEY §2.7;
    * training/generate_training_data_llm2.ipynb cell 5): per question, rank
    * candidates by (-hits, num_results) and draw `nSamples` DISTINCT indices
    * from the power-law inv_cdf = u^(1/α) — without replacement, like the
    * reference's `if rank not in samples` rejection loop, deterministically
    * unrolled in [[graft.operators.Retrieval.powerLawSampleIdx]]. */
  def sampleCandidates(candidates: DataFrame, nSamples: Int,
                       invAlpha: Int = 10, attempts: Int = 128): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("hits").desc, col("num_results"), col("cypher_query"))
    val ranked = candidates.withColumn("rk", row_number().over(w))
    val counts = candidates.groupBy("id").agg(count(lit(1)).as("n"))
    val draws = graft.operators.Retrieval.powerLawSampleIdx(
      counts, "id", "n", nSamples, invAlpha, attempts)
    draws.join(ranked, draws("id") === ranked("id") &&
        ranked("rk") === draws("idx") + 1)
      .select(draws("id"), col("sample_no"), col("cypher_query"),
        col("hits"), col("num_results"))
  }

  /** Batched per-question retrieval (SURVEY §3.3; reference retriever.py
    * runs one Neo4j session per QA row): given ONE picked 1-hop query per
    * question and the per-question embeddings (`q_emb` joined by id — the
    * S6 broadcast lookup), execute EVERY question's retrieval in a single
    * job: anchor joins carry the question id, cosine scores against the
    * per-question embedding, and the node budget is a window partitioned by
    * question — per-question top-k with zero driver-side iteration. */
  def batchRetrieve1Hop(g: PropertyGraph, picked: DataFrame, qEmb: DataFrame,
                        embCol: String = "nameEmbedding",
                        maxNodes: Int = 20): DataFrame = {
    val anchors = picked
      .join(g.nodes.select(col("nodeId").as("src_id"),
        col("name").as("src_name")), Seq("src_name"))
    val hops = anchors
      .join(g.bidir.as("e"),
        col("src_id") === col("e.a") && col("e.relType") === col("rel_type"))
      .join(g.nodes.as("t"),
        col("e.b") === col("t.nodeId") && col("t.label") === col("tgt_label"))
      .select(col("id"), col("t.nodeId").as("node_id"),
        col("t.name").as("node_name"), col(s"t.$embCol").as("emb"))
      .dropDuplicates("id", "node_id")
    val scored = hops
      .join(broadcast(qEmb), Seq("id"))
      .withColumn("similarity",
        round(graft.functions.cosineSim(col("emb"), col("q_emb")), 6))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("similarity").desc, col("node_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= maxNodes)
      .select(col("id"), col("node_id"), col("node_name"),
        col("similarity"), col("rn").as("rank"))
  }

  /** The llm1 training-label pipeline (llm1.py:53-66,169-177): per question
    * rank candidates by (-hits, num_results), keep the best, gate on
    * recall ≥ minRecall against the gold set and precision ≥ minPrecision,
    * then take the first `limitFraction` of questions (P8 prefix filter). */
  def bestLabelGate(candidates: DataFrame, qa: DataFrame,
                    minRecall: Double = 1.0, minPrecision: Double = 0.1): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("hits").desc, col("num_results"), col("cypher_query"))
    val gold = qa.select(col("id"), size(col("answer_ids")).cast("long").as("gold_total"))
    candidates
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
      .join(gold, "id")
      .where(
        col("hits").cast("double") / nullif(col("gold_total").cast("double"), lit(0.0)) >= minRecall &&
        col("hits").cast("double") / nullif(col("num_results").cast("double"), lit(0.0)) >= minPrecision)
  }
}
