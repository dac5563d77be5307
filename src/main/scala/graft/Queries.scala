package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.TpchGraph
import graft.operators._

/** The driver-facing query catalog: one entry per implemented operator from
  * SURVEY.md §2 (plus the training-data-pipeline operators). Each function
  * takes (spark, sfDir) and must produce EXACTLY the schema of its oracle in
  * [[OracleSqls.all]] — same column names, deterministic values.
  */
object Queries {

  private def T(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def graph(spark: SparkSession, dir: String) = {
    graft.functions.registerAll(spark)
    TpchGraph(spark, dir)
  }

  // ---- TPC-H-style relational baselines (S5, P1, A-family, T1/T2) ----

  /** Pricing-summary scan+agg: map-side partial aggregation, no join. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    T(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Join + grouped agg + deterministic top-k (TakeOrderedAndProject). */
  def q2TopCustomers(spark: SparkSession, dir: String): DataFrame =
    T(spark, dir, "orders")
      .join(T(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)

  /** Fact-to-dims join; dims are broadcast (supplier 100 rows, nation 25). */
  def q3RevenueByNation(spark: SparkSession, dir: String): DataFrame =
    T(spark, dir, "lineitem")
      .join(broadcast(T(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(T(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  // ---- graph pattern matching (J2-J5, A1-A3, J7, P5, P6) ----

  def j2OneHop(spark: SparkSession, dir: String): DataFrame =
    Patterns.oneHop(graph(spark, dir), "Region", Seq("ASIA", "EUROPE"))

  def j3TwoHopSchema(spark: SparkSession, dir: String): DataFrame =
    Patterns.twoHop(graph(spark, dir), "Region", Seq("AMERICA"))
      .groupBy("rel1_type", "rel2_type", "tgt_label")
      .agg(count_distinct(col("tgt_id")).as("total_cnt"))

  def j4TwoPath(spark: SparkSession, dir: String): DataFrame =
    Patterns.twoPath(graph(spark, dir), "Part", Seq("red widget"), "Part", Seq("blue bolt"))
      .distinct()

  def j5Concrete2Hop(spark: SparkSession, dir: String): DataFrame =
    Patterns.concreteTwoHop(graph(spark, dir),
      "Nation", "NATION_5", "FROM_NATION", "Customer", "PLACED", "Order")

  def a1SchemaSummary(spark: SparkSession, dir: String): DataFrame =
    Patterns.schemaSummary1Hop(graph(spark, dir), "Nation",
      (0 to 4).map(i => s"NATION_$i"))

  def a2SchemaSupervised(spark: SparkSession, dir: String): DataFrame =
    Patterns.schemaSummary1HopSupervised(graph(spark, dir), "Nation",
      (0 to 4).map(i => s"NATION_$i"),
      (1L to 200L).map(_ + TpchGraph.CustomerBase))

  def j7IdLookup(spark: SparkSession, dir: String): DataFrame =
    Patterns.lookupByIds(graph(spark, dir),
      Seq(1000000000L, 2000000003L, 3000000010L, 5000000007L))

  /** P5 — anti-membership as a left_anti join against the found-ids set
    * (`WHERE NOT node.nodeId IN $foundNodeIds`, retrieval/retriever.py:16). */
  def p5AntiMembership(spark: SparkSession, dir: String): DataFrame = {
    val g = graph(spark, dir)
    val exclude = spark.range(TpchGraph.CustomerBase, TpchGraph.CustomerBase + 100)
      .select(col("id").as("tgt_id"))
    Patterns.oneHop(g, "Nation", Seq("NATION_3"))
      .join(broadcast(exclude), Seq("tgt_id"), "left_anti")
      .select(col("tgt_id").as("node_id"), col("tgt_label").as("label"),
        col("tgt_name").as("name"))
      .distinct()
  }

  /** P6 — normalized fulltext-exact lookup (lower + Unicode NFC,
    * retrieval/ner.py:111-114). */
  def p6NormLookup(spark: SparkSession, dir: String): DataFrame = {
    val g = graph(spark, dir)
    g.nodes
      .where(graft.functions.normName(col("name")) ===
        graft.functions.normName(lit("NaTiOn_7")))
      .select(col("nodeId").as("node_id"), col("name"))
  }

  /** Flagship entry for the driver smoke check (sf0.001, rows > 0). */
  def entry(spark: SparkSession): DataFrame =
    j2OneHop(spark, "/root/testdata/sf0.001")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_top_customers" -> (q2TopCustomers _),
    "q3_revenue_by_nation" -> (q3RevenueByNation _),
    "j2_onehop" -> (j2OneHop _),
    "j3_twohop_schema" -> (j3TwoHopSchema _),
    "j4_twopath" -> (j4TwoPath _),
    "j5_concrete_2hop" -> (j5Concrete2Hop _),
    "a1_schema_summary" -> (a1SchemaSummary _),
    "a2_schema_supervised" -> (a2SchemaSupervised _),
    "j7_id_lookup" -> (j7IdLookup _),
    "p5_anti_membership" -> (p5AntiMembership _),
    "p6_norm_lookup" -> (p6NormLookup _)
  )
}
