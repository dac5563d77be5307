package graft

/** DuckDB oracle SQL for every entry in [[SparkEntry.queries]] (driver
  * contract: column names must match the Spark result exactly; the driver
  * sorts columns by name and hashes values).
  *
  * The property-graph construction (FIXTURES.md §3, [[graft.graph.TpchGraph]])
  * is replicated as a CTE prefix so every graph query is checkable in ANSI
  * SQL. All float-producing queries round to a fixed number of decimals on
  * BOTH engines; all hashing is lowercase-hex md5 (identical across
  * engines).
  */
object OracleSqls {

  /** Mirrors [[graft.graph.TpchGraph.load]] exactly. */
  val graphCte: String = """
    |nodes AS (
    |  SELECT CAST(1000000000 + r_regionkey AS BIGINT) AS nodeId, 'Region' AS label, r_name AS name FROM region
    |  UNION ALL SELECT CAST(2000000000 + n_nationkey AS BIGINT), 'Nation', n_name FROM nation
    |  UNION ALL SELECT CAST(3000000000 + c_custkey AS BIGINT), 'Customer', c_name FROM customer
    |  UNION ALL SELECT CAST(4000000000 + s_suppkey AS BIGINT), 'Supplier', s_name FROM supplier
    |  UNION ALL SELECT CAST(5000000000 + p_partkey AS BIGINT), 'Part', p_name FROM part
    |  UNION ALL SELECT CAST(6000000000 + o_orderkey AS BIGINT), 'Order', CAST(o_orderkey AS VARCHAR) FROM orders
    |),
    |rels AS (
    |  SELECT 'IN_REGION' AS relType, CAST(2000000000 + n_nationkey AS BIGINT) AS src, CAST(1000000000 + n_regionkey AS BIGINT) AS dst FROM nation
    |  UNION ALL SELECT 'FROM_NATION', CAST(3000000000 + c_custkey AS BIGINT), CAST(2000000000 + c_nationkey AS BIGINT) FROM customer
    |  UNION ALL SELECT 'FROM_NATION', CAST(4000000000 + s_suppkey AS BIGINT), CAST(2000000000 + s_nationkey AS BIGINT) FROM supplier
    |  UNION ALL SELECT 'PLACED', CAST(3000000000 + o_custkey AS BIGINT), CAST(6000000000 + o_orderkey AS BIGINT) FROM orders
    |  UNION ALL SELECT DISTINCT 'CONTAINS', CAST(6000000000 + l_orderkey AS BIGINT), CAST(5000000000 + l_partkey AS BIGINT) FROM lineitem
    |  UNION ALL SELECT DISTINCT 'SUPPLIES', CAST(4000000000 + l_suppkey AS BIGINT), CAST(5000000000 + l_partkey AS BIGINT) FROM lineitem
    |),
    |bidir AS (
    |  SELECT relType, src, dst, src AS a, dst AS b FROM rels
    |  UNION ALL SELECT relType, src, dst, dst, src FROM rels WHERE src <> dst
    |)""".stripMargin

  private def withGraph(sql: String): String = s"WITH $graphCte\n$sql"

  /** Cypher trail semantics: r1 and r2 must not bind the same stored rel. */
  private val trailNeq =
    "NOT (e1.relType = e2.relType AND e1.src = e2.src AND e1.dst = e2.dst)"

  val all: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
        |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
        |  round(CAST(avg(l_quantity) AS DOUBLE), 4) AS avg_qty,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_top_customers" ->
      """SELECT c_custkey, c_name,
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,

    "q3_revenue_by_nation" ->
      """SELECT n_name AS nation,
        |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "j2_onehop" -> withGraph(
      """SELECT s.name AS src_name, e.relType AS rel_type,
        |  t.label AS tgt_label, t.nodeId AS tgt_id, t.name AS tgt_name
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.label = 'Region' AND s.name IN ('ASIA', 'EUROPE')""".stripMargin),

    "j3_twohop_schema" -> withGraph(
      s"""SELECT e1.relType AS rel1_type, e2.relType AS rel2_type,
         |  t.label AS tgt_label, CAST(count(DISTINCT t.nodeId) AS BIGINT) AS total_cnt
         |FROM nodes s
         |JOIN bidir e1 ON s.nodeId = e1.a
         |JOIN bidir e2 ON e1.b = e2.a
         |JOIN nodes t ON e2.b = t.nodeId
         |WHERE s.label = 'Region' AND s.name = 'AMERICA'
         |  AND t.nodeId <> s.nodeId AND $trailNeq
         |GROUP BY e1.relType, e2.relType, t.label""".stripMargin),

    "j4_twopath" -> withGraph(
      s"""SELECT DISTINCT s1.name AS src1_name, s2.name AS src2_name,
         |  e1.relType AS rel1_type, e2.relType AS rel2_type,
         |  m.label AS mid_label, m.nodeId AS mid_id, m.name AS mid_name
         |FROM nodes s1
         |JOIN bidir e1 ON s1.nodeId = e1.a
         |JOIN bidir e2 ON e1.b = e2.a
         |JOIN nodes s2 ON e2.b = s2.nodeId
         |JOIN nodes m ON e1.b = m.nodeId
         |WHERE s1.label = 'Part' AND s1.name = 'red widget'
         |  AND s2.label = 'Part' AND s2.name = 'blue bolt'
         |  AND s1.nodeId <> s2.nodeId AND $trailNeq""".stripMargin),

    "j5_concrete_2hop" -> withGraph(
      s"""SELECT DISTINCT t.nodeId AS tgt_id, t.name AS tgt_name
         |FROM nodes s
         |JOIN bidir e1 ON s.nodeId = e1.a AND e1.relType = 'FROM_NATION'
         |JOIN nodes m ON e1.b = m.nodeId AND m.label = 'Customer'
         |JOIN bidir e2 ON m.nodeId = e2.a AND e2.relType = 'PLACED'
         |JOIN nodes t ON e2.b = t.nodeId AND t.label = 'Order'
         |WHERE s.label = 'Nation' AND s.name = 'NATION_5'
         |  AND t.nodeId <> s.nodeId AND $trailNeq""".stripMargin),

    "a1_schema_summary" -> withGraph(
      """SELECT s.name AS src_name, e.relType AS rel_type, t.label AS tgt_label,
        |  CAST(count(DISTINCT t.nodeId) AS BIGINT) AS total_cnt
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.label = 'Nation'
        |  AND s.name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
        |GROUP BY s.name, e.relType, t.label""".stripMargin),

    "a2_schema_supervised" -> withGraph(
      """SELECT s.name AS src_name, e.relType AS rel_type, t.label AS tgt_label,
        |  CAST(count(DISTINCT t.nodeId) AS BIGINT) AS total_cnt,
        |  CAST(count(DISTINCT CASE WHEN t.nodeId BETWEEN 3000000001 AND 3000000200
        |       THEN t.nodeId END) AS BIGINT) AS correct_cnt
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.label = 'Nation'
        |  AND s.name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
        |GROUP BY s.name, e.relType, t.label""".stripMargin),

    "j7_id_lookup" -> withGraph(
      """SELECT nodeId AS node_id, label, name FROM nodes
        |WHERE nodeId IN (1000000000, 2000000003, 3000000010, 5000000007)""".stripMargin),

    "p5_anti_membership" -> withGraph(
      """SELECT DISTINCT t.nodeId AS node_id, t.label, t.name
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.label = 'Nation' AND s.name = 'NATION_3'
        |  AND NOT (t.nodeId BETWEEN 3000000000 AND 3000000099)""".stripMargin),

    "p6_norm_lookup" -> withGraph(
      """SELECT nodeId AS node_id, name FROM nodes
        |WHERE lower(nfc_normalize(name)) = lower(nfc_normalize('NaTiOn_7'))""".stripMargin)
  )
}
