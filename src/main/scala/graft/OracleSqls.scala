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

  /** The finGraph slice ([[graft.Queries]] `finGraph`): regions + nations +
    * customers, customers carrying `acctbal` in integer cents
    * (round half-away-from-zero — both engines' round()). */
  val finGraphCte: String = """
    |fnodes AS (
    |  SELECT CAST(1000000000 + r_regionkey AS BIGINT) AS nodeId, 'Region' AS label, r_name AS name, CAST(NULL AS BIGINT) AS acctbal FROM region
    |  UNION ALL SELECT CAST(2000000000 + n_nationkey AS BIGINT), 'Nation', n_name, CAST(NULL AS BIGINT) FROM nation
    |  UNION ALL SELECT CAST(3000000000 + c_custkey AS BIGINT), 'Customer', c_name, CAST(round(c_acctbal * 100) AS BIGINT) FROM customer
    |),
    |frels AS (
    |  SELECT 'FROM_NATION' AS relType, CAST(3000000000 + c_custkey AS BIGINT) AS src, CAST(2000000000 + c_nationkey AS BIGINT) AS dst FROM customer
    |  UNION ALL SELECT 'IN_REGION', CAST(2000000000 + n_nationkey AS BIGINT), CAST(1000000000 + n_regionkey AS BIGINT) FROM nation
    |),
    |fbidir AS (
    |  SELECT relType, src, dst, src AS a, dst AS b FROM frels
    |  UNION ALL SELECT relType, src, dst, dst, src FROM frels WHERE src <> dst
    |)""".stripMargin

  private def withFinGraph(sql: String): String = s"WITH $finGraphCte\n$sql"

  /** Shared by `j2_onehop` and its bucketed-storage twin. */
  private lazy val j2OneHopSql: String = withGraph(
    """SELECT s.name AS src_name, e.relType AS rel_type,
      |  t.label AS tgt_label, t.nodeId AS tgt_id, t.name AS tgt_name
      |FROM nodes s
      |JOIN bidir e ON s.nodeId = e.a
      |JOIN nodes t ON e.b = t.nodeId
      |WHERE s.label = 'Region' AND s.name IN ('ASIA', 'EUROPE')""".stripMargin)

  /** Cypher trail semantics: r1 and r2 must not bind the same stored rel. */
  private val trailNeq =
    "NOT (e1.relType = e2.relType AND e1.src = e2.src AND e1.dst = e2.dst)"

  /** Seeded-centroid IVF probe (shared by `ann_ivf_topk` and its
    * partition-pruned store twin `ann_ivf_pruned`). */
  private lazy val ivfTopkSql: String =
    """WITH c AS (
      |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      |  FROM embeddings ORDER BY vec_id LIMIT 8
      |), a AS (
      |  SELECT id, v, cid FROM (
      |    SELECT e.vec_id AS id, CAST(e.embedding AS DOUBLE[]) AS v, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv), 6) DESC,
      |          c.cid) AS rn
      |    FROM embeddings e CROSS JOIN c)
      |  WHERE rn = 1
      |), q AS (
      |  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
      |), p AS (
      |  SELECT cid FROM c, q
      |  ORDER BY round(list_cosine_similarity(cv, qv), 6) DESC, cid LIMIT 2
      |)
      |SELECT a.id AS vec_id, round(list_cosine_similarity(a.v, q.qv), 6) AS similarity
      |FROM a JOIN p USING (cid), q
      |ORDER BY similarity DESC, a.id LIMIT 10""".stripMargin

  private val base: Map[String, String] = Map(
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

    // set-operator coverage: INTERSECT/EXCEPT over distinct key sets
    "q4_set_ops" ->
      """WITH auto AS (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |), big AS (
        |  SELECT DISTINCT o_custkey AS c_custkey FROM orders
        |  WHERE o_totalprice > 450000
        |)
        |SELECT
        |  CAST((SELECT count(*) FROM auto) AS BIGINT) AS n_auto,
        |  CAST((SELECT count(*) FROM big) AS BIGINT) AS n_big,
        |  CAST((SELECT count(*) FROM (SELECT * FROM auto INTERSECT SELECT * FROM big)) AS BIGINT) AS n_both,
        |  CAST((SELECT count(*) FROM (SELECT * FROM auto EXCEPT SELECT * FROM big)) AS BIGINT) AS n_auto_only""".stripMargin,

    "j2_onehop" -> j2OneHopSql,

    // identical semantics through the bucketed storage path
    "j2_onehop_bucketed" -> j2OneHopSql,

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

    "cy_concrete_2hop" -> withGraph(
      s"""SELECT DISTINCT t.nodeId AS tgt_id, t.name AS tgt_name
         |FROM nodes s
         |JOIN bidir e1 ON s.nodeId = e1.a AND e1.relType = 'FROM_NATION'
         |JOIN nodes m ON e1.b = m.nodeId AND m.label = 'Customer'
         |JOIN bidir e2 ON m.nodeId = e2.a AND e2.relType = 'PLACED'
         |JOIN nodes t ON e2.b = t.nodeId AND t.label = 'Order'
         |WHERE s.label = 'Nation' AND s.name = 'NATION_5'
         |  AND $trailNeq""".stripMargin),

    "cy_schema_1hop" -> withGraph(
      """SELECT s.name AS src_name, e.relType AS rel_type,
        |  t.label AS tgt_label,
        |  CAST(count(DISTINCT t.nodeId) AS BIGINT) AS total_cnt
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.label = 'Nation'
        |  AND s.name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
        |GROUP BY s.name, e.relType, t.label""".stripMargin),

    // WITH chaining: region → nations (carried) → customers, implicit
    // grouping; single-rel stages so no trail pairs arise
    "cy_with_chain" -> withGraph(
      """SELECT n.name AS nation,
        |  CAST(count(DISTINCT c.nodeId) AS BIGINT) AS n_customers
        |FROM nodes r0
        |JOIN bidir e0 ON r0.nodeId = e0.a AND e0.relType = 'IN_REGION'
        |JOIN nodes n ON e0.b = n.nodeId AND n.label = 'Nation'
        |JOIN bidir e1 ON n.nodeId = e1.a AND e1.relType = 'FROM_NATION'
        |JOIN nodes c ON e1.b = c.nodeId AND c.label = 'Customer'
        |WHERE r0.label = 'Region' AND r0.name = 'ASIA'
        |GROUP BY n.name""".stripMargin),

    // FULL_TEXT_QUERY shape: scalar WITH + normalize(lower(…)) filter
    "cy_with_norm_filter" -> withGraph(
      """SELECT c.name AS cname
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |WHERE c.label = 'Customer'
        |  AND nfc_normalize(lower(n.name)) = nfc_normalize(lower('NaTiOn_7'))
        |ORDER BY cname LIMIT 10""".stripMargin),

    // WITH aggregation barrier + HAVING filter, then the carried nation
    // re-binds into the region hop (aggregate alias flows through)
    "cy_with_agg" -> withGraph(
      """, agg AS (
        |  SELECT n.nodeId AS nid, n.name AS nation,
        |    CAST(count(DISTINCT c.nodeId) AS BIGINT) AS n_cust
        |  FROM nodes n
        |  JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |  WHERE n.label = 'Nation'
        |  GROUP BY 1, 2
        |  HAVING count(DISTINCT c.nodeId) >= 5
        |)
        |SELECT r0.name AS region, agg.nation, agg.n_cust
        |FROM agg
        |JOIN bidir e2 ON agg.nid = e2.a AND e2.relType = 'IN_REGION'
        |JOIN nodes r0 ON e2.b = r0.nodeId AND r0.label = 'Region'
        |ORDER BY nation""".stripMargin),

    // WITH … ORDER BY/SKIP/LIMIT barrier trim: rank at the barrier, slice,
    // then the carried nation re-binds into the region hop. The ORDER BY
    // mirrors the planner's deterministic tie-break convention (remaining
    // atomic barrier columns, name-sorted ascending: label, name, nodeId)
    "cy_with_topk" -> withGraph(
      """, agg AS (
        |  SELECT n.nodeId AS nid, n.label AS nlabel, n.name AS nname,
        |    CAST(count(DISTINCT c.nodeId) AS BIGINT) AS n_cust
        |  FROM nodes n
        |  JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |  WHERE n.label = 'Nation'
        |  GROUP BY 1, 2, 3
        |), top AS (
        |  SELECT * FROM agg
        |  ORDER BY n_cust DESC, nlabel, nname, nid
        |  LIMIT 5 OFFSET 2
        |)
        |SELECT r0.name AS region, top.nname AS nation, top.n_cust
        |FROM top
        |JOIN bidir e2 ON top.nid = e2.a AND e2.relType = 'IN_REGION'
        |JOIN nodes r0 ON e2.b = r0.nodeId AND r0.label = 'Region'
        |ORDER BY nation""".stripMargin),

    // OPTIONAL MATCH = LEFT JOIN against the optional pattern's solutions
    // keyed on the shared var's nodeId; unmatched customers keep a NULL
    // order side, so count(DISTINCT …) yields 0 for them
    "cy_optional_match" -> withGraph(
      """SELECT c.name AS name,
        |  CAST(count(DISTINCT opt.oid) AS BIGINT) AS n_orders
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |LEFT JOIN (
        |  SELECT e2.a AS ck, o.nodeId AS oid
        |  FROM bidir e2
        |  JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |  WHERE e2.relType = 'PLACED'
        |) opt ON c.nodeId = opt.ck
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'
        |GROUP BY 1
        |ORDER BY name""".stripMargin),

    // the raw left-outer shape: orderless customers as (cust_id, NULL)
    "cy_optional_null" -> withGraph(
      """SELECT DISTINCT c.nodeId AS cust_id, opt.oid AS order_id
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |LEFT JOIN (
        |  SELECT e2.a AS ck, o.nodeId AS oid
        |  FROM bidir e2
        |  JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |  WHERE e2.relType = 'PLACED'
        |) opt ON c.nodeId = opt.ck
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'""".stripMargin),

    // OPTIONAL rel whole-entity projection: matched rows ship the
    // stored-orientation identity triple as canonical JSON text,
    // orderless customers ship SQL NULL (both rel and endpoint)
    "cy_optional_rel" -> withGraph(
      """SELECT c.nodeId AS cust_id,
        |  CASE WHEN opt.oid IS NULL THEN NULL
        |       ELSE CAST(to_json(struct_pack(dst := opt.oid,
        |              "relType" := 'PLACED',
        |              src := c.nodeId)) AS VARCHAR)
        |  END AS rel,
        |  opt.oid AS order_id
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |LEFT JOIN (
        |  SELECT e2.a AS ck, o.nodeId AS oid
        |  FROM bidir e2
        |  JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |  WHERE e2.relType = 'PLACED'
        |) opt ON c.nodeId = opt.ck
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'""".stripMargin),

    // NOT EXISTS pattern predicate = anti join against the pattern's
    // solutions (DuckDB's NOT EXISTS correlated form plans the same)
    "cy_exists_filter" -> withGraph(
      """SELECT CAST(count(DISTINCT p.nodeId) AS BIGINT) AS n_parts
        |FROM nodes p
        |WHERE p.label = 'Part'
        |  AND NOT EXISTS (
        |    SELECT 1 FROM bidir e1
        |    JOIN nodes o ON e1.b = o.nodeId AND o.label = 'Order'
        |    JOIN bidir e2 ON e2.a = o.nodeId AND e2.relType = 'PLACED'
        |    JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |      AND c.name = 'Customer#000000001'
        |    WHERE e1.a = p.nodeId AND e1.relType = 'CONTAINS')""".stripMargin),

    // relationship-type alternation: the hop admits either type
    // RETURN-level SKIP/LIMIT pagination (ordered, so the page is exact)
    "cy_page" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |ORDER BY name LIMIT 5 OFFSET 5""".stripMargin),

    // parameterized paging: SKIP $off LIMIT $k resolves at plan time —
    // the SAME page as the literal spelling
    "cy_page_param" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |ORDER BY name LIMIT 5 OFFSET 5""".stripMargin),

    // multi-key ORDER BY: count desc, nation + kind break ties
    "cy_multi_order" -> withGraph(
      """SELECT n.name AS nation, x.label AS kind,
        |  CAST(count(DISTINCT x.nodeId) AS BIGINT) AS n
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes x ON e.b = x.nodeId
        |WHERE n.label = 'Nation'
        |GROUP BY 1, 2
        |ORDER BY n DESC, nation, kind LIMIT 10""".stripMargin),

    // count(*) keeps OPTIONAL MATCH's null-extended rows; count(r) skips
    // them — the LEFT JOIN twin of Neo4j's split
    "cy_count_rows" -> withGraph(
      """, asia AS (
        |  SELECT e.a AS nid, r.nodeId AS rid
        |  FROM bidir e JOIN nodes r ON e.b = r.nodeId
        |  WHERE e.relType = 'IN_REGION'
        |    AND r.label = 'Region' AND r.name = 'ASIA'
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(count(a.rid) AS BIGINT) AS n_in_asia
        |FROM nodes n LEFT JOIN asia a ON n.nodeId = a.nid
        |WHERE n.label = 'Nation'""".stripMargin),

    // min/max property aggregates under implicit grouping (binary string
    // collation agrees across engines on the ASCII fixture names)
    "cy_minmax" -> withGraph(
      """SELECT n.name AS nation, min(c.name) AS first_customer,
        |  max(c.name) AS last_customer,
        |  CAST(count(DISTINCT c.nodeId) AS BIGINT) AS n_customers
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1""".stripMargin),

    // collect(DISTINCT n.name): both engines canonicalize the unordered
    // Cypher bag to a sorted distinct list
    "cy_collect" -> withGraph(
      """SELECT r.name AS region,
        |  array_to_string(list_sort(list(DISTINCT n.name)), '|') AS nations,
        |  CAST(count(DISTINCT n.nodeId) AS BIGINT) AS n_nations
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |WHERE r.label = 'Region'
        |GROUP BY 1""".stripMargin),

    // Cypher UNION: part 1 (customers of NATION_7) is a subset of part 2
    // (customers of every ASIA nation) — SQL UNION's dedup mirrors the
    // cross-part DISTINCT
    "cy_union" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes n JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'
        |UNION
        |SELECT c.name AS name
        |FROM nodes r
        |JOIN bidir e1 ON r.nodeId = e1.a AND e1.relType = 'IN_REGION'
        |JOIN nodes n ON e1.b = n.nodeId AND n.label = 'Nation'
        |JOIN bidir e2 ON n.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |WHERE r.label = 'Region' AND r.name = 'ASIA'""".stripMargin),

    // Cypher UNION ALL of two per-part aggregates: concatenation, no dedup
    "cy_union_all" -> withGraph(
      """SELECT c.label AS kind, CAST(count(DISTINCT c.nodeId) AS BIGINT) AS n
        |FROM nodes n JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'
        |GROUP BY 1
        |UNION ALL
        |SELECT s.label AS kind, CAST(count(DISTINCT s.nodeId) AS BIGINT) AS n
        |FROM nodes n JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes s ON e.b = s.nodeId AND s.label = 'Supplier'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'
        |GROUP BY 1""".stripMargin),

    "cy_rel_types" -> withGraph(
      """SELECT x.label AS tgt_label, e.relType AS rel_type,
        |  CAST(count(DISTINCT x.nodeId) AS BIGINT) AS n_nodes
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a
        |  AND e.relType IN ('FROM_NATION', 'IN_REGION')
        |JOIN nodes x ON e.b = x.nodeId
        |WHERE n.label = 'Nation' AND n.name = 'NATION_7'
        |GROUP BY 1, 2""".stripMargin),

    // shortestPath = layered BFS: the recursive CTE's UNION dedups
    // (src, v, dist) rows, so each iteration expands at most one layer per
    // distinct reachable distance and MIN(dist) is the first-discovery
    // round — exactly the engine's frontier semantics
    "cy_shortest_path" -> s"""WITH RECURSIVE $graphCte,
      |bfs AS (
      |  SELECT n.nodeId AS src, n.nodeId AS v, 0 AS dist
      |  FROM nodes n WHERE n.label = 'Region' AND n.name = 'ASIA'
      |  UNION
      |  SELECT bfs.src, e.b, bfs.dist + 1
      |  FROM bfs JOIN bidir e ON e.a = bfs.v
      |  WHERE bfs.dist < 3
      |),
      |md AS (SELECT src, v, MIN(dist) AS dist FROM bfs GROUP BY src, v)
      |SELECT x.label AS tgt_label, CAST(md.dist AS BIGINT) AS hops,
      |  CAST(count(DISTINCT x.nodeId) AS BIGINT) AS n_nodes
      |FROM md JOIN nodes x ON md.v = x.nodeId
      |WHERE md.dist >= 1
      |GROUP BY 1, 2""".stripMargin,

    // relationships(p) on a typed shortestPath: the graph structure
    // forces the witness — own suppliers one FROM_NATION hop away,
    // same-region siblings' suppliers via the region hub (no 2-hop
    // route exists, and supplier/customer leaves dead-end)
    "cy_shortest_rels" -> withGraph(
      """, n3 AS (
        |  SELECT nodeId FROM nodes WHERE label = 'Nation' AND name = 'NATION_3'
        |), reg AS (
        |  SELECT e.dst AS rid FROM rels e
        |  JOIN n3 ON e.src = n3.nodeId AND e.relType = 'IN_REGION'
        |)
        |SELECT s.nodeId AS sid, CAST(1 AS BIGINT) AS len,
        |  'FROM_NATION' AS path_rels
        |FROM rels e JOIN n3 ON e.dst = n3.nodeId AND e.relType = 'FROM_NATION'
        |JOIN nodes s ON e.src = s.nodeId AND s.label = 'Supplier'
        |UNION ALL
        |SELECT s.nodeId, CAST(3 AS BIGINT),
        |  'IN_REGION|IN_REGION|FROM_NATION'
        |FROM reg
        |JOIN rels e2 ON e2.dst = reg.rid AND e2.relType = 'IN_REGION'
        |JOIN rels e3 ON e3.dst = e2.src AND e3.relType = 'FROM_NATION'
        |JOIN nodes s ON e3.src = s.nodeId AND s.label = 'Supplier'
        |WHERE e2.src NOT IN (SELECT nodeId FROM n3)""".stripMargin),

    "cy_anti_lookup" -> withGraph(
      """SELECT DISTINCT t.nodeId AS node_id, t.name
        |FROM nodes s
        |JOIN bidir e ON s.nodeId = e.a
        |JOIN nodes t ON e.b = t.nodeId
        |WHERE s.nodeId = 2000000003
        |  AND NOT (t.nodeId BETWEEN 3000000000 AND 3000000099)""".stripMargin),

    "cy_ordered_topk" -> withGraph(
      """SELECT node_id, name FROM (
        |  SELECT DISTINCT t.nodeId AS node_id, t.name
        |  FROM nodes s
        |  JOIN bidir e ON s.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN nodes t ON e.b = t.nodeId AND t.label = 'Customer'
        |  WHERE s.label = 'Nation' AND s.name = 'NATION_3')
        |ORDER BY node_id DESC LIMIT 5""".stripMargin),

    // var-length [*1..2]: UNION of the 1-hop frontier and the
    // trail-filtered 2-hop frontier (mirrors the planner's expansion)
    "cy_varlength" -> withGraph(
      """SELECT DISTINCT x.nodeId AS node_id, x.label AS label FROM (
        |  SELECT e.b AS v FROM nodes s
        |  JOIN bidir e ON s.nodeId = e.a
        |  WHERE s.label = 'Region' AND s.name = 'ASIA'
        |  UNION
        |  SELECT e2.b FROM nodes s
        |  JOIN bidir e1 ON s.nodeId = e1.a
        |  JOIN bidir e2 ON e1.b = e2.a
        |  WHERE s.label = 'Region' AND s.name = 'ASIA'
        |    AND NOT (e1.relType = e2.relType AND e1.src = e2.src
        |             AND e1.dst = e2.dst)
        |) t JOIN nodes x ON t.v = x.nodeId""".stripMargin),

    // directed 2-hop: one stored orientation per hop — rels, never bidir.
    // (labels Order/Part are implied by the rel construction; the trail
    // inequality is vacuous across distinct relTypes)
    "cy_directed" -> withGraph(
      """SELECT CAST(count(DISTINCT e2.dst) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM nodes c
        |JOIN rels e1 ON c.nodeId = e1.src AND e1.relType = 'PLACED'
        |JOIN rels e2 ON e1.dst = e2.src AND e2.relType = 'CONTAINS'
        |WHERE c.label = 'Customer'
        |  AND c.name = 'Customer#000000042'""".stripMargin),

    // the reverse-arrow spelling of the same pattern — identical result
    "cy_directed_rev" -> withGraph(
      """SELECT CAST(count(DISTINCT e2.dst) AS BIGINT) AS n_parts,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM nodes c
        |JOIN rels e1 ON c.nodeId = e1.src AND e1.relType = 'PLACED'
        |JOIN rels e2 ON e1.dst = e2.src AND e2.relType = 'CONTAINS'
        |WHERE c.label = 'Customer'
        |  AND c.name = 'Customer#000000042'""".stripMargin),

    // ---- the finGraph slice (Queries.finGraph): regions + nations +
    // customers with acctbal in integer cents ----
    "cy_sum_avg" -> withFinGraph(
      """SELECT n.name AS nation, CAST(sum(c.acctbal) AS BIGINT) AS total_bal,
        |  avg(c.acctbal) AS avg_bal, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // DISTINCT numeric aggregates over integer-division buckets
    "cy_sum_distinct" -> withFinGraph(
      """SELECT n.name AS nation,
        |  CAST(sum(DISTINCT c.acctbal // 100000) AS BIGINT) AS s,
        |  avg(DISTINCT c.acctbal // 100000) AS a,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // Cypher integer division truncates toward zero == DuckDB `//`
    "cy_return_arith" -> withFinGraph(
      """SELECT c.name AS name, c.acctbal * 2 + 50 AS doubled,
        |  c.acctbal % 97 AS rem, c.acctbal // 100 AS dollars
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |ORDER BY name""".stripMargin),

    "cy_with_arith" -> withFinGraph(
      """, per_nation AS (
        |  SELECT n.nodeId AS nid, n.name AS nation,
        |    CAST(sum(c.acctbal) AS BIGINT) AS total,
        |    CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |  FROM fnodes n
        |  JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |  WHERE n.label = 'Nation'
        |  GROUP BY 1, 2
        |)
        |SELECT r.name AS region, p.nation AS nation, p.total AS total,
        |  p.n_cust AS n_cust, p.total // p.n_cust AS avg_floor
        |FROM per_nation p
        |JOIN fbidir e2 ON p.nid = e2.a AND e2.relType = 'IN_REGION'
        |JOIN fnodes r ON e2.b = r.nodeId AND r.label = 'Region'
        |ORDER BY nation""".stripMargin),

    "cy_in_list" -> withGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND n.name IN ('NATION_1', 'NATION_3', 'NATION_7')
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // CONTAINS / STARTS WITH / ENDS WITH composed in one boolean WHERE —
    // both engines evaluate the same three substring tests in one scan
    "cy_contains" -> withGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND (ends_with(n.name, '_3') OR contains(n.name, '_1'))
        |  AND NOT starts_with(n.name, 'NATION_2')
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // =~ is a WHOLE-string regex on both engines (DuckDB
    // regexp_full_match ≡ the engine's ^(?:…)$ anchoring)
    "cy_regex" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes c
        |WHERE c.label = 'Customer'
        |  AND regexp_full_match(c.name, 'Customer#0*1[0-9]2')
        |ORDER BY name""".stripMargin),

    // scalar string functions: Neo4j substring is 0-indexed → SQL substr
    // 1-indexed; size() is BIGINT on both engines
    "cy_str_funcs" -> withGraph(
      """SELECT lower(n.name) AS lo, upper(substr(n.name, 8)) AS tag,
        |  CAST(length(n.name) AS BIGINT) AS len,
        |  replace(n.name, 'NATION', 'N') AS short,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND contains(lower(n.name), '_1')
        |GROUP BY 1, 2, 3, 4
        |ORDER BY lo""".stripMargin),

    // plain collect keeps ONE copy per 2-hop row (bag multiplicity);
    // both engines canonicalize the unordered bag to a sorted list
    "cy_collect_all" -> withGraph(
      """SELECT r.name AS region,
        |  array_to_string(list_sort(list(n.name)), '|') AS nations,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |JOIN bidir e2 ON n.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |WHERE r.label = 'Region'
        |GROUP BY 1""".stripMargin),

    // UNWIND of a literal list anchors exactly like the IN-list form
    "cy_unwind_lit" -> withGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND n.name IN ('NATION_1', 'NATION_3', 'NATION_7')
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // null-skipping property counts (acctbal is non-null for customers;
    // the distinct form counts the value set)
    "cy_count_prop" -> withFinGraph(
      """SELECT n.name AS nation,
        |  CAST(count(c.acctbal) AS BIGINT) AS n_bal,
        |  CAST(count(DISTINCT c.acctbal) AS BIGINT) AS n_distinct
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // list expressions over the sorted collected list: DuckDB indexes
    // 1-based where Cypher is 0-based (ns[1] ↔ ns[2]); Cypher's [1..3)
    // half-open slice is DuckDB's [2:3] inclusive slice
    "cy_list_ops" -> withGraph(
      """SELECT region, ns[1] AS first_n, ns[len(ns)] AS last_n,
        |  CAST(len(ns) AS BIGINT) AS n_cnt, ns[2] AS second_n,
        |  array_to_string(ns[2:3], '|') AS mid, list_reverse(ns)[1] AS rev0
        |FROM (
        |  SELECT r.name AS region, list_sort(list(DISTINCT n.name)) AS ns
        |  FROM nodes r
        |  JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |  JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  WHERE r.label = 'Region'
        |  GROUP BY 1)
        |ORDER BY region""".stripMargin),

    // reduce folds and comprehensions replayed as DuckDB list lambdas;
    // the string fold over a non-empty sorted list is a join with a
    // leading separator
    "cy_reduce_comp" -> withGraph(
      """SELECT region,
        |  '|' || array_to_string(ns, '|') AS joined,
        |  CAST(list_sum(list_transform(ns, x -> length(x))) AS BIGINT)
        |    AS total_len,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(ns, x -> ends_with(x, '1')), x -> lower(x)), '|'), '')
        |    AS picked
        |FROM (
        |  SELECT r.name AS region, list_sort(list(DISTINCT n.name)) AS ns
        |  FROM nodes r
        |  JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |  JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  WHERE r.label = 'Region'
        |  GROUP BY 1)
        |ORDER BY region""".stripMargin),

    // UNWIND range(…) anchors like an id IN-list; split/left/right and
    // the StrCond CASE replay directly
    "cy_range_split" -> withGraph(
      """SELECT n.name AS nation, string_split(n.name, '_')[2] AS tag,
        |  left(n.name, 6) AS pre, right(n.name, 1) AS suf,
        |  CASE WHEN ends_with(n.name, '_1') THEN 'one'
        |       ELSE 'other' END AS cls,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND n.nodeId BETWEEN 2000000000 AND 2000000004
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY nation""".stripMargin),

    // consecutive MATCH sharing `c`: one equi-join on the customer id
    "cy_multi_match" -> withGraph(
      """SELECT n.name AS nation, CAST(count(o.nodeId) AS BIGINT) AS n_orders
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |JOIN bidir e2 ON c.nodeId = e2.a AND e2.relType = 'PLACED'
        |JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |WHERE n.label = 'Nation' AND starts_with(n.name, 'NATION_1')
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // Cypher + with a string side concatenates (numeric stringifies);
    // both engines print longs identically
    "cy_str_concat" -> withGraph(
      """SELECT n.name || '@' || r.name AS tag,
        |  n.name || '#' || CAST(n.nodeId AS VARCHAR) AS keyed,
        |  n.nodeId + 1 AS next_id
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes r ON e.b = r.nodeId AND r.label = 'Region'
        |WHERE n.label = 'Nation'
        |ORDER BY tag""".stripMargin),

    // WHERE label test over the untyped FROM_NATION binding (customers
    // AND suppliers) — the predicate genuinely selects
    "cy_label_pred" -> withGraph(
      """SELECT n.name AS nation, CAST(count(x.nodeId) AS BIGINT) AS n_supp
        |FROM nodes x
        |JOIN bidir e ON x.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |WHERE x.label = 'Supplier'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // sign() is a Cypher integer; sum(abs()) stays exact integer cents;
    // avg over the double cast is exact (integer-valued partials ≪ 2^53)
    "cy_num_funcs" -> withFinGraph(
      """SELECT n.name AS nation, CAST(sign(c.acctbal) AS BIGINT) AS s,
        |  CAST(sum(abs(c.acctbal)) AS BIGINT) AS total_abs,
        |  avg(CAST(c.acctbal AS DOUBLE)) AS avg_bal,
        |  CAST(count(*) AS BIGINT) AS n_cust
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1, 2
        |ORDER BY nation, s""".stripMargin),

    // pattern-as-predicate sugar ≡ [NOT] EXISTS — semi join on active
    // customers, anti join on the anchored 2-hop (ordered "red widget")
    "cy_pattern_pred" -> withGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_without
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND EXISTS (
        |    SELECT 1 FROM bidir e1
        |    JOIN nodes o ON e1.b = o.nodeId AND o.label = 'Order'
        |    WHERE e1.a = c.nodeId AND e1.relType = 'PLACED')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM bidir e2
        |    JOIN nodes o2 ON e2.b = o2.nodeId AND o2.label = 'Order'
        |    JOIN bidir e3 ON e3.a = o2.nodeId AND e3.relType = 'CONTAINS'
        |    JOIN nodes p ON e3.b = p.nodeId AND p.label = 'Part'
        |      AND p.name = 'red widget'
        |    WHERE e2.a = c.nodeId AND e2.relType = 'PLACED'
        |      AND NOT (e2.relType = e3.relType AND e2.src = e3.src
        |               AND e2.dst = e3.dst))
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // EXISTS with inner WHERE, composed as a top-level conjunct (semi
    // join) AND under OR (marker left join) — DuckDB's correlated EXISTS
    // plans both the same way
    "cy_exists_where" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes c
        |WHERE c.label = 'Customer'
        |  AND EXISTS (
        |    SELECT 1 FROM bidir e
        |    JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |      AND n.name = 'NATION_3'
        |    WHERE e.a = c.nodeId AND e.relType = 'FROM_NATION')
        |  AND (EXISTS (
        |    SELECT 1 FROM bidir e2
        |    JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |      AND o.name LIKE '1%'
        |    WHERE e2.a = c.nodeId AND e2.relType = 'PLACED')
        |    OR c.name LIKE '%0')
        |ORDER BY name""".stripMargin),

    // EXISTS inside the OPTIONAL MATCH's pattern WHERE: the correlated
    // EXISTS (with its own inner CONTAINS filter) gates which orders the
    // LEFT JOIN side admits; preserved customers count 0 when none
    // qualify
    "cy_exists_optional" -> withGraph(
      """SELECT c.name AS name,
        |  CAST(count(DISTINCT opt.oid) AS BIGINT) AS n_green_orders
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |LEFT JOIN (
        |  SELECT e2.a AS ck, o.nodeId AS oid
        |  FROM bidir e2
        |  JOIN nodes o ON e2.b = o.nodeId AND o.label = 'Order'
        |  WHERE e2.relType = 'PLACED'
        |    AND EXISTS (
        |      SELECT 1 FROM bidir e3
        |      JOIN nodes p ON e3.b = p.nodeId AND p.label = 'Part'
        |        AND p.name LIKE '%green%'
        |      WHERE e3.a = o.nodeId AND e3.relType = 'CONTAINS')
        |) opt ON c.nodeId = opt.ck
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |GROUP BY 1
        |ORDER BY name""".stripMargin),

    // DETACH DELETE: NATION_3's suppliers plus incident rels removed —
    // node count and per-type rel counts of the post-delete graph
    "cy_detach_delete" -> withGraph(
      """, del AS (
        |  SELECT s.nodeId FROM nodes s
        |  WHERE s.label = 'Supplier'
        |    AND EXISTS (
        |      SELECT 1 FROM bidir e
        |      JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |        AND n.name = 'NATION_3'
        |      WHERE e.a = s.nodeId AND e.relType = 'FROM_NATION')
        |),
        |keptr AS (
        |  SELECT * FROM rels
        |  WHERE src NOT IN (SELECT nodeId FROM del)
        |    AND dst NOT IN (SELECT nodeId FROM del)
        |)
        |SELECT 'nodes' AS kind, CAST(count(*) AS BIGINT) AS n
        |FROM nodes WHERE nodeId NOT IN (SELECT nodeId FROM del)
        |UNION ALL
        |SELECT relType, CAST(count(*) AS BIGINT) FROM keptr GROUP BY 1"""
        .stripMargin),

    // MERGE upsert: update customer 42's name, insert the missing
    // customer — the post-merge nodes table as a pure SELECT
    "cy_merge_upsert" -> withGraph(
      """SELECT nodeId, label,
        |  CASE WHEN label = 'Customer' AND nodeId = 3000000042
        |       THEN 'Customer#updated' ELSE name END AS name
        |FROM nodes
        |UNION ALL
        |SELECT CAST(3999999999 AS BIGINT), 'Customer', 'Customer#new'"""
        .stripMargin),

    // parameter-keyed MERGE: the ON MATCH path renames + bumps the
    // balance of customer 42; the ON CREATE path inserts the fresh row
    "cy_merge_param" -> withFinGraph(
      """SELECT nodeId, label,
        |  CASE WHEN label = 'Customer' AND nodeId = 3000000042
        |       THEN 'Customer#param#updated' ELSE name END AS name,
        |  CASE WHEN label = 'Customer' AND nodeId = 3000000042
        |       THEN acctbal + 100 ELSE acctbal END AS acctbal
        |FROM fnodes
        |UNION ALL
        |SELECT CAST(3999999998 AS BIGINT), 'Customer', 'Customer#fresh',
        |  CAST(777 AS BIGINT)""".stripMargin),

    // bulk UNWIND MERGE: two in-place updates + two fresh inserts as a
    // plain CASE + UNION ALL replay (nodeIds are globally unique, so no
    // label guard is needed on the CASE arms)
    "cy_unwind_create" -> withFinGraph(
      """SELECT nodeId, label,
        |  CASE WHEN nodeId = 3000000007 THEN 'Customer#b7#upd'
        |       WHEN nodeId = 3000000013 THEN 'Customer#b13#upd'
        |       ELSE name END AS name,
        |  CASE WHEN nodeId = 3000000007 THEN acctbal + 10
        |       WHEN nodeId = 3000000013 THEN acctbal + 20
        |       ELSE acctbal END AS acctbal
        |FROM fnodes
        |UNION ALL SELECT CAST(3999999901 AS BIGINT), 'Customer',
        |  'Customer#new1', CAST(111 AS BIGINT)
        |UNION ALL SELECT CAST(3999999902 AS BIGINT), 'Customer',
        |  'Customer#new2', CAST(222 AS BIGINT)""".stripMargin),

    // FOREACH bulk CREATE appends two literal region rows
    "cy_foreach" -> withGraph(
      """SELECT nodeId, label, name FROM nodes WHERE label = 'Region'
        |UNION ALL SELECT CAST(1000000090 AS BIGINT), 'Region', 'HYPERBOREA'
        |UNION ALL SELECT CAST(1000000091 AS BIGINT), 'Region', 'MU'"""
        .stripMargin),

    // shortestPath after a WITH aggregate: min distance to a supplier is
    // 1 for the nation's own, 3 for same-region siblings' (via the
    // region hub — no 2-hop path exists), 4+ (beyond the cap) otherwise
    "cy_shortest_pipeline" -> withGraph(
      """, top3 AS (
        |  SELECT n.nodeId AS nid, n.name, CAST(count(*) AS BIGINT) AS n_cust
        |  FROM nodes n
        |  JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |  WHERE n.label = 'Nation'
        |  GROUP BY 1, 2 ORDER BY n_cust DESC, n.name LIMIT 3
        |), nsup AS (
        |  SELECT s.nodeId AS sid, e1.dst AS nid2, e2.dst AS rid2
        |  FROM nodes s
        |  JOIN rels e1 ON e1.src = s.nodeId AND e1.relType = 'FROM_NATION'
        |  JOIN rels e2 ON e2.src = e1.dst AND e2.relType = 'IN_REGION'
        |  WHERE s.label = 'Supplier'
        |), nreg AS (
        |  SELECT src AS nid, dst AS rid FROM rels WHERE relType = 'IN_REGION'
        |)
        |SELECT t.name AS nation, t.n_cust,
        |  CASE WHEN ns.nid2 = t.nid THEN CAST(1 AS BIGINT)
        |       ELSE CAST(3 AS BIGINT) END AS len,
        |  CAST(count(*) AS BIGINT) AS n_supp
        |FROM top3 t
        |JOIN nreg ON nreg.nid = t.nid
        |JOIN nsup ns ON ns.nid2 = t.nid OR ns.rid2 = nreg.rid
        |GROUP BY 1, 2, 3
        |ORDER BY nation, len""".stripMargin),

    // dynamic property access: NATION_3 customers carry exactly the
    // non-null scalar keys {name, nodeId}; reading each back through
    // the runtime key is non-null everywhere, the missing key nowhere
    "cy_dyn_prop" -> withGraph(
      """, c3 AS (
        |  SELECT c.nodeId FROM nodes c
        |  JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |    AND n.name = 'NATION_3'
        |  WHERE c.label = 'Customer'
        |)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_nonnull,
        |  CAST(0 AS BIGINT) AS n_missing,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM c3 CROSS JOIN (SELECT 'name' AS k UNION ALL SELECT 'nodeId') ks
        |GROUP BY k ORDER BY k""".stripMargin),

    // map-merge SET: the += map writes acctbal; the explicit item wins
    // the name key but reads the PRE-update value (snapshot semantics —
    // all SET expressions in one clause see the pre-SET row, like Neo4j)
    "cy_set_plus" -> withFinGraph(
      """SELECT nodeId, label,
        |  CASE WHEN nodeId = 3000000042 THEN name || '!' ELSE name END AS name,
        |  CASE WHEN nodeId = 3000000042 THEN CAST(4242 AS BIGINT)
        |       ELSE acctbal END AS acctbal
        |FROM fnodes""".stripMargin),

    // bulk edge MERGE replayed twice over four pairs (one duplicate, one
    // dangling) = exactly two LOCATED_IN edges
    "cy_unwind_rel" -> withGraph(
      """SELECT relType, CAST(count(*) AS BIGINT) AS n FROM rels GROUP BY 1
        |UNION ALL SELECT 'LOCATED_IN', CAST(2 AS BIGINT)""".stripMargin),

    // Neo4j null ordering: DESC puts the OPTIONAL-MATCH nulls FIRST
    // (null = largest), so the LIMIT page's row set depends on it —
    // DuckDB needs the explicit NULLS FIRST (its default is nulls-last)
    "cy_null_order" -> withGraph(
      """SELECT r.name AS region, m.nname AS nation
        |FROM nodes r
        |LEFT JOIN (
        |  SELECT e.a AS rid, n.name AS nname FROM nodes n
        |  JOIN bidir e ON n.nodeId = e.b AND e.relType = 'IN_REGION'
        |  WHERE n.label = 'Nation' AND contains(n.name, '_2')
        |) m ON m.rid = r.nodeId
        |WHERE r.label = 'Region'
        |ORDER BY nation DESC NULLS FIRST, region
        |LIMIT 4""".stripMargin),

    // RETURN * = the carried node's whole-entity struct + the scalar;
    // the struct ships as canonical JSON text on BOTH engines (Spark
    // to_json / DuckDB to_json(struct_pack) — same compact bytes, null
    // fields kept), because the driver's checker cannot sort dict cells
    "cy_return_star" -> withGraph(
      """SELECT CAST(to_json(struct_pack(name := c.name,
        |         "nameEmbedding" := CAST(NULL AS DOUBLE[]),
        |         "nodeId" := c.nodeId)) AS VARCHAR) AS c,
        |  c.name AS nm
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY nm LIMIT 5""".stripMargin),

    // floor/ceil/sqrt are IEEE-exactly-rounded on both engines;
    // round() replays as floor(x + 0.5) — the dialect's EXPLICIT tie
    // rule (half toward +∞, Neo4j's Math.round), never DuckDB's native
    // round (half away from zero)
    "cy_math_fns" -> withFinGraph(
      """SELECT c.name AS name,
        |  floor(sqrt(CAST(c.acctbal AS DOUBLE))) AS fs,
        |  ceil(sqrt(CAST(c.acctbal AS DOUBLE))) AS cs,
        |  floor(sqrt(CAST(c.acctbal AS DOUBLE)) + 0.5) AS rs,
        |  floor(CAST(c.acctbal AS DOUBLE) / 2.0 + 0.5) AS rh
        |FROM fnodes c
        |JOIN fbidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer' AND c.acctbal >= 0
        |ORDER BY name""".stripMargin),

    // ln/exp/log10 (the tolerance-checked transcendental class): the
    // hash surface quantizes to integer micro-units via the documented
    // floor(x+0.5) tie rule — raw doubles are bit-identical on this
    // libm pair, so the quantization is the CONTRACT, not a loss
    "cy_ln_exp" -> withFinGraph(
      """SELECT c.nodeId AS id,
        |  CAST(floor(ln(CAST(c.acctbal AS DOUBLE)) * 1000000.0 + 0.5)
        |       AS BIGINT) AS ln_micro,
        |  CAST(floor(log10(CAST(c.acctbal AS DOUBLE)) * 1000000.0 + 0.5)
        |       AS BIGINT) AS log10_micro,
        |  CAST(floor(exp(ln(CAST(c.acctbal AS DOUBLE)) / 100.0) * 1000000.0
        |             + 0.5) AS BIGINT) AS exp_micro
        |FROM fnodes c
        |WHERE c.label = 'Customer' AND c.acctbal > 0""".stripMargin),

    // trig family: same tolerance-checked class as cy_ln_exp — identical
    // floor(x+0.5) quantization on both engines; haversin spelled as
    // sin²(x/2) and e as its exact 17-digit decimal (the nearest double,
    // the same constant the engine's e() emits)
    "cy_trig" -> withFinGraph(
      """SELECT c.nodeId AS id,
        |  CAST(floor(sin(CAST(c.acctbal AS DOUBLE) / 100000.0) * 1000000.0
        |             + 0.5) AS BIGINT) AS sin_micro,
        |  CAST(floor(cos(CAST(c.acctbal AS DOUBLE) / 100000.0) * 1000000.0
        |             + 0.5) AS BIGINT) AS cos_micro,
        |  CAST(floor(atan2(CAST(c.acctbal AS DOUBLE) / 100000.0, 2.0)
        |             * 1000000.0 + 0.5) AS BIGINT) AS atan2_micro,
        |  CAST(floor(degrees(atan(CAST(c.acctbal AS DOUBLE) / 100000.0))
        |             * 1000000.0 + 0.5) AS BIGINT) AS deg_micro,
        |  CAST(floor(pow(sin(CAST(c.acctbal AS DOUBLE) / 100000.0 / 2.0), 2)
        |             * 1000000.0 + 0.5) AS BIGINT) AS hav_micro,
        |  CAST(floor(pi() * 1000000.0 + 0.5) AS BIGINT) AS pi_micro,
        |  CAST(floor(CAST(2.718281828459045 AS DOUBLE) * 1000000.0 + 0.5)
        |       AS BIGINT) AS e_micro
        |FROM fnodes c
        |WHERE c.label = 'Customer' AND c.acctbal > 0""".stripMargin),

    // list quantifiers replay as bool_and / bool_or over the group
    "cy_list_quant" -> withGraph(
      """SELECT r.name AS region, CAST(count(*) AS BIGINT) AS n
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes nn ON e.b = nn.nodeId AND nn.label = 'Nation'
        |WHERE r.label = 'Region'
        |GROUP BY 1
        |HAVING bool_and(starts_with(nn.name, 'NATION_'))
        |   AND (bool_or(ends_with(nn.name, '1'))
        |        OR NOT (NOT bool_or(ends_with(nn.name, '3'))))
        |ORDER BY region""".stripMargin),

    // COUNT subqueries replay as correlated scalar counts
    "cy_count_sub" -> withGraph(
      """SELECT r.name AS region,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bidir e
        |    JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |    JOIN bidir e2 ON n.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |    JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |    WHERE e.a = r.nodeId AND e.relType = 'IN_REGION') AS n_cust2,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bidir e3
        |    JOIN nodes n2 ON e3.b = n2.nodeId AND n2.label = 'Nation'
        |    WHERE e3.a = r.nodeId AND e3.relType = 'IN_REGION'
        |      AND contains(n2.name, '_1')) AS n1
        |FROM nodes r
        |WHERE r.label = 'Region'
        |ORDER BY region""".stripMargin),

    // expression parameters pre-bound to their literal values; nodeId
    // parity survives the +3000000000 base (even); 2^(3^2) = 512.0
    "cy_param_expr" -> withGraph(
      """SELECT n.name || '!' AS nation,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_even,
        |  CAST(512 AS DOUBLE) AS p9
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND contains(n.name, '_1')
        |  AND c.nodeId % 2 = 0
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // CALL top-k ≡ the same window row_number, identical tie-breaking
    "cy_call_topk" -> withFinGraph(
      """SELECT nation, cust, bal FROM (
        |  SELECT n.name AS nation, c.name AS cust, c.acctbal AS bal,
        |    row_number() OVER (PARTITION BY n.nodeId
        |                       ORDER BY c.acctbal DESC, c.name) AS rn
        |  FROM fnodes n
        |  JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |  JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |  WHERE n.label = 'Nation')
        |WHERE rn <= 2
        |ORDER BY nation, bal DESC, cust""".stripMargin),

    // CALL per-row aggregates ≡ the grouped join (every region has
    // nations, so inner ≡ left here; lists canonicalize sorted)
    "cy_call_agg" -> withGraph(
      """SELECT r.name AS region, CAST(count(n.nodeId) AS BIGINT) AS n_nat,
        |  array_to_string(list_sort(list(n.name)), '|') AS ns
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |WHERE r.label = 'Region'
        |GROUP BY 1
        |ORDER BY region""".stripMargin),

    // WITH * carry ≡ the flat 2-hop join with the derived column
    "cy_with_star" -> withGraph(
      """SELECT r.name AS region, n.name AS nation,
        |  CAST(length(n.name) AS BIGINT) AS nlen,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |JOIN bidir e2 ON n.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |WHERE r.label = 'Region' AND r.name = 'ASIA'
        |GROUP BY 1, 2, 3
        |ORDER BY nation""".stripMargin),

    // NOT IN the collected asian-nation list ≡ anti-membership by name
    "cy_in_carried" -> withGraph(
      """SELECT CAST(count(DISTINCT m.nodeId) AS BIGINT) AS n_other
        |FROM nodes m
        |JOIN bidir e2 ON m.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |WHERE m.label = 'Nation'
        |  AND m.name NOT IN (
        |    SELECT n.name FROM nodes r
        |    JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |    JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |    WHERE r.label = 'Region' AND r.name = 'ASIA')"""
        .stripMargin),

    // pattern comprehensions replay as correlated list subqueries; the
    // empty list flattens to '' (array_to_string of [] is NULL in DuckDB)
    "cy_pattern_comp" -> withGraph(
      """SELECT n.name AS nation,
        |  coalesce((SELECT array_to_string(list_sort(list(c.name)), '|')
        |    FROM bidir e JOIN nodes c
        |      ON e.b = c.nodeId AND c.label = 'Customer'
        |    WHERE e.a = n.nodeId AND e.relType = 'FROM_NATION'
        |      AND ends_with(c.name, '1')), '') AS picked,
        |  (SELECT CAST(count(*) AS BIGINT) FROM bidir e2
        |    JOIN nodes r ON e2.b = r.nodeId AND r.label = 'Region'
        |    WHERE e2.a = n.nodeId AND e2.relType = 'IN_REGION') AS n_regions
        |FROM nodes n
        |WHERE n.label = 'Nation' AND n.name IN ('NATION_1', 'NATION_2')
        |ORDER BY nation""".stripMargin),

    // keys(p) replays as the embedding-presence CASE (the oracle's node
    // CTE carries no embedding column — presence reconstructs from the
    // embeddings table by the Part key)
    "cy_keys_collect" -> withGraph(
      """SELECT p.name AS part, p.nodeId AS pid,
        |  CASE WHEN em.vec_id IS NOT NULL
        |       THEN 'name|nameEmbedding|nodeId'
        |       ELSE 'name|nodeId' END AS ks,
        |  CAST(count(s.nodeId) AS BIGINT) AS n_sup
        |FROM nodes p
        |JOIN bidir e ON p.nodeId = e.a AND e.relType = 'SUPPLIES'
        |JOIN nodes s ON e.b = s.nodeId AND s.label = 'Supplier'
        |LEFT JOIN embeddings em ON p.nodeId = 5000000000 + em.vec_id
        |WHERE p.label = 'Part'
        |GROUP BY 1, 2, 3
        |ORDER BY n_sup * 10 DESC, part, pid
        |LIMIT 5""".stripMargin),

    // nearest-to-target ranking: the ORDER BY expression replays verbatim
    "cy_order_expr" -> withFinGraph(
      """SELECT c.name AS name, c.acctbal AS bal
        |FROM fnodes c
        |JOIN fbidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_1'
        |WHERE c.label = 'Customer'
        |ORDER BY abs(c.acctbal - 500000), name
        |LIMIT 10""".stripMargin),

    // unordered co-supplier pairs: the src < src inequality replays as
    // the same self-join condition
    "cy_pair_dedup" -> withGraph(
      """SELECT CAST(count(*) AS BIGINT) AS n_pairs
        |FROM rels r1 JOIN rels r2
        |  ON r1.dst = r2.dst AND r1.src < r2.src
        |WHERE r1.relType = 'SUPPLIES' AND r2.relType = 'SUPPLIES'"""
        .stripMargin),

    // conditional count + simple-CASE group key + exists() sugar
    "cy_cond_count" -> withFinGraph(
      """SELECT n.name AS nation,
        |  CAST(count(CASE WHEN c.acctbal >= 500000 THEN 1 END) AS BIGINT)
        |    AS n_rich,
        |  CASE n.name WHEN 'NATION_1' THEN 'one' ELSE 'rest' END AS cls,
        |  CAST(count(*) AS BIGINT) AS n_all
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND c.acctbal IS NOT NULL
        |GROUP BY 1, 3
        |ORDER BY nation""".stripMargin),

    // allShortestPaths census: path multiplicity counts RELATIONSHIP
    // sequences (parallel edge types fork — round 16), so a dist-1
    // target has one path per distinct relType on its anchor pair and a
    // dist-2 target (NOT already at dist 1) sums the per-hop relType
    // counts' product over its intermediates. On this graph every pair
    // carries exactly one relType, so the census equals the node-walk
    // one — the formula, not the numbers, is what the fork changes.
    "cy_all_shortest" -> withGraph(
      """SELECT nodeId, len, n_paths FROM (
        |  SELECT b AS nodeId, CAST(1 AS BIGINT) AS len,
        |         CAST(count(DISTINCT relType) AS BIGINT) AS n_paths
        |  FROM bidir WHERE a = 5000000001 GROUP BY b
        |  UNION ALL
        |  SELECT m.b, CAST(2 AS BIGINT), CAST(sum(n1.c * m.c) AS BIGINT)
        |  FROM (SELECT a, b, count(DISTINCT relType) AS c FROM bidir GROUP BY 1, 2) n1
        |  JOIN (SELECT a, b, count(DISTINCT relType) AS c FROM bidir GROUP BY 1, 2) m
        |    ON m.a = n1.b
        |  WHERE n1.a = 5000000001 AND m.b <> 5000000001
        |    AND m.b NOT IN (SELECT DISTINCT b FROM bidir WHERE a = 5000000001)
        |  GROUP BY 1)
        |ORDER BY nodeId""".stripMargin),

    // collect→UNWIND→re-MATCH ≡ the flat 2-hop group-by (the round trip
    // restores exactly one row per (region, nation) pair)
    "cy_collect_unwind" -> withGraph(
      """SELECT r.name AS region, n.name AS nation,
        |  CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes r
        |JOIN bidir e ON r.nodeId = e.a AND e.relType = 'IN_REGION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |JOIN bidir e2 ON n.nodeId = e2.a AND e2.relType = 'FROM_NATION'
        |JOIN nodes c ON e2.b = c.nodeId AND c.label = 'Customer'
        |WHERE r.label = 'Region'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin),

    // bulk SET replayed as a CASE over the matched slice
    "cy_set_update" -> withFinGraph(
      """SELECT nodeId, label, name,
        |  CASE WHEN label = 'Customer' AND acctbal < 0 THEN abs(acctbal)
        |       ELSE acctbal END AS acctbal
        |FROM fnodes""".stripMargin),

    // REMOVE nulls the property; the census counts non-null balances
    "cy_remove_prop" -> withFinGraph(
      """SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(CASE WHEN label = 'Customer' AND acctbal >= 900000
        |                  THEN NULL ELSE acctbal END) AS BIGINT) AS n_bal
        |FROM fnodes
        |GROUP BY 1""".stripMargin),

    // CREATE appends two literal region rows
    "cy_create_nodes" -> withGraph(
      """SELECT nodeId, label, name FROM nodes WHERE label = 'Region'
        |UNION ALL SELECT CAST(1000000099 AS BIGINT), 'Region', 'ATLANTIS'
        |UNION ALL SELECT CAST(1000000098 AS BIGINT), 'Region', 'LEMURIA'"""
        .stripMargin),

    // MERGE twice + CREATE once = exactly two LOCATED_IN edges
    "cy_rel_merge" -> withGraph(
      """SELECT relType, CAST(count(*) AS BIGINT) AS n FROM rels GROUP BY 1
        |UNION ALL SELECT 'LOCATED_IN', CAST(2 AS BIGINT)""".stripMargin),

    // whole-entity projection: RETURN c / properties(c) are the SAME
    // name-sorted struct (label metadata excluded, absent properties =
    // null fields — customers carry no nameEmbedding); the map
    // projection keeps the LISTED field order. All three ship as
    // canonical JSON text (to_json both engines — the driver's checker
    // cannot sort dict cells, CORRECTNESS_r14)
    "cy_return_node" -> withGraph(
      """SELECT c.name AS name,
        |  CAST(to_json(struct_pack(name := c.name,
        |              "nameEmbedding" := CAST(NULL AS DOUBLE[]),
        |              "nodeId" := c.nodeId)) AS VARCHAR) AS cust,
        |  CAST(to_json(struct_pack(name := c.name,
        |              "nameEmbedding" := CAST(NULL AS DOUBLE[]),
        |              "nodeId" := c.nodeId)) AS VARCHAR) AS props,
        |  CAST(to_json(struct_pack(name := c.name,
        |              "nodeId" := c.nodeId)) AS VARCHAR) AS slim
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY name""".stripMargin),

    // map literal: the record-shaping idiom — ONE listed-order struct
    // (nested), shipped as canonical JSON text on both engines
    "cy_map_literal" -> withGraph(
      """SELECT CAST(to_json(struct_pack(id := c.nodeId, nm := c.name,
        |    tag := struct_pack(upper := upper(c.name),
        |                       len := CAST(length(c.name) AS BIGINT))))
        |    AS VARCHAR) AS rec
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY c.name LIMIT 5""".stripMargin),

    // startNode/endNode: stored orientation — FROM_NATION stores
    // Customer→Nation, so src is the customer and dst the nation; the
    // bare endNode(r) is the nation's whole-entity struct as JSON
    "cy_endpoints" -> withGraph(
      """SELECT c.name AS name, e.src AS src_id, n.name AS dst_name,
        |  CAST(to_json(struct_pack(name := n.name,
        |              "nameEmbedding" := CAST(NULL AS DOUBLE[]),
        |              "nodeId" := n.nodeId)) AS VARCHAR) AS dst
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY name LIMIT 5""".stripMargin),

    // count(r) over OPTIONAL: null-skipping relationship count — an
    // unmatched nation contributes 0 through the left join
    "cy_count_rel" -> withGraph(
      """SELECT n.name AS nation,
        |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_rels
        |FROM nodes n
        |LEFT JOIN (
        |  SELECT e.b AS nid, count(*) AS cnt FROM bidir e
        |  JOIN nodes c ON e.a = c.nodeId AND c.label = 'Customer'
        |  WHERE e.relType = 'FROM_NATION' GROUP BY 1
        |) c ON c.nid = n.nodeId
        |WHERE n.label = 'Nation'
        |ORDER BY nation""".stripMargin),

    // carried relationship: WITH r flattens the identity triple; the
    // untyped -[r]- between Nation and Customer only matches FROM_NATION
    "cy_with_rel" -> withGraph(
      """SELECT c.name AS nm, e.relType AS t,
        |  CAST(to_json(struct_pack(dst := e.dst,
        |              "relType" := e.relType,
        |              src := e.src)) AS VARCHAR) AS rel
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY nm LIMIT 5""".stripMargin),

    // label mutation: three nations gain Flagged+Reviewed (appended in
    // listed order), NATION_11 then loses Reviewed; the MATCH anchors on
    // the ADDED label, so the row set itself proves labels-aware reads
    "cy_set_label" -> withGraph(
      """SELECT n.name AS name,
        |  CASE WHEN n.name = 'NATION_11'
        |       THEN 'Nation|_Entity_|Flagged'
        |       ELSE 'Nation|_Entity_|Flagged|Reviewed'
        |  END AS labels
        |FROM nodes n
        |WHERE n.label = 'Nation' AND ends_with(n.name, '1')
        |ORDER BY name""".stripMargin),

    // relationship whole-entity projection: RETURN r / properties(r)
    // are the SAME name-sorted identity triple {dst, relType, src}
    // (stored orientation — FROM_NATION edges store Customer→Nation),
    // shipped as canonical JSON text like every entity entry
    "cy_return_rel" -> withGraph(
      """SELECT c.name AS name,
        |  CAST(to_json(struct_pack(dst := e.dst,
        |              "relType" := e.relType,
        |              src := e.src)) AS VARCHAR) AS rel,
        |  CAST(to_json(struct_pack(dst := e.dst,
        |              "relType" := e.relType,
        |              src := e.src)) AS VARCHAR) AS props
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes n ON e.b = n.nodeId AND n.label = 'Nation'
        |  AND n.name = 'NATION_3'
        |WHERE c.label = 'Customer'
        |ORDER BY name""".stripMargin),

    // nodes(p)/relationships(p) over *1..2 from ASIA: 1-hop walks plus
    // trail-filtered 2-hop walks, lists flattened to the shared string
    // surface
    "cy_path_nodes" -> withGraph(
      """, asia AS (
        |  SELECT nodeId FROM nodes WHERE label = 'Region' AND name = 'ASIA'
        |)
        |SELECT DISTINCT
        |  CAST(a.nodeId AS VARCHAR) || '|' || CAST(e.b AS VARCHAR) AS path_nodes,
        |  e.relType AS path_rels
        |FROM asia a JOIN bidir e ON e.a = a.nodeId
        |UNION
        |SELECT DISTINCT
        |  CAST(a.nodeId AS VARCHAR) || '|' || CAST(e1.b AS VARCHAR)
        |    || '|' || CAST(e2.b AS VARCHAR) AS path_nodes,
        |  e1.relType || '|' || e2.relType AS path_rels
        |FROM asia a
        |JOIN bidir e1 ON e1.a = a.nodeId
        |JOIN bidir e2 ON e2.a = e1.b
        |WHERE NOT (e1.relType = e2.relType AND e1.src = e2.src
        |           AND e1.dst = e2.dst)""".stripMargin),

    // degree sugar: one grouped count per degree shape, left-joined back
    // (missing → 0), the WHERE gate on the untyped FROM_NATION degree
    "cy_degree_count" -> withGraph(
      """SELECT n.name AS nation,
        |  CAST(coalesce(dc.cnt, 0) AS BIGINT) AS n_cust,
        |  CAST(coalesce(ds.cnt, 0) AS BIGINT) AS n_supp,
        |  CAST(coalesce(dt.cnt, 0) AS BIGINT) AS deg_total
        |FROM nodes n
        |LEFT JOIN (
        |  SELECT e.a, count(*) AS cnt FROM bidir e
        |  JOIN nodes x ON e.b = x.nodeId AND x.label = 'Customer'
        |  WHERE e.relType = 'FROM_NATION' GROUP BY 1) dc ON dc.a = n.nodeId
        |LEFT JOIN (
        |  SELECT e.a, count(*) AS cnt FROM bidir e
        |  JOIN nodes x ON e.b = x.nodeId AND x.label = 'Supplier'
        |  WHERE e.relType = 'FROM_NATION' GROUP BY 1) ds ON ds.a = n.nodeId
        |LEFT JOIN (
        |  SELECT a, count(*) AS cnt FROM bidir GROUP BY 1) dt ON dt.a = n.nodeId
        |LEFT JOIN (
        |  SELECT a, count(*) AS cnt FROM bidir
        |  WHERE relType = 'FROM_NATION' GROUP BY 1) df ON df.a = n.nodeId
        |WHERE n.label = 'Nation' AND coalesce(df.cnt, 0) >= 1
        |ORDER BY nation""".stripMargin),

    // ORDER BY an unprojected property (both engines order by the raw
    // column, return only the name)
    "cy_order_prop" -> withFinGraph(
      """SELECT c.name AS name
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |ORDER BY c.acctbal DESC, name LIMIT 5""".stripMargin),

    // min/max over derived values — truncating // division and abs()
    // inside the aggregate
    "cy_minmax_expr" -> withFinGraph(
      """SELECT n.name AS nation,
        |  CAST(min(c.acctbal // 100) AS BIGINT) AS min_dollars,
        |  CAST(max(abs(c.acctbal)) AS BIGINT) AS max_abs
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // IN $param on an arbitrary property — cy_in_list's oracle with the
    // list supplied as a parameter
    "cy_in_param" -> withGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND n.name IN ('NATION_1', 'NATION_3', 'NATION_7')
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // multi-property map anchor: both pairs constrain the one anchor row
    "cy_multi_anchor" -> withGraph(
      """SELECT CAST(count(e.b) AS BIGINT) AS n_orders
        |FROM nodes c
        |JOIN bidir e ON c.nodeId = e.a AND e.relType = 'PLACED'
        |JOIN nodes o ON e.b = o.nodeId AND o.label = 'Order'
        |WHERE c.label = 'Customer' AND c.name = 'Customer#000000042'
        |  AND c.nodeId = 3000000042""".stripMargin),

    // scalar-parameter WHERE comparisons, params inlined ($nation =
    // 'NATION_3', $minBal = 500000)
    "cy_param_where" -> withFinGraph(
      """SELECT c.name AS name, c.acctbal AS bal
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |  AND c.acctbal >= 500000
        |ORDER BY name""".stripMargin),

    // the map-parameter anchor must hash-match cy_page's literal-anchor
    // oracle exactly (same query, $nation = 'NATION_3')
    "cy_param_anchor" -> withGraph(
      """SELECT c.name AS name
        |FROM nodes n
        |JOIN bidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN nodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation' AND n.name = 'NATION_3'
        |ORDER BY name LIMIT 5 OFFSET 2""".stripMargin),

    // percentileCont ≡ quantile_cont (exact interpolation, unrounded);
    // percentileDisc ≡ quantile_disc (SQL-standard inverse distribution,
    // cast to DOUBLE to match Spark's percentile_disc result type);
    // stDev rounded to 4 decimals on both sides (moment-accumulation
    // order differs between engines)
    "cy_percentile" -> withFinGraph(
      """SELECT n.name AS nation,
        |  quantile_cont(c.acctbal, 0.5) AS med,
        |  CAST(quantile_disc(c.acctbal, 0.9) AS DOUBLE) AS p90,
        |  round(stddev_samp(c.acctbal), 4) AS sd
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    // boolean WHERE: AND binds tighter than OR, NOT groups — one scan
    // predicate on both engines
    "cy_bool_where" -> withFinGraph(
      """SELECT n.name AS nation, CAST(count(c.nodeId) AS BIGINT) AS n_cust
        |FROM fnodes n
        |JOIN fbidir e ON n.nodeId = e.a AND e.relType = 'FROM_NATION'
        |JOIN fnodes c ON e.b = c.nodeId AND c.label = 'Customer'
        |WHERE n.label = 'Nation'
        |  AND (c.acctbal >= 900000
        |       OR c.acctbal < 0 AND NOT (n.name = 'NATION_3'))
        |GROUP BY 1
        |ORDER BY nation""".stripMargin),

    "cy_case_null" -> withFinGraph(
      """SELECT n.name AS nation, coalesce(opt.rname, 'OTHER') AS region_tag,
        |  CAST(CASE WHEN opt.rname IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS in_asia
        |FROM fnodes n
        |LEFT JOIN (
        |  SELECT e.a AS nk, r.name AS rname
        |  FROM fbidir e
        |  JOIN fnodes r ON e.b = r.nodeId AND r.label = 'Region'
        |    AND r.name = 'ASIA'
        |  WHERE e.relType = 'IN_REGION'
        |) opt ON n.nodeId = opt.nk
        |WHERE n.label = 'Nation'
        |ORDER BY nation""".stripMargin),

    // salting is a physical strategy: the oracle is the PLAIN group by
    "skew_salted_agg" ->
      """SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    // the salt is internal to Skew.saltedJoin, so the oracle is the PLAIN
    // join — the hash gate proves the salting is result-invariant
    "join_salted" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2)
        |    AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "p6_norm_lookup" -> withGraph(
      """SELECT nodeId AS node_id, name FROM nodes
        |WHERE lower(nfc_normalize(name)) = lower(nfc_normalize('NaTiOn_7'))""".stripMargin),

    "v5_label_lookup" -> withGraph(
      """, m AS (
        |  SELECT * FROM (VALUES
        |    (0, 'Nation', 'NaTiOn_7'),
        |    (1, 'Customer', 'NaTiOn_7'),
        |    (2, '_Entity_', 'nation_7'),
        |    (3, 'Part', 'RED WIDGET'),
        |    (4, '_Entity_', 'customer#000000042')) AS t(m_id, m_label, mention))
        |SELECT m.m_id, m.m_label, m.mention,
        |  n.nodeId AS node_id, n.label, n.name
        |FROM m JOIN nodes n
        |  ON lower(nfc_normalize(n.name)) = lower(nfc_normalize(m.mention))
        | AND (m.m_label = '_Entity_' OR n.label = m.m_label)""".stripMargin),

    // V3 batched label-scoped KNN fallback: top-1 node name per mention
    // embedding, label-scoped ('_Entity_' = all labels), null-similarity
    // rows excluded; only Part nodes carry embeddings so the Customer-
    // scoped mention yields no row. Ordering uses the RAW cosine like the
    // Spark side — safe because no float reaches the output.
    "v3_knn_fallback" -> withGraph(
      """, pe AS (
        |  SELECT CAST(5000000000 + e.vec_id AS BIGINT) AS nodeId, p.p_name AS name,
        |    CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM embeddings e JOIN part p ON p.p_partkey = e.vec_id
        |), m AS (
        |  SELECT 0 AS m_id, 'Part' AS m_label,
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1) AS qv
        |  UNION ALL SELECT 1, '_Entity_',
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 2)
        |  UNION ALL SELECT 2, 'Customer',
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 3)
        |), scored AS (
        |  SELECT m.m_id, pe.name, pe.nodeId,
        |    list_cosine_similarity(pe.v, m.qv) AS sim
        |  FROM m CROSS JOIN pe
        |  JOIN nodes n ON n.nodeId = pe.nodeId
        |  WHERE m.m_label = '_Entity_' OR n.label = m.m_label
        |)
        |SELECT m_id, name FROM (
        |  SELECT m_id, name,
        |    row_number() OVER (PARTITION BY m_id ORDER BY sim DESC, nodeId) AS rn
        |  FROM scored WHERE sim IS NOT NULL)
        |WHERE rn = 1""".stripMargin),

    "v1_cosine_topk" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS similarity
        |FROM embeddings WHERE vec_id <> 0
        |ORDER BY similarity DESC, vec_id LIMIT 20""".stripMargin,

    "v2_knn_exclude" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS similarity
        |FROM embeddings WHERE vec_id NOT BETWEEN 0 AND 49
        |ORDER BY similarity DESC, vec_id LIMIT 20""".stripMargin,

    // filtered vector search: metadata predicate BEFORE the similarity
    "v_filtered_topk" ->
      """SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS similarity
        |FROM embeddings WHERE label % 2 = 0 AND vec_id <> 0
        |ORDER BY similarity DESC, vec_id LIMIT 20""".stripMargin,

    "mmr_rerank" -> mmrSql(poolSize = 20, k = 5, lamTenths = 7),

    "lake_merge_upsert" ->
      s"""WITH $mergeCte
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
        |FROM merged GROUP BY o_orderstatus""".stripMargin,

    // time travel: version 0 = base, 1 = after mergeCte's batch, 2 = after
    // the second batch replayed over `merged` (same anti-join + union law)
    "lake_time_travel" ->
      s"""WITH $mergeCte,
        |ch2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 500 AS o_totalprice,
        |    1 AS seq, 'U' AS op FROM o WHERE o_orderkey % 10 = 3
        |  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, 1, 'D'
        |    FROM o WHERE o_orderkey % 100 = 40
        |),
        |latest2 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, op FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END) AS rn
        |    FROM ch2) WHERE rn = 1
        |),
        |v2 AS (
        |  SELECT m.* FROM merged m ANTI JOIN latest2 l
        |    ON m.o_orderkey = l.o_orderkey
        |  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice
        |    FROM latest2 WHERE op <> 'D'
        |)
        |SELECT 0 AS version, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total FROM o
        |UNION ALL SELECT 1, CAST(count(*) AS BIGINT),
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) FROM merged
        |UNION ALL SELECT 2, CAST(count(*) AS BIGINT),
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) FROM v2""".stripMargin,

    // compaction plan: files laid end-to-end per partition in doc_id
    // order, bins cut at start_off // target (the packChunks convention —
    // no file splits); zone-map min/max per compacted bin
    "lake_compact" ->
      """WITH f AS (
        |  SELECT source, doc_id, coalesce(n_chars, 0) AS b FROM documents
        |), o AS (
        |  SELECT source, doc_id, b,
        |    sum(b) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - b AS start_off
        |  FROM f
        |)
        |SELECT source, CAST(start_off // 4000 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(b) AS BIGINT) AS bin_bytes,
        |  CAST(min(doc_id) AS BIGINT) AS zone_min,
        |  CAST(max(doc_id) AS BIGINT) AS zone_max
        |FROM o GROUP BY 1, 2
        |ORDER BY source, bin""".stripMargin,

    "lake_snapshot_diff" ->
      s"""WITH $mergeCte
        |SELECT op, CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(k) AS BIGINT) AS key_sum
        |FROM (
        |  SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS k,
        |    CASE WHEN b.o_orderkey IS NULL THEN 'I'
        |         WHEN a.o_orderkey IS NULL THEN 'D'
        |         WHEN b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
        |           OR b.o_totalprice IS DISTINCT FROM a.o_totalprice THEN 'U'
        |    END AS op
        |  FROM o b FULL OUTER JOIN merged a ON b.o_orderkey = a.o_orderkey)
        |WHERE op IS NOT NULL GROUP BY op""".stripMargin,

    // matryoshka truncation report: prefix-slice cosine top-10 vs the
    // full-width exact top-10, per prefix width (array slice v[1:d] and
    // query prefix — same round-6 + id tiebreak as every ANN oracle)
    "emb_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |bf AS (
        |  SELECT vec_id FROM (
        |    SELECT vec_id, round(list_cosine_similarity(v, (SELECT qv FROM q)), 6)
        |      AS s FROM e ORDER BY s DESC, vec_id LIMIT 10)
        |), dims AS (SELECT unnest([8, 16, 32, 64]) AS dim),
        |pref AS (
        |  SELECT d.dim, t.vec_id FROM dims d, LATERAL (
        |    SELECT vec_id FROM (
        |      SELECT vec_id,
        |        round(list_cosine_similarity(v[1:d.dim],
        |          (SELECT qv[1:d.dim] FROM q)), 6) AS s
        |      FROM e ORDER BY s DESC, vec_id LIMIT 10)) t
        |)
        |SELECT CAST(p.dim AS INTEGER) AS dim,
        |  round(CAST(count(bf.vec_id) AS DOUBLE) / 10.0, 6) AS recall
        |FROM pref p LEFT JOIN bf ON p.vec_id = bf.vec_id
        |GROUP BY p.dim ORDER BY dim""".stripMargin,

    // sparse random projection: the sign matrix is re-derived from the
    // same md5 strings the Spark side hashes driver-side; micro-quantized
    // integer sums are order-independent, so no float mirror needed
    // integer power iteration, 3 unrolled rounds (mirrors
    // Vectors.powerIterationTopDir): milli-quantized centered matrix,
    // truncating renormalization by the max-|u| component
    "emb_power_iteration" -> {
      val rounds = (1 to 3).map { t =>
        s"""d$t AS (
           |  SELECT id, SUM(x * v) AS dp FROM x JOIN v${t - 1} USING (i)
           |  GROUP BY id
           |), u$t AS (
           |  SELECT i, CAST(SUM(x * dp) AS BIGINT) AS u
           |  FROM x JOIN d$t USING (id) GROUP BY i
           |), m$t AS (SELECT greatest(max(abs(u)), 1) AS m FROM u$t),
           |v$t AS (
           |  SELECT i, CAST((u * 1000) // m AS BIGINT) AS v
           |  FROM u$t CROSS JOIN m$t
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH x0 AS (
        |  SELECT vec_id AS id, i - 1 AS i,
        |    CAST(round(e[i] * 1000, 0) AS BIGINT) AS x
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |        FROM embeddings),
        |    unnest(range(1, 65)) AS t(i)
        |), mu AS (
        |  SELECT i, CAST(sum(x) // count(*) AS BIGINT) AS mu FROM x0
        |  GROUP BY i
        |), x AS (
        |  SELECT id, x0.i, x - mu AS x FROM x0 JOIN mu USING (i)
        |), v0 AS (SELECT DISTINCT i, 1000::BIGINT AS v FROM x),
        |$rounds
        |SELECT CAST(i AS BIGINT) AS dim, v AS v_milli FROM v3
        |ORDER BY dim""".stripMargin
    },

    // all-but-the-top (Mu & Viswanath ICLR'18): the same power-iteration
    // CTEs, then per-id projection removal in truncating integer milli
    // arithmetic and round-6 cosine over the de-biased integer arrays
    "emb_abtt_topk" -> {
      val rounds = (1 to 3).map { t =>
        s"""d$t AS (
           |  SELECT id, SUM(x * v) AS dp FROM x JOIN v${t - 1} USING (i)
           |  GROUP BY id
           |), u$t AS (
           |  SELECT i, CAST(SUM(x * dp) AS BIGINT) AS u
           |  FROM x JOIN d$t USING (id) GROUP BY i
           |), m$t AS (SELECT greatest(max(abs(u)), 1) AS m FROM u$t),
           |v$t AS (
           |  SELECT i, CAST((u * 1000) // m AS BIGINT) AS v
           |  FROM u$t CROSS JOIN m$t
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH x0 AS (
        |  SELECT vec_id AS id, i - 1 AS i,
        |    CAST(round(e[i] * 1000, 0) AS BIGINT) AS x
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |        FROM embeddings),
        |    unnest(range(1, 65)) AS t(i)
        |), mu AS (
        |  SELECT i, CAST(sum(x) // count(*) AS BIGINT) AS mu FROM x0
        |  GROUP BY i
        |), x AS (
        |  SELECT id, x0.i, x - mu AS x FROM x0 JOIN mu USING (i)
        |), v0 AS (SELECT DISTINCT i, 1000::BIGINT AS v FROM x),
        |$rounds,
        |n2 AS (SELECT SUM(v * v) AS n2 FROM v3),
        |dp AS (SELECT id, SUM(x * v) AS dp FROM x JOIN v3 USING (i) GROUP BY id),
        |pr AS (
        |  SELECT x.id, x.i, x.x - (dp.dp * v3.v) // n2.n2 AS p
        |  FROM x JOIN dp USING (id) JOIN v3 USING (i) CROSS JOIN n2
        |),
        |ar AS (
        |  SELECT id, list_transform(
        |    list(struct_pack(i := i, p := CAST(p AS DOUBLE)) ORDER BY i),
        |    s -> s.p) AS a
        |  FROM pr GROUP BY id
        |),
        |q AS (SELECT a AS qa FROM ar WHERE id = 0)
        |SELECT ar.id AS vec_id,
        |  round(list_cosine_similarity(ar.a, qa), 6) AS similarity
        |FROM ar, q ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin
    },

    "emb_random_projection" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (SELECT unnest(range(0, 8)) AS proj_dim)
        |SELECT vec_id, CAST(proj_dim AS INTEGER) AS proj_dim,
        |  CAST(list_sum(list_transform(range(1, 65), j ->
        |    CAST(round(v[j] * 1000000, 0) AS BIGINT) *
        |    CASE substr(md5('rp' || CAST(proj_dim AS VARCHAR) || '_'
        |                    || CAST(j - 1 AS VARCHAR)), 1, 1)
        |      WHEN '0' THEN 1 WHEN '1' THEN -1 ELSE 0 END))
        |    AS BIGINT) AS value_q
        |FROM e CROSS JOIN d""".stripMargin,

    // hard negatives: same bucket, different label, top-3 by rounded sim
    "emb_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |  FROM embeddings),
         |b AS (SELECT vec_id, v, label, $bucket4 AS bucket FROM e),
         |a AS (SELECT * FROM b WHERE vec_id < 20)
         |SELECT anchor_id, neg_id, sim FROM (
         |  SELECT a.vec_id AS anchor_id, c.vec_id AS neg_id,
         |    round(list_cosine_similarity(a.v, c.v), 6) AS sim,
         |    row_number() OVER (PARTITION BY a.vec_id
         |      ORDER BY round(list_cosine_similarity(a.v, c.v), 6) DESC,
         |               c.vec_id) AS rn
         |  FROM a JOIN b c ON a.bucket = c.bucket AND a.label <> c.label)
         |WHERE rn <= 3""".stripMargin,

    // multi-probe: the query bucket plus every Hamming-1/-2 neighbor —
    // mirrored as "bit positions differing from the query bucket <= 2"
    // (radius 2 holds the 0.9 recall floor at bits=4; see annLshTopK)
    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucket4 AS bucket FROM e),
         |q AS (SELECT bucket AS qb FROM b WHERE vec_id = 0)
         |SELECT vec_id, round(list_cosine_similarity(v,
         |    (SELECT v FROM b WHERE vec_id = 0)), 6) AS similarity
         |FROM b CROSS JOIN q
         |WHERE (CASE WHEN substr(bucket, 1, 1) = substr(qb, 1, 1) THEN 0 ELSE 1 END)
         |    + (CASE WHEN substr(bucket, 2, 1) = substr(qb, 2, 1) THEN 0 ELSE 1 END)
         |    + (CASE WHEN substr(bucket, 3, 1) = substr(qb, 3, 1) THEN 0 ELSE 1 END)
         |    + (CASE WHEN substr(bucket, 4, 1) = substr(qb, 4, 1) THEN 0 ELSE 1 END) <= 2
         |ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin,

    "ann_neardup_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucket4 AS bucket FROM e)
         |SELECT id1, id2, cos_sim FROM (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2,
         |    round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |WHERE cos_sim >= 0.35""".stripMargin,

    // bitext-shaped cross-group mining: same bucket join as neardup_pairs
    // with a label-inequality predicate, then best partner per id1
    "emb_crossgroup_pairs" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, label, v, $bucket4 AS bucket FROM e),
         |p AS (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2,
         |    x.label AS grp1, y.label AS grp2,
         |    round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.label <> y.label
         |), t AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY id1 ORDER BY cos_sim DESC, id2) AS rk
         |  FROM p WHERE cos_sim >= 0.3
         |)
         |SELECT id1, id2, grp1, grp2, cos_sim FROM t WHERE rk = 1""".stripMargin,

    // cross-document duplicated-substring coverage: positioned word-8-grams
    // (1-based i → 0-based pos matches posexplode); a shingle string in
    // >= 2 distinct docs covers its 8 token positions; overlaps merge via
    // the DISTINCT position union — dup_tokens is exact span coverage
    "dedup_substring_spans" ->
      s"""WITH w AS (
         |  SELECT doc_id, $wordsExpr AS w FROM documents
         |), ww AS (SELECT doc_id, w FROM w WHERE len(w) >= 8),
         |sh AS (
         |  SELECT doc_id, unnest(range(0, len(w) - 7)) AS pos,
         |    unnest(list_transform(range(1, len(w) - 6), i ->
         |      w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
         |      w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS s
         |  FROM ww
         |), dup AS (
         |  SELECT s FROM sh GROUP BY s HAVING count(DISTINCT doc_id) >= 2
         |), cov AS (
         |  SELECT DISTINCT sh.doc_id, sh.pos + o.o AS t
         |  FROM sh JOIN dup ON sh.s = dup.s
         |  CROSS JOIN (SELECT unnest(range(0, 8)) AS o) o
         |)
         |SELECT ww.doc_id, CAST(len(ww.w) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS dup_tokens
         |FROM ww JOIN cov ON cov.doc_id = ww.doc_id
         |GROUP BY ww.doc_id, len(ww.w)""".stripMargin,

    // Aho-Corasick blocklist scan; the oracle reproduces the leftmost-
    // non-overlapping per-pattern counts with the replace() identity,
    // pattern list shared with the engine (Queries.blocklistPatterns)
    "curate_blocklist" -> {
      val cs = graft.Queries.blocklistPatterns.zipWithIndex.map {
        case (p, i) =>
          s"CAST((length(text) - length(replace(text, '$p', ''))) " +
            s"// ${p.length} AS BIGINT) AS c${i + 1}"
      }.mkString(",\n        |    ")
      val hits = graft.Queries.blocklistPatterns.indices
        .map(i => s"c${i + 1}").mkString(" + ")
      val weighted = graft.Queries.blocklistPatterns.indices
        .map(i => s"${i + 1} * c${i + 1}").mkString(" + ")
      s"""WITH per AS (
        |  SELECT source,
        |    $cs
        |  FROM documents
        |), d AS (
        |  SELECT source, ($hits) AS hits, ($weighted) AS weighted FROM per
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_hit,
        |  CAST(sum(hits) AS BIGINT) AS n_hits,
        |  CAST(sum(weighted) AS BIGINT) AS weighted_hits
        |FROM d GROUP BY source""".stripMargin
    },

    // content-defined chunking: boundary where the 3-gram hash % 16 == 0,
    // chunk index = prefix-sum of prior boundaries, fingerprint = md5 of
    // the in-order hash sequence — mirrors Dedup.cdcChunkStats
    "dedup_cdc_chunks" ->
      s"""WITH w AS (
        |  SELECT doc_id, source, $wordsExpr AS w FROM documents
        |), ww AS (SELECT doc_id, source, w FROM w WHERE len(w) >= 3),
        |sh AS (
        |  SELECT doc_id, source, unnest(range(0, len(w) - 2)) AS pos,
        |    unnest(list_transform(range(1, len(w) - 1), i ->
        |      ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
        |        1, 15))::BIGINT)) AS h
        |  FROM ww
        |), ck AS (
        |  SELECT doc_id, source, pos, h,
        |    coalesce(sum(CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_idx
        |  FROM sh
        |), chunks AS (
        |  SELECT doc_id, source, chunk_idx, CAST(count(*) AS BIGINT) AS len,
        |    md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY pos)) AS fp
        |  FROM ck GROUP BY doc_id, source, chunk_idx
        |), dup AS (
        |  SELECT fp FROM chunks GROUP BY fp HAVING count(*) >= 2
        |), agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(len) AS BIGINT) AS n_positions
        |  FROM chunks GROUP BY source
        |), dagg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_dup_chunks,
        |    CAST(sum(len) AS BIGINT) AS dup_positions
        |  FROM chunks SEMI JOIN dup USING (fp) GROUP BY source
        |)
        |SELECT a.source, a.n_chunks,
        |  (a.n_positions * 1000000) // a.n_chunks AS mean_len_micro,
        |  CAST(coalesce(d.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
        |  CAST(coalesce(d.dup_positions, 0) AS BIGINT) AS dup_positions
        |FROM agg a LEFT JOIN dagg d ON a.source = d.source""".stripMargin,

    // winnowing (MOSS): rightmost-min-of-some-window membership decomposed
    // per offset k into window aggregates — mirrors Dedup.winnowingStats
    // condition for condition (w=4, word-3-gram hashes, 60-bit md5 prefix)
    "dedup_winnowing" ->
      s"""WITH w AS (
        |  SELECT doc_id, source, $wordsExpr AS w FROM documents
        |), ww AS (SELECT doc_id, source, w FROM w WHERE len(w) >= 6),
        |sh AS (
        |  SELECT doc_id, source, unnest(range(0, len(w) - 2)) AS pos,
        |    unnest(list_transform(range(1, len(w) - 1), i ->
        |      ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
        |        1, 15))::BIGINT)) AS h
        |  FROM ww
        |), m AS (
        |  SELECT doc_id, source, pos, h,
        |    count(*) OVER (PARTITION BY doc_id) AS np,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING),
        |      9223372036854775807) AS pm1,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING),
        |      9223372036854775807) AS pm2,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING),
        |      9223372036854775807) AS pm3,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 1 FOLLOWING AND 1 FOLLOWING),
        |      9223372036854775807) AS nm1,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING),
        |      9223372036854775807) AS nm2,
        |    coalesce(min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING),
        |      9223372036854775807) AS nm3
        |  FROM sh
        |), sel AS (
        |  SELECT DISTINCT doc_id, source, h FROM m
        |  WHERE (pos + 0 >= 3 AND pos + 0 <= np - 1 AND h <= pm3)
        |     OR (pos + 1 >= 3 AND pos + 1 <= np - 1 AND h <= pm2 AND h < nm1)
        |     OR (pos + 2 >= 3 AND pos + 2 <= np - 1 AND h <= pm1 AND h < nm2)
        |     OR (pos + 3 >= 3 AND pos + 3 <= np - 1 AND h < nm3)
        |), shared AS (
        |  SELECT h FROM sel GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |), positions AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_positions
        |  FROM sh GROUP BY source
        |), selc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_selected
        |  FROM sel GROUP BY source
        |), shrc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM sel SEMI JOIN shared USING (h) GROUP BY source
        |)
        |SELECT p.source, p.n_positions,
        |  CAST(coalesce(s.n_selected, 0) AS BIGINT) AS n_selected,
        |  CAST(coalesce(c.n_shared, 0) AS BIGINT) AS n_shared
        |FROM positions p
        |LEFT JOIN selc s ON p.source = s.source
        |LEFT JOIN shrc c ON p.source = c.source""".stripMargin,

    "t3_budget_retrieval" -> t3OracleSql(maxNodes = 20, maxTokens = 200L, rate = 1.0),
    // tokenizer-exact budget: same assembly, BPE token counting
    "t3_budget_bpe" -> t3OracleSql(maxNodes = 20, maxTokens = 400L,
      rate = 1.0, tok = bpeTokExpr(graft.Queries.bpeMerges)),

    "t3_pattern_rate" -> t3OracleSql(maxNodes = 20, maxTokens = 100000L, rate = 0.5),

    // derandomized POISSON bootstrap CI (mirrors Metrics.bootstrapCi):
    // integer micro per-question metrics, 64 resamples with Poisson(1)
    // multiplicities from the md5 hash of (resample, qid), order-stat
    // interval at ranks 4/61 — every value integer-exact cross-engine
    "a5_ir_bootstrap" ->
      """WITH per AS (
        |  SELECT l_orderkey AS ok, l_partkey AS pk, sum(l_quantity) AS q,
        |    max(l_discount) AS d
        |  FROM lineitem GROUP BY 1, 2
        |), arr AS (
        |  SELECT ok, (list(pk ORDER BY q DESC, pk))[1:10] AS preds,
        |    coalesce(list(pk ORDER BY pk) FILTER (WHERE d > 0.05), []) AS labels
        |  FROM per GROUP BY ok
        |), pq AS (
        |  SELECT ok AS qid,
        |    CAST(len(list_intersect(preds, labels)) AS BIGINT) AS inter,
        |    CAST(len(preds) AS BIGINT) AS np,
        |    CAST(len(labels) AS BIGINT) AS nl
        |  FROM arr
        |), pm AS (
        |  SELECT qid,
        |    CASE WHEN np > 0 THEN (inter * 1000000) // np ELSE 0 END AS prec_micro,
        |    CASE WHEN nl > 0 THEN (inter * 1000000) // nl ELSE 0 END AS rec_micro
        |  FROM pq
        |), bs AS (SELECT unnest(range(0, 64)) AS b),
        |res AS (
        |  SELECT b,
        |    CAST(sum(mult * prec_micro) // greatest(sum(mult), 1) AS BIGINT) AS mp,
        |    CAST(sum(mult * rec_micro) // greatest(sum(mult), 1) AS BIGINT) AS mr
        |  FROM (
        |    SELECT b, prec_micro, rec_micro,
        |      CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
        |           WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
        |           WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
        |           WHEN u < 999917 THEN 6 ELSE 7 END AS mult
        |    FROM (
        |      SELECT b, prec_micro, rec_micro,
        |        CAST(substr(regexp_replace(md5('bs|' || CAST(b AS VARCHAR) ||
        |          '|' || CAST(qid AS VARCHAR)), '[a-f]', '', 'g') || '000000',
        |          1, 6) AS BIGINT) AS u
        |      FROM pm CROSS JOIN bs))
        |  GROUP BY b
        |), rp AS (SELECT mp, b, row_number() OVER (ORDER BY mp, b) AS r FROM res),
        |rr AS (SELECT mr, b, row_number() OVER (ORDER BY mr, b) AS r FROM res),
        |point AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_questions,
        |    CAST(sum(prec_micro) // count(*) AS BIGINT) AS mean_prec_micro,
        |    CAST(sum(rec_micro) // count(*) AS BIGINT) AS mean_rec_micro
        |  FROM pm
        |)
        |SELECT point.n_questions, point.mean_prec_micro,
        |  (SELECT CAST(mp AS BIGINT) FROM rp WHERE r = 4) AS lo_prec_micro,
        |  (SELECT CAST(mp AS BIGINT) FROM rp WHERE r = 61) AS hi_prec_micro,
        |  point.mean_rec_micro,
        |  (SELECT CAST(mr AS BIGINT) FROM rr WHERE r = 4) AS lo_rec_micro,
        |  (SELECT CAST(mr AS BIGINT) FROM rr WHERE r = 61) AS hi_rec_micro
        |FROM point""".stripMargin,

    "a5_ir_metrics" ->
      """WITH per AS (
        |  SELECT l_orderkey AS ok, l_partkey AS pk, sum(l_quantity) AS q, max(l_discount) AS d
        |  FROM lineitem GROUP BY 1, 2
        |), arr AS (
        |  SELECT ok, (list(pk ORDER BY q DESC, pk))[1:10] AS preds,
        |    coalesce(list(pk ORDER BY pk) FILTER (WHERE d > 0.05), []) AS labels
        |  FROM per GROUP BY ok
        |), m AS (
        |  SELECT len(preds) * 1.0 AS np, len(labels) * 1.0 AS nl,
        |    len(list_intersect(preds, labels)) * 1.0 AS inter,
        |    list_min(list_filter(list_transform(labels, l -> list_position(preds, l)),
        |      p -> p > 0)) AS firstpos,
        |    len(list_intersect(preds[1:1], labels)) AS h1,
        |    len(list_intersect(preds[1:5], labels)) AS h5,
        |    len(list_intersect(preds[1:20], labels)) AS i20
        |  FROM arr
        |), x AS (
        |  SELECT CASE WHEN np > 0 THEN inter / np ELSE 0 END AS prec,
        |    CASE WHEN nl > 0 THEN inter / nl ELSE 0 END AS rec,
        |    np, nl, firstpos, h1, h5, i20 FROM m
        |), y AS (
        |  SELECT prec, rec,
        |    CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec) ELSE 0 END AS f1,
        |    CASE WHEN firstpos IS NOT NULL THEN 1.0 / firstpos ELSE 0 END AS mrr,
        |    np AS num_preds,
        |    CASE WHEN h1 > 0 THEN 1.0 ELSE 0.0 END AS hit_1,
        |    CASE WHEN h5 > 0 THEN 1.0 ELSE 0.0 END AS hit_5,
        |    CASE WHEN nl > 0 THEN i20 / nl ELSE 0 END AS recall_20
        |  FROM x
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_questions,
        |  round(avg(prec), 6) AS avg_precision, round(avg(rec), 6) AS avg_recall,
        |  round(avg(f1), 6) AS avg_f1, round(avg(mrr), 6) AS avg_mrr,
        |  round(avg(num_preds), 6) AS avg_num_preds,
        |  round(avg(hit_1), 6) AS avg_hit_1, round(avg(hit_5), 6) AS avg_hit_5,
        |  round(avg(recall_20), 6) AS avg_recall_20
        |FROM y""".stripMargin,

    "a6_best_candidate" ->
      """WITH per AS (
        |  SELECT o_custkey AS custkey, l_orderkey AS orderkey,
        |    CAST(count(DISTINCT CASE WHEN l_discount > 0.05 THEN l_partkey END) AS BIGINT) AS hits,
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS num_results
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2
        |), gold AS (
        |  SELECT o_custkey AS custkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS gold_total
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_discount > 0.05 GROUP BY 1
        |), best AS (
        |  SELECT per.custkey, orderkey, hits, num_results, gold_total,
        |    row_number() OVER (PARTITION BY per.custkey
        |      ORDER BY hits DESC, num_results, orderkey) AS rn
        |  FROM per JOIN gold ON per.custkey = gold.custkey
        |)
        |SELECT custkey, orderkey, hits, num_results, gold_total
        |FROM best WHERE rn = 1
        |  AND hits * 1.0 / gold_total >= 0.5 AND hits * 1.0 / num_results >= 0.5""".stripMargin,

    "t4_rank_sampling" ->
      """WITH ranked AS (
        |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders
        |), counts AS (
        |  SELECT o_custkey AS custkey, count(*) AS n FROM orders GROUP BY 1
        |), att AS (
        |  SELECT custkey, n, attempt,
        |    CAST(floor(u*u*u*u*u*u*u*u*u*u * n) AS INT) AS idx
        |  FROM (
        |    SELECT custkey, n, a.attempt,
        |      CAST(('0x' || substr(md5(CAST(custkey AS VARCHAR) || ':' ||
        |        CAST(a.attempt AS VARCHAR)), 1, 6)) AS BIGINT) / 16777216.0 AS u
        |    FROM counts, (SELECT unnest(range(128)) AS attempt) a
        |  )
        |), firsts AS (
        |  SELECT custkey, attempt, idx FROM (
        |    SELECT custkey, attempt, idx,
        |      row_number() OVER (PARTITION BY custkey, idx ORDER BY attempt) AS occ
        |    FROM att)
        |  WHERE occ = 1
        |), samples AS (
        |  SELECT custkey, idx, sample_no FROM (
        |    SELECT custkey, idx,
        |      CAST(row_number() OVER (PARTITION BY custkey ORDER BY attempt) - 1 AS INT)
        |        AS sample_no
        |    FROM firsts)
        |  WHERE sample_no < 3
        |)
        |SELECT r.custkey, s.sample_no, r.orderkey
        |FROM samples s JOIN ranked r ON s.custkey = r.custkey AND r.rk = s.idx + 1""".stripMargin,

    "ann_ivf_topk" -> ivfTopkSql,
    // identical math to ann_ivf_topk — the Spark side runs it through the
    // IVF-PARTITIONED store (hive partition per cell, probe = partition
    // pruning); results must hash-match the unpartitioned oracle
    "ann_ivf_pruned" -> ivfTopkSql,
    "ann_kmeans_quality" -> kmeansQualitySql(nCentroids = 8, lloydIters = 2),

    // mean-centered cosine retrieval: per-dim corpus mean rounded to 6
    // (the kmeans-mean convention), IEEE subtract, round-6 cosine — every
    // arithmetic step position-mirrored from Vectors.centeredTopK
    "emb_centered_topk" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m0 AS (SELECT unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM e),
        |m1 AS (SELECT i, round(avg(x), 6) AS m FROM m0 GROUP BY i),
        |mv AS (
        |  SELECT list_transform(list(struct_pack(i := i, m := m) ORDER BY i),
        |    s -> s.m) AS mv
        |  FROM m1
        |),
        |c AS (
        |  SELECT id, list_transform(range(1, len(v) + 1),
        |    i -> v[i] - mv[i]) AS cv
        |  FROM e, mv
        |),
        |q AS (SELECT cv AS qv FROM c WHERE id = 0)
        |SELECT id AS vec_id,
        |  round(list_cosine_similarity(cv, qv), 6) AS similarity
        |FROM c, q
        |ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin,
    "ann_ivf_kmeans" -> ivfKmeansSql(k = 10, nCentroids = 8, nProbe = 2,
      lloydIters = 2),
    // same maths as ann_ivf_kmeans, executed through the hive-partitioned
    // store — the oracle is identical, so the LAYOUT is what's being tested
    "ann_ivf_store_kmeans" -> ivfKmeansSql(k = 10, nCentroids = 8, nProbe = 2,
      lloydIters = 2),

    // rebalanced store, FULL probe: reading every cell is exact
    // brute-force top-k, so the oracle is the plain cosine ranking — the
    // hash gate proves the partition rewrite lost/duplicated nothing
    "ann_ivf_rebalance" ->
      """SELECT vec_id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS similarity
        |FROM embeddings
        |ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin,

    // full probe after retrain = exact brute force (the retrain must
    // preserve the vector set across the version flip)
    "ann_ivf_retrain" ->
      """SELECT vec_id,
        |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |     WHERE vec_id = 0)), 6) AS similarity
        |FROM embeddings
        |ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin,

    "ann_pq_topk" -> pqSql(k = 10, m = 8, kCodes = 16, lloydIters = 1,
      ef = 200, subDim = 8),

    "ann_ivfpq_topk" -> ivfPqSql(k = 10, nCells = 8, nProbe = 3, m = 8,
      kCodes = 16, lloydIters = 1, ef = 100, subDim = 8),

    // int8 scalar quantization rebuilt in SQL: per-dim min/max arrays,
    // code = round(((v-mn)/rng)*255), dequant = (code/255.0)*rng + mn,
    // ADC fold in array order, exact cosine re-rank of top-ef
    "ann_sq8_topk" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE id = 0),
        |st AS (
        |  SELECT i, min(x) AS mn, max(x) AS mx FROM (
        |    SELECT generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e)
        |  GROUP BY i
        |), sta AS (
        |  SELECT list(mn ORDER BY i) AS mna, list(mx ORDER BY i) AS mxa FROM st
        |), coded AS (
        |  SELECT e.id,
        |    round(list_sum(list_transform(
        |      list_transform(range(1, len(e.v) + 1), i ->
        |        (CASE WHEN s.mxa[i] - s.mna[i] = 0 THEN 0
        |              ELSE CAST(round((e.v[i] - s.mna[i])
        |                     / (s.mxa[i] - s.mna[i]) * 255) AS INTEGER)
        |         END / 255.0 * (s.mxa[i] - s.mna[i]) + s.mna[i]) - q.qv[i]),
        |      d -> d * d)), 6) AS adist
        |  FROM e, sta s, q
        |), cand AS (
        |  SELECT id FROM coded ORDER BY adist ASC, id LIMIT 50
        |)
        |SELECT e.id AS vec_id,
        |  round(list_cosine_similarity(e.v, q.qv), 6) AS similarity
        |FROM e JOIN cand USING (id), q
        |ORDER BY similarity DESC, e.id LIMIT 10""".stripMargin,

    "dedup_semantic" -> semanticDedupSql(nClusters = 8, lloydIters = 1,
      threshold = 0.35),

    // TrainingData.oneHopCandidates + bestLabelGate over the synthetic
    // per-nation QA frame: candidates grouped per (question, path schema)
    // with supervision counts, best candidate per question by
    // (-hits, num_results, query), gated on recall ≥ 1 ∧ precision ≥ 0.1.
    "td_onehop_gate" -> withGraph(
      """, qa AS (
        |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS id
        |  FROM customer WHERE c_nationkey <= 4
        |), cand AS (
        |  SELECT q.id, s.label AS src_label, s.name AS src_name,
        |    e.relType AS rel_type, t.label AS tgt_label,
        |    CAST(count(DISTINCT t.nodeId) AS BIGINT) AS num_results,
        |    CAST(count(DISTINCT CASE WHEN c.c_custkey IS NOT NULL
        |      THEN t.nodeId END) AS BIGINT) AS hits
        |  FROM qa q
        |  JOIN nodes s ON s.name = 'NATION_' || CAST(q.id AS VARCHAR)
        |  JOIN bidir e ON s.nodeId = e.a
        |  JOIN nodes t ON e.b = t.nodeId
        |  LEFT JOIN customer c ON t.nodeId = CAST(3000000000 + c.c_custkey AS BIGINT)
        |    AND CAST(c.c_nationkey AS BIGINT) = q.id
        |  GROUP BY 1, 2, 3, 4, 5
        |), tpl AS (
        |  SELECT *, 'MATCH (x1:' || src_label || ' {name: "' || src_name ||
        |    '"})-[r1:' || rel_type || ']-(x2:' || tgt_label ||
        |    ') RETURN DISTINCT x2.name AS name' AS cypher_query
        |  FROM cand
        |), gold AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS id,
        |    CAST(count(DISTINCT c_custkey) AS BIGINT) AS gold_total
        |  FROM customer WHERE c_nationkey <= 4 GROUP BY 1
        |), best AS (
        |  SELECT tpl.*, row_number() OVER (PARTITION BY id
        |    ORDER BY hits DESC, num_results, cypher_query) AS rn
        |  FROM tpl
        |)
        |SELECT b.id, b.cypher_query, b.hits, b.num_results, g.gold_total
        |FROM best b JOIN gold g ON b.id = g.id
        |WHERE b.rn = 1
        |  AND b.hits * 1.0 / g.gold_total >= 1.0
        |  AND b.hits * 1.0 / b.num_results >= 0.1""".stripMargin),

    "degree_histogram" -> withGraph(
      """SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes FROM (
        |  SELECT a, CAST(count(*) AS BIGINT) AS degree FROM bidir GROUP BY a
        |) GROUP BY degree""".stripMargin),

    "gx_pagerank_topk" -> withGraph(pageRankSql(numIter = 5, k = 20)),

    "pipeline_retrieve" -> withGraph(pipelineRetrieveSql(maxNodes = 30, ef = 1000)),

    "gx_components" -> withGraph(componentsSql(iters = 12)),

    "graph_kcore" -> withGraph(kCoreSql(k = 3, iters = 6)),

    "graph_lpa" -> withGraph(lpaSql(iters = 3)),
    "graph_modularity" -> withGraph(modularitySql(iters = 3)),

    // link prediction: wedge-enumerated candidates through hub-capped
    // shared neighbors (deg(z) <= 32, mirrored semantics); BOTH scores in
    // integer micro-units — RA as an order-independent sum, Jaccard as a
    // single floored division (the round-6 float `jac` was the catalog's
    // only cross-engine hash failure)
    "graph_link_pred" -> withGraph(""", adj AS (SELECT DISTINCT a, b FROM bidir),
      |deg AS (SELECT a, count(*) AS deg FROM adj GROUP BY a),
      |zadj AS (
      |  SELECT e.a AS z, e.b AS n, d.deg AS deg_z
      |  FROM adj e JOIN deg d ON e.a = d.a WHERE d.deg <= 32),
      |scored AS (
      |  SELECT l.n AS a, r.n AS b, count(*) AS cn,
      |    sum(CAST(floor(1000000 / l.deg_z) AS BIGINT)) AS ra_micro
      |  FROM zadj l JOIN zadj r ON l.z = r.z AND l.n < r.n
      |  GROUP BY l.n, r.n)
      |SELECT s.a, s.b, s.cn,
      |  CAST(floor(s.cn * 1000000.0 / (da.deg + db.deg - s.cn)) AS BIGINT)
      |    AS jac_micro,
      |  CAST(s.ra_micro AS BIGINT) AS ra_micro
      |FROM scored s
      |JOIN deg da ON s.a = da.a
      |JOIN deg db ON s.b = db.a
      |WHERE NOT EXISTS (SELECT 1 FROM adj e WHERE e.a = s.a AND e.b = s.b)
      |ORDER BY s.cn DESC, s.ra_micro DESC, s.a, s.b LIMIT 20""".stripMargin),

    "graph_ktruss" -> ktrussSql(k = 4, iters = 3),

    "graph_betweenness" -> withGraph(betweennessSql(iters = 4, k = 20)),

    "graph_walks" -> withGraph(walksSql(steps = 3)),

    "graph_skipgrams" -> withGraph(skipgramSql(steps = 3, window = 2)),

    // degree-oriented triangle counting over the small-part co-occurrence
    // graph (mirrors Queries.graphTriangles + GraphAlgorithms
    // .triangleHistogram: orientation low->high by (degree, id), each
    // triangle found once at its minimum vertex)
    "graph_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.k = y.k AND x.p < y.p
        |), deg AS (
        |  SELECT a AS v, count(*) AS deg FROM (
        |    SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        |  ) GROUP BY a
        |), orient AS MATERIALIZED (
        |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |              THEN e.a ELSE e.b END AS u,
        |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |              THEN e.b ELSE e.a END AS w
        |  FROM und e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
        |), tri AS (
        |  SELECT w1.u, w1.w AS x, w2.w AS y
        |  FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.w < w2.w
        |  WHERE EXISTS (SELECT 1 FROM und c
        |                WHERE c.a = least(w1.w, w2.w) AND c.b = greatest(w1.w, w2.w))
        |), corners AS (
        |  SELECT u AS v FROM tri UNION ALL SELECT x FROM tri
        |  UNION ALL SELECT y FROM tri
        |), per_node AS (
        |  SELECT v, count(*) AS n_tri FROM corners GROUP BY v
        |)
        |SELECT n_tri, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM per_node GROUP BY n_tri""".stripMargin,

    // local clustering coefficient deciles over the same co-occurrence
    // graph: cc = (2*tri*1e6) // (deg*(deg-1)) per deg>=2 node, mirrored
    // wedge orientation (GraphAlgorithms.clusteringCoefficients)
    "graph_clustering" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |), und AS MATERIALIZED (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM li x JOIN li y ON x.k = y.k AND x.p < y.p
        |), deg AS (
        |  SELECT a AS v, count(*) AS deg FROM (
        |    SELECT a, b FROM und UNION ALL SELECT b, a FROM und
        |  ) GROUP BY a
        |), orient AS MATERIALIZED (
        |  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |              THEN e.a ELSE e.b END AS u,
        |         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
        |              THEN e.b ELSE e.a END AS w
        |  FROM und e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
        |), tri AS (
        |  SELECT w1.u, w1.w AS x, w2.w AS y
        |  FROM orient w1 JOIN orient w2 ON w1.u = w2.u AND w1.w < w2.w
        |  WHERE EXISTS (SELECT 1 FROM und c
        |                WHERE c.a = least(w1.w, w2.w) AND c.b = greatest(w1.w, w2.w))
        |), corners AS (
        |  SELECT u AS v FROM tri UNION ALL SELECT x FROM tri
        |  UNION ALL SELECT y FROM tri
        |), per_node AS (
        |  SELECT v, count(*) AS n_tri FROM corners GROUP BY v
        |), cc AS (
        |  SELECT (2 * COALESCE(t.n_tri, 0) * 1000000)
        |    // (d.deg * (d.deg - 1)) AS cc_micro
        |  FROM deg d LEFT JOIN per_node t ON d.v = t.v
        |  WHERE d.deg >= 2
        |)
        |SELECT cc_micro // 100000 AS decile,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(cc_micro) AS BIGINT) AS sum_cc
        |FROM cc GROUP BY 1""".stripMargin,

    "graph_bfs_dist" -> withGraph(bfsSql(iters = 6)),
    // identical semantics over the disk-materialized bucketed adjacency —
    // the storage swap must be invisible in the result
    "graph_bfs_bucketed" -> withGraph(bfsSql(iters = 6)),
    "graph_eccentricity" -> withGraph(
      eccSql(iters = 6, Seq("ASIA", "EUROPE", "AFRICA"))),
    "graph_fwbw" -> withGraph(fwBwSql(iters = 6)),
    "graph_scc_bounded" -> withGraph(sccBoundedSql(iters = 6)),
    "graph_matching" -> matchingSql(iters = 8),
    "graph_coloring" -> coloringSql(iters = 8),
    "graph_mis" -> misSql(iters = 8),

    // butterfly (bipartite 4-cycle) count with the mirrored left-degree
    // cap (GraphAlgorithms.butterflyStats)
    "graph_butterflies" ->
      """WITH e AS (
        |  SELECT DISTINCT l_orderkey AS l, l_partkey AS r FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        |), keep AS (
        |  SELECT l FROM e GROUP BY l HAVING count(*) <= 20
        |), k AS (SELECT e.l, e.r FROM e SEMI JOIN keep USING (l)),
        |co AS (
        |  SELECT x.r AS r1, y.r AS r2, count(*) AS c
        |  FROM k x JOIN k y ON x.l = y.l AND x.r < y.r
        |  GROUP BY 1, 2
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_wedge_pairs,
        |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_butterflies,
        |  CAST(max(c) AS BIGINT) AS max_cooccurrence
        |FROM co""".stripMargin,
    "graph_assortativity" -> withGraph(
      """, adjd AS (SELECT DISTINCT a, b FROM bidir),
        |deg AS (SELECT a, count(*) AS deg FROM adjd GROUP BY a),
        |j AS (
        |  SELECT x.deg AS da, y.deg AS db
        |  FROM adjd e JOIN deg x ON e.a = x.a JOIN deg y ON e.b = y.a
        |), s AS (
        |  SELECT count(*) AS m, sum(da * db) AS sxy, sum(da) AS sx,
        |    sum(da * da) AS sxx
        |  FROM j)
        |SELECT CAST(m AS BIGINT) AS m, CAST(sxy AS BIGINT) AS sxy,
        |  CAST(sx AS BIGINT) AS sx, CAST(sxx AS BIGINT) AS sxx,
        |  round(CAST(m * sxy - sx * sx AS DOUBLE) /
        |        NULLIF(CAST(m * sxx - sx * sx AS DOUBLE), 0), 6)
        |    AS assortativity
        |FROM s""".stripMargin),

    "graph_harmonic" ->
      s"""SELECT CAST(sum(n_nodes * (1000000 // dist)) AS BIGINT)
         |    AS harmonic_micro,
         |  CAST(sum(n_nodes) AS BIGINT) AS n_reached
         |FROM (
         |${withGraph(bfsSql(iters = 6))}
         |) WHERE dist > 0""".stripMargin,

    "graph_ppr" -> withGraph(pprSql(iters = 5, k = 20)),
    "graph_hits" -> withGraph(hitsSql(iters = 3, k = 20)),

    // bounded Bellman-Ford over the affinity-weighted co-occurrence graph
    // (integer weights -> exact Long distances; source = min node id)
    "graph_sssp" -> ssspSql(iters = 4, k = 20),

    // LLM2 context + answer formatting (§2.8; retriever.py:39-40 +
    // llm2.py:34,67-71) over the pipeline_retrieve result: per-node
    // "name: <v>" lines joined by a blank line in retrieval order, and
    // the '|'-joined answer list.
    "fmt_context" -> withGraph(
      s"""${pipelineRetrieveCtes(maxNodes = 30, ef = 1000)}
         |SELECT
         |  string_agg('name: ' || name, chr(10) || chr(10) ORDER BY rank) AS context,
         |  string_agg(name, '|' ORDER BY rank) AS answers
         |FROM pr""".stripMargin),

    "s2_constraint_check" -> withGraph(
      """SELECT CAST(count(*) AS BIGINT) AS n_violations FROM (
        |  SELECT nodeId FROM nodes GROUP BY nodeId HAVING count(*) > 1
        |)""".stripMargin),

    "a7_corpus_count" -> s"""SELECT lang,
        |  CAST(sum(coalesce(list_sum(list_transform($wordsExpr,
        |    w -> CASE WHEN w = 'the' THEN 1 ELSE 0 END)), 0)) AS BIGINT) AS n_the
        |FROM documents GROUP BY lang""".stripMargin,

    "text_scrub" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN regexp_replace(text, '[0-9]+', '#', 'g') <> text
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(length(text) - length(regexp_replace(text, '[0-9]+', '#', 'g')))
        |    AS BIGINT) AS chars_removed
        |FROM documents GROUP BY source""".stripMargin,

    // train = doc_id % 13 <> 0, eval = % 13 = 0; shared distinct 3-gram
    // shingles per train doc (Curation.contaminationHits joins on the 60-bit
    // md5 hash; the oracle joins on the shingle string — identical counts
    // under the index family's collision-freedom assumption)
    "curate_decontam" -> s"""$shingleCte,
        |tr AS (
        |  SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 13 <> 0
        |), ev AS (
        |  SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 13 = 0
        |)
        |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM tr JOIN ev ON tr.shingle = ev.shingle
        |GROUP BY tr.doc_id""".stripMargin,

    "curate_hash_split" ->
      """WITH b AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |    AS bucket, n_chars
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'validation'
        |            WHEN bucket >= 90 THEN 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM b GROUP BY 1""".stripMargin,

    // top-10 docs per source by (n_chars desc, doc_id) — Curation
    // .stratifiedCapStats(quota = 10)
    "curate_stratified" ->
      """WITH rk AS (
        |  SELECT source, n_chars, row_number() OVER
        |    (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |  CAST(min(n_chars) AS BIGINT) AS cutoff_chars
        |FROM rk WHERE rk <= 10 GROUP BY source""".stripMargin,

    // exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // quantile_cont: both linear-interpolation)
    "text_quantiles" -> s"""WITH t AS (
        |  SELECT lang, coalesce(${tokExpr("text")}, 0) AS tok FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(tok, 0.5), 6) AS p50_tok,
        |  round(quantile_cont(tok, 0.9), 6) AS p90_tok,
        |  round(quantile_cont(tok, 0.99), 6) AS p99_tok
        |FROM t GROUP BY lang""".stripMargin,

    // 2-D selective scan over the z-order-clustered lineitem copy; values
    // must equal the same filter over the original table (the layout is
    // invisible in the result — only the files touched change)
    "layout_zorder" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey < 1000 AND l_partkey < 200
        |GROUP BY l_returnflag""".stripMargin,

    // Hilbert xy2d replayed as 15 unrolled reflect-and-swap CTE levels
    // (mirrors graft.expr.HilbertIndex cell for cell)
    "layout_hilbert" ->
      s"""WITH ${hilbertCtes(15)}
        |SELECT d // 1048576 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(d) AS BIGINT) AS min_h, CAST(max(d) AS BIGINT) AS max_h,
        |  CAST(sum(d) AS BIGINT) AS sum_h
        |FROM l15 GROUP BY 1""".stripMargin,

    // hourly rollup of one type over the hive-partitioned events copy;
    // must equal the same query over the raw table (partition pruning is
    // a physical property, invisible in the result)
    "layout_partitioned" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |  event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin,

    // corpus-trained add-one-smoothed bigram likelihood per document
    // (graft.operators.LangModel.bigramScore): c2 = bigram count, c1 =
    // bigram-first-word count, v = vocabulary size; docs with < 2 tokens
    // have no bigrams and are omitted
    "text_lm_bigram" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $wordsExpr AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks
        |  WHERE len(w) >= 2
        |), perdoc AS (
        |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, count(*) AS m
        |  FROM idx GROUP BY 1, 2, 3
        |), c2 AS (
        |  SELECT w1, w2, sum(m) AS c2 FROM perdoc GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT t) AS v
        |  FROM (SELECT unnest(w) AS t FROM toks)
        |)
        |SELECT p.doc_id, CAST(sum(p.m) AS BIGINT) AS n_bigrams,
        |  round(sum(p.m * (c2.c2 + 1) / (c1.c1 + v.v)) / sum(p.m), 6) AS score
        |FROM perdoc p
        |JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
        |JOIN c1 ON p.w1 = c1.w1
        |CROSS JOIN v
        |GROUP BY p.doc_id""".stripMargin,

    // held-out stupid-backoff trigram scoring (model = even docs, eval =
    // odd docs; 0.4 and 0.16 as 4/10 and 16/100 integer rationals) —
    // mirrors LangModel.trigramBackoffScore case for case
    "text_lm_trigram" ->
      s"""WITH d AS (
        |  SELECT doc_id, source, $wordsExpr AS w FROM documents
        |), tr AS (SELECT w FROM d WHERE doc_id % 2 = 0),
        |ev AS (SELECT doc_id, w FROM d WHERE doc_id % 2 = 1),
        |t3 AS (
        |  SELECT w[i] AS a, w[i+1] AS b, w[i+2] AS c, count(*) AS c3
        |  FROM (SELECT w, unnest(range(1, len(w) - 1)) AS i FROM tr
        |        WHERE len(w) >= 3)
        |  GROUP BY 1, 2, 3
        |), t2 AS (
        |  SELECT w[i] AS x, w[i+1] AS y, count(*) AS c2
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM tr
        |        WHERE len(w) >= 2)
        |  GROUP BY 1, 2
        |), t1 AS (
        |  SELECT t AS x, count(*) AS c1
        |  FROM (SELECT unnest(w) AS t FROM tr) GROUP BY 1
        |), nn AS (
        |  SELECT count(*) AS n FROM (SELECT unnest(w) AS t FROM tr)
        |), et AS (
        |  SELECT doc_id, w[i] AS a, w[i+1] AS b, w[i+2] AS c, count(*) AS m
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM ev
        |        WHERE len(w) >= 3)
        |  GROUP BY 1, 2, 3, 4
        |), j AS (
        |  SELECT et.doc_id, et.m, t3.c3, ab.c2 AS c2ab, bc.c2 AS c2bc,
        |    b1.c1 AS c1b, cc.c1 AS c1c, nn.n
        |  FROM et
        |  LEFT JOIN t3 USING (a, b, c)
        |  LEFT JOIN t2 ab ON et.a = ab.x AND et.b = ab.y
        |  LEFT JOIN t2 bc ON et.b = bc.x AND et.c = bc.y
        |  LEFT JOIN t1 b1 ON et.b = b1.x
        |  LEFT JOIN t1 cc ON et.c = cc.x
        |  CROSS JOIN nn
        |), s AS (
        |  SELECT doc_id, m,
        |    CASE WHEN c3 IS NOT NULL THEN (c3 * 1000000) // c2ab
        |         WHEN c2bc IS NOT NULL THEN (4 * c2bc * 1000000) // (10 * c1b)
        |         WHEN c1c IS NOT NULL THEN (16 * c1c * 1000000) // (100 * n)
        |         ELSE 0 END AS contrib,
        |    CASE WHEN c3 IS NULL THEN m ELSE 0 END AS bk
        |  FROM j
        |), pd AS (
        |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS nt,
        |    CAST(sum(m * contrib) AS BIGINT) AS sc,
        |    CAST(sum(bk) AS BIGINT) AS nb
        |  FROM s GROUP BY doc_id
        |)
        |SELECT d2.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS sum_trigrams,
        |  CAST(sum(sc) AS BIGINT) AS sum_score_micro,
        |  CAST(sum(nb) AS BIGINT) AS sum_backoff
        |FROM pd JOIN (SELECT doc_id, source FROM documents) d2 USING (doc_id)
        |GROUP BY 1""".stripMargin,

    // per-source ntile-4 curriculum routing over the bigram-LM scores
    // (same model CTEs as text_lm_bigram; score round-6 + doc_id total
    // order makes the tiling engine-portable)
    "corpus_tiers" ->
      s"""WITH toks AS (
        |  SELECT doc_id, $wordsExpr AS w FROM documents
        |), idx AS (
        |  SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks
        |  WHERE len(w) >= 2
        |), perdoc AS (
        |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, count(*) AS m
        |  FROM idx GROUP BY 1, 2, 3
        |), c2 AS (
        |  SELECT w1, w2, sum(m) AS c2 FROM perdoc GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT t) AS v
        |  FROM (SELECT unnest(w) AS t FROM toks)
        |), scored AS (
        |  SELECT p.doc_id, CAST(sum(p.m) AS BIGINT) AS n_bigrams,
        |    round(sum(p.m * (c2.c2 + 1) / (c1.c1 + v.v)) / sum(p.m), 6) AS score
        |  FROM perdoc p
        |  JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
        |  JOIN c1 ON p.w1 = c1.w1
        |  CROSS JOIN v
        |  GROUP BY p.doc_id
        |), tiered AS (
        |  SELECT d.source, s.n_bigrams, s.score,
        |    ntile(4) OVER (PARTITION BY d.source
        |      ORDER BY s.score, s.doc_id) AS tier
        |  FROM scored s JOIN documents d USING (doc_id)
        |)
        |SELECT source, tier, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  round(min(score), 6) AS min_score,
        |  round(max(score), 6) AS max_score
        |FROM tiered GROUP BY source, tier""".stripMargin,

    // concatenate-and-cut packing, budget 200 tokens, per-source shards,
    // doc_id order; a doc's chunk is where its FIRST token lands
    "curate_pack" -> s"""WITH t AS (
        |  SELECT source, doc_id, coalesce(${tokExpr("text")}, 0) AS tok
        |  FROM documents
        |), o AS (
        |  SELECT source, tok, sum(tok) OVER (PARTITION BY source
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok AS start_off
        |  FROM t
        |)
        |SELECT source, CAST(floor(start_off / 200) AS BIGINT) AS chunk,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS chunk_tokens
        |FROM o GROUP BY 1, 2""".stripMargin,

    // the composed curation pipeline: eval holdout (doc_id % 13 = 0) →
    // exact dedup (min doc_id per md5(text)) → decontam (any 3-gram
    // overlap with eval ⇒ drop) → md5 split → packing (budget 200,
    // (split, source) shards) → per-split manifest
    "curate_e2e" -> s"""$shingleCte,
        |ex AS (
        |  SELECT doc_id, text, source FROM (
        |    SELECT doc_id, text, source,
        |      min(doc_id) OVER (PARTITION BY md5(text)) AS k
        |    FROM documents WHERE doc_id % 13 <> 0)
        |  WHERE doc_id = k
        |), tr AS (
        |  SELECT s.doc_id, unnest(s.s) AS shingle
        |  FROM sh s JOIN ex ON ex.doc_id = s.doc_id
        |), ev AS (
        |  SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 13 = 0
        |), bad AS (
        |  SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.shingle = ev.shingle
        |), spl AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'validation'
        |      WHEN b >= 90 THEN 'test' END AS split
        |  FROM (
        |    SELECT ex.*, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 100 AS b
        |    FROM ex LEFT JOIN bad USING (doc_id) WHERE bad.doc_id IS NULL)
        |), off AS (
        |  SELECT split, source, tok, sum(tok) OVER (PARTITION BY split, source
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - tok AS start_off
        |  FROM (SELECT split, source, doc_id, coalesce(${tokExpr("text")}, 0) AS tok
        |        FROM spl)
        |)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT (source, CAST(floor(start_off / 200) AS BIGINT)))
        |    AS BIGINT) AS n_chunks
        |FROM off GROUP BY split""".stripMargin,

    // spark.sql text through the injected expressions; NFC of ASCII source
    // names is the identity, so the oracle needs no normalization
    "sql_surface" -> s"""SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(${tokExpr("text")}, 0)) AS BIGINT) AS total_tokens,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM documents GROUP BY lang""".stripMargin,

    // temperature-scaled (T=2 ⇒ sqrt) source-rebalancing weights
    // Encoding-repair audit: the Spark side injects deterministic mojibake
    // (doc_id%3: ' menu: cafÃ©...' = +3 repairable 2-char sequences) and
    // legit Latin-1-range text (doc_id%5: naïve/façade — whose bytes make
    // the whole-string reinterpretation invalid UTF-8) and runs the REAL
    // conservative repair; the oracle derives the outcome analytically:
    // suspect = has the Ã marker; repaired = mojibake present AND no
    // legit non-ASCII blocking validity; 3 chars reclaimed per repair.
    "curate_fix_encoding" ->
      """WITH d AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS moj,
        |    CASE WHEN doc_id % 3 = 0 AND doc_id % 5 <> 0 THEN 1 ELSE 0 END
        |      AS rep
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(moj) AS BIGINT) AS n_suspect,
        |  CAST(sum(rep) AS BIGINT) AS n_repaired,
        |  CAST(3 * sum(rep) AS BIGINT) AS chars_saved
        |FROM d GROUP BY source""".stripMargin,

    // first-occurrence novelty: min-doc_id owner per 60-bit shingle hash,
    // least-novel 20 docs; no DISTINCT in post — shingleSets already
    // array_distincts per doc, and both engines keep within-doc hash ties
    "curate_novelty" -> s"""$shingleCte,
        |post AS (
        |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), fo AS (
        |  SELECT h, min(doc_id) AS first_doc FROM post GROUP BY h
        |)
        |SELECT doc_id, n_shingles, n_novel,
        |  round(n_novel * 1.0 / n_shingles, 6) AS novelty
        |FROM (
        |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM post p JOIN fo f ON p.h = f.h GROUP BY p.doc_id)
        |ORDER BY novelty, doc_id LIMIT 20""".stripMargin,

    // p05/p95 length trim: percent_rank is (rank-1)/(n-1), an exact
    // small-integer rational, so the band edges agree across engines
    "curate_length_trim" -> """WITH d AS (
        |  SELECT source, length(text) AS len,
        |    percent_rank() OVER (PARTITION BY source ORDER BY length(text))
        |      AS pr
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  min(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN len END)
        |    AS min_kept_len,
        |  max(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN len END)
        |    AS max_kept_len,
        |  CAST(sum(CASE WHEN pr >= 0.05 AND pr <= 0.95 THEN len END)
        |    AS BIGINT) AS kept_chars
        |FROM d GROUP BY source""".stripMargin,

    // DSIR importance weighting rebuilt in SQL: same digit-only-MD5 bucket
    // hash as text_feature_hash, add-one-smoothed integer micro-ratio,
    // selection rule mean-ratio >= 1
    "curate_dsir" ->
      s"""WITH w AS (
        |  SELECT doc_id, source, unnest($wordsExpr) AS tok FROM documents
        |), b AS (
        |  SELECT doc_id, source,
        |    CAST(substr(regexp_replace(md5(tok), '[a-f]', '', 'g') || '000000',
        |      1, 6) AS BIGINT) % 64 AS slot
        |  FROM w
        |), r AS (
        |  SELECT slot,
        |    ((sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1) * 1000000)
        |      // (sum(CASE WHEN source = 'src0' THEN 0 ELSE 1 END) + 1) AS rm
        |  FROM b GROUP BY slot
        |), ds AS (
        |  SELECT b.doc_id, any_value(b.source) AS source,
        |    count(*) AS n_toks, sum(r.rm) AS score
        |  FROM b JOIN r ON r.slot = b.slot
        |  WHERE b.source <> 'src0'
        |  GROUP BY b.doc_id
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN score >= n_toks * 1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_selected,
        |  CAST(sum(score) AS BIGINT) AS sum_score_micro
        |FROM ds GROUP BY source""".stripMargin,

    // PII audit round trip: the same doc_id-derived emails/IPs/phones are
    // appended by both engines, then each counts and redacts with its own
    // regex engine (Spark: java.util.regex; here: RE2). Patterns live in
    // the shared RE2 ∩ Java subset; DuckDB's regexp_replace needs the 'g'
    // flag to match Spark's replace-all semantics.
    // HTML strip over injected markup: same tag regex (with 'g'), same
    // literal entity replaces with &amp; strictly last — mirrors
    // Curation.htmlStripOf/htmlInjectedStats
    "curate_html_strip" ->
      """WITH a AS (
        |  SELECT source,
        |    '<div class="c' || CAST(doc_id % 5 AS VARCHAR) || '"><p>' ||
        |    text || '</p>' ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' &amp;lt; x &lt;b&gt;'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' &quot;q&quot; &#39;a&#39;'
        |         ELSE '' END || '</div>' AS aug
        |  FROM documents
        |), s AS (
        |  SELECT source, aug,
        |    replace(replace(replace(replace(replace(
        |      regexp_replace(aug, '<[^>]+>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', chr(39)), '&amp;', '&') AS stripped
        |  FROM a
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(aug, '<[^>]+>'))) AS BIGINT)
        |    AS n_tags,
        |  CAST(sum(len(regexp_extract_all(aug, '&(amp|lt|gt|quot|#39);')))
        |    AS BIGINT) AS n_entities,
        |  CAST(sum(length(stripped)) AS BIGINT) AS stripped_len
        |FROM s GROUP BY source""".stripMargin,

    // URL canonicalization collapse (mirrors Curation.urlCanonicalStats):
    // three injected raw variants per canonical link — uppercase host /
    // #fragment / trailing slash — then lowercase-host + strip-fragment +
    // strip-trailing-slash; counts per canonical domain
    "curate_url_canonical" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' ' ||
        |    CASE WHEN doc_id % 3 = 1 THEN base || '#f' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 3 = 2 THEN base || '/'
        |         ELSE base END AS aug
        |  FROM (
        |    SELECT doc_id, text,
        |      'https://' || CASE WHEN doc_id % 3 = 0 THEN 'EX' ELSE 'ex' END ||
        |      CAST((doc_id // 3) % 7 AS VARCHAR) || '.org/p/' ||
        |      CAST((doc_id // 3) % 40 AS VARCHAR) AS base
        |    FROM documents)
        |), u AS (
        |  SELECT unnest(regexp_extract_all(aug,
        |    'https?://[A-Za-z0-9._/?=#-]+')) AS url
        |  FROM aug
        |), c AS (
        |  SELECT url,
        |    regexp_replace(
        |      lower(regexp_extract(nofrag, '^(https?://[A-Za-z0-9.-]+)', 1)) ||
        |      regexp_extract(nofrag, '^https?://[A-Za-z0-9.-]+(.*)$', 1),
        |      '/$', '') AS canon
        |  FROM (SELECT url, regexp_replace(url, '#.*$', '') AS nofrag FROM u)
        |)
        |SELECT regexp_extract(canon, 'https?://([a-z0-9.-]+)', 1) AS domain,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
        |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canonical,
        |  CAST(count(DISTINCT url) - count(DISTINCT canon) AS BIGINT)
        |    AS n_collapsed
        |FROM c GROUP BY 1""".stripMargin,

    // URL/domain extraction over injected links: positive character-class
    // regex (RE2 ∩ java.util.regex), domain = capture group 1; mirrors
    // Curation.urlInjectedStats cell for cell
    "curate_url_domains" ->
      """WITH a AS (
        |  SELECT source, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' see https://ex' ||
        |      (doc_id % 7) || '.org/p/' || (doc_id % 100) ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' ref http://w' ||
        |      (doc_id % 5) || '.ex' || (doc_id % 7) || '.net/q?id=' ||
        |      doc_id ELSE '' END AS t
        |  FROM documents
        |), u AS (
        |  SELECT source,
        |    unnest(regexp_extract_all(t, 'https?://[A-Za-z0-9._/?=-]+'))
        |      AS url
        |  FROM a
        |), d AS (
        |  SELECT source, url,
        |    regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
        |  FROM u
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(sum(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_https,
        |  CAST(count(DISTINCT domain) AS BIGINT) AS n_domains,
        |  CAST(sum(length(url)) AS BIGINT) AS sum_url_len
        |FROM d GROUP BY source
        |ORDER BY source""".stripMargin,

    "curate_pii" ->
      """WITH a AS (
        |  SELECT source, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' mail u' || doc_id || '@ex' ||
        |      (doc_id % 7) || '.org' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' host 10.' || (doc_id % 256) ||
        |      '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 100)
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call ' || (100 + doc_id % 900) ||
        |      '-' || (100 + (doc_id * 3) % 900) || '-' ||
        |      (1000 + doc_id % 9000) ELSE '' END AS t
        |  FROM documents
        |), c AS (
        |  SELECT source, t,
        |    len(regexp_extract_all(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
        |    len(regexp_extract_all(t,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
        |    len(regexp_extract_all(t, '\b\d{3}-\d{3}-\d{4}\b')) AS np,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM a
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ne) AS BIGINT) AS n_email,
        |  CAST(sum(ni) AS BIGINT) AS n_ipv4,
        |  CAST(sum(np) AS BIGINT) AS n_phone,
        |  CAST(sum(CASE WHEN red <> t THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_redacted,
        |  CAST(sum(length(red)) AS BIGINT) AS redacted_len
        |FROM c GROUP BY source""".stripMargin,

    // Tar-shard round trip: the Spark side writes documents as WebDataset
    // USTAR shards (<key>.txt + <key>.cls entries) and re-reads the BYTES;
    // the oracle recomputes the per-ext invariants from the table alone.
    // the Spark side audits documents AFTER a JSONL write+read round trip;
    // the oracle audits the parquet directly — equality proves fidelity
    "jsonl_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    // same parquet-direct audit as jsonl/csv: the Spark side must
    // reproduce it THROUGH the ORC encode/decode for equality to hold
    "orc_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    // gzip JSONL: same parquet-direct audit, reproduced THROUGH the
    // compressed encode/decode
    "jsonl_gzip_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    // schema evolution: even docs predate the quality column (null under
    // mergeSchema), odd docs carry length%100 — the oracle replays the
    // split from the base table
    "lake_schema_evolution" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pre_schema,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN length(text) % 100
        |    ELSE 0 END) AS BIGINT) AS sum_quality
        |FROM documents GROUP BY source""".stripMargin,

    // same parquet-direct audit as jsonl/csv/orc: the Spark side must
    // reproduce it THROUGH the Avro container encode/decode
    "avro_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    // same parquet-direct audit as jsonl_roundtrip: the Spark side must
    // reproduce it THROUGH the CSV encode/decode for equality to hold
    "csv_roundtrip" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    "tar_shards_roundtrip" ->
      """SELECT 'cls' AS ext, CAST(count(*) AS BIGINT) AS n_entries,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys,
        |  CAST(sum(octet_length(encode(lang))) AS BIGINT) AS sum_bytes,
        |  CAST(sum(ascii(substr(lang, 1, 1))) AS BIGINT) AS sum_first
        |FROM documents
        |UNION ALL
        |SELECT 'txt', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT doc_id) AS BIGINT),
        |  CAST(sum(octet_length(encode(text))) AS BIGINT),
        |  CAST(sum(ascii(substr(text, 1, 1))) AS BIGINT)
        |FROM documents
        |ORDER BY ext""".stripMargin,

    // DataSource V2 pruned scan over the same shards: payload is pruned so
    // the reader skips every data block; byte totals come from the ustar
    // header size field and must still equal the encoded source columns
    "tar_dsv2_pruned" ->
      """SELECT 'cls' AS ext, CAST(count(*) AS BIGINT) AS n_entries,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_keys,
        |  CAST(sum(octet_length(encode(lang))) AS BIGINT) AS sum_bytes
        |FROM documents
        |UNION ALL
        |SELECT 'txt', CAST(count(*) AS BIGINT),
        |  CAST(count(DISTINCT doc_id) AS BIGINT),
        |  CAST(sum(octet_length(encode(text))) AS BIGINT)
        |FROM documents
        |ORDER BY ext""".stripMargin,

    "curate_rebalance" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
        |), t AS (
        |  SELECT sum(n) AS total, sum(sqrt(n)) AS sm FROM s
        |)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  round(n / total, 6) AS share,
        |  round(sqrt(n) / sm, 6) AS weight,
        |  round(sqrt(n) / sm / (n / total), 6) AS boost
        |FROM s, t""".stripMargin,

    // deterministic training-shard shuffle: shard and within-shard order
    // both come from the salted 60-bit md5 (Dedup.md5Long), so rank·id
    // pins the exact per-shard sequence across engines
    "curate_shard_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 15))::BIGINT AS h
        |  FROM documents
        |), r AS (
        |  SELECT CAST(h % 16 AS INTEGER) AS shard, doc_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY h % 16 ORDER BY h, doc_id) AS BIGINT) AS rk
        |  FROM h
        |)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(rk * doc_id) AS BIGINT) AS order_check
        |FROM r GROUP BY shard""".stripMargin,

    // linear classifier apply: hashed-unigram slots (the text_feature_hash
    // bucket recipe) × slot weights derived from md5('w:<slot>') — logits
    // in exact integer units, empty-token docs contribute logit 0
    "curate_classifier_score" ->
      s"""WITH tok AS (SELECT doc_id, unnest($wordsExpr) AS tok FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CAST(substr(regexp_replace(md5(tok), '[a-f]', '', 'g') || '000000',
        |      1, 6) AS BIGINT) % 16 AS slot
        |  FROM tok
        |), wt AS (
        |  SELECT s.slot,
        |    CAST(substr(regexp_replace(md5('w:' || s.slot), '[a-f]', '', 'g')
        |      || '000000', 1, 6) AS BIGINT) % 2001 - 1000 AS wv
        |  FROM (SELECT unnest(range(0, 16)) AS slot) s
        |), l AS (
        |  SELECT b.doc_id, CAST(sum(wt.wv) AS BIGINT) AS logit
        |  FROM b JOIN wt ON b.slot = wt.slot GROUP BY 1
        |)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN coalesce(l.logit, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pos,
        |  CAST(sum(coalesce(l.logit, 0)) AS BIGINT) AS sum_logit
        |FROM documents d LEFT JOIN l ON l.doc_id = d.doc_id
        |GROUP BY d.source""".stripMargin,

    // batch-perceptron training unrolled (mirrors
    // Curation.classifierTrainStats): hashed unigram counts + bias slot,
    // labels from the length gate, per round margins -> mistake set ->
    // integer gradient -> weight update; pure sums of integer products,
    // so exact in both engines
    "curate_classifier_train" -> {
      val rounds = (1 to 3).map { t =>
        s"""m$t AS (
           |  SELECT doc_id, y, SUM(cnt * w) AS m
           |  FROM feats JOIN w${t - 1} USING (slot) GROUP BY 1, 2
           |), g$t AS (
           |  SELECT slot, SUM(y * cnt) AS g FROM feats
           |  WHERE doc_id IN (SELECT doc_id FROM m$t WHERE y * m <= 0)
           |  GROUP BY slot
           |), w$t AS (
           |  SELECT w${t - 1}.slot, w${t - 1}.w + coalesce(g$t.g, 0) AS w
           |  FROM w${t - 1} LEFT JOIN g$t USING (slot)
           |)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (SELECT doc_id, $wordsExpr AS ws FROM documents),
        |yv AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(ws) >= 56 THEN 1 ELSE -1 END AS BIGINT) AS y
        |  FROM base
        |),
        |tok AS (
        |  SELECT doc_id,
        |    CAST(substr(regexp_replace(md5(t), '[a-f]', '', 'g') || '000000',
        |      1, 6) AS BIGINT) % 16 AS slot,
        |    count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(ws) AS t FROM base) GROUP BY 1, 2
        |),
        |feats AS (
        |  SELECT t.doc_id, t.slot, t.cnt, y.y
        |  FROM tok t JOIN yv y USING (doc_id)
        |  UNION ALL
        |  SELECT doc_id, CAST(16 AS BIGINT), CAST(1 AS BIGINT), y FROM yv
        |),
        |w0 AS (SELECT unnest(range(0, 17)) AS slot, CAST(0 AS BIGINT) AS w),
        |$rounds,
        |mf AS (
        |  SELECT doc_id, y, SUM(cnt * w) AS m
        |  FROM feats JOIN w3 USING (slot) GROUP BY 1, 2
        |),
        |fm AS (
        |  SELECT SUM(CASE WHEN y * m <= 0 THEN 1 ELSE 0 END) AS n_mistakes
        |  FROM mf
        |)
        |SELECT CAST(w3.slot AS BIGINT) AS slot, CAST(w3.w AS BIGINT) AS w,
        |  CAST(fm.n_mistakes AS BIGINT) AS n_mistakes
        |FROM w3, fm ORDER BY slot""".stripMargin
    },

    // weighted sampling by temperature boost: floor() before the BIGINT
    // cast in both engines (Spark truncates, DuckDB rounds); salted md5
    // acceptance hash mirrors Dedup.md5Long(x, 8)
    "curate_sampled" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
        |), t AS (
        |  SELECT sum(n) AS total, sum(sqrt(n)) AS sm FROM s
        |), rates AS (
        |  SELECT source,
        |    least(1000000, CAST(floor(
        |      round(sqrt(n) / sm / (n / total), 6) * 300000) AS BIGINT)) AS r_micro
        |  FROM s, t
        |)
        |SELECT d.source, r.r_micro, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN
        |    ('0x' || substr(md5('sample|' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 < r.r_micro THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents d JOIN rates r ON d.source = r.source
        |GROUP BY d.source, r.r_micro""".stripMargin,

    // near-dup (bag-of-words fingerprint) groups spanning train/val/test
    // splits — evaluation leakage QA
    "curate_split_leakage" ->
      s"""WITH d AS (
        |  SELECT md5(array_to_string(list_sort(list_distinct(
        |    ${wordsExprOf("lower(text)")})), ' ')) AS content_hash,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80 THEN 'train'
        |         WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90 THEN 'validation'
        |         ELSE 'test' END AS split
        |  FROM documents
        |), g AS (
        |  SELECT content_hash, count(DISTINCT split) AS n_splits,
        |    count(*) AS n_docs
        |  FROM d GROUP BY content_hash
        |)
        |SELECT n_splits, CAST(count(*) AS BIGINT) AS n_groups
        |FROM g WHERE n_docs > 1 GROUP BY n_splits""".stripMargin,

    // inverted-index TF-IDF probe: integer micro-unit scoring
    // ((tf * 1e6 * N) // df — exact in both engines, order-independent sum)
    "search_tfidf" -> searchTfidfSql,
    // the persisted bucket-partitioned index probe must reproduce the
    // in-memory TF-IDF ranking exactly — same oracle
    "search_store_tfidf" -> searchTfidfSql,

    // append-built store ≡ one-shot store ≡ the corpus-scan TF-IDF
    "search_store_append" -> searchTfidfSql,

    // stemmed TF-IDF: the SAME Harman S-stem CASE text Search.sStemSql
    // embeds on the Spark side (LIKE/substr/concat parse identically in
    // both engines); query terms pre-stemmed: vectors→vector,
    // queries→query, joins→join, windows→window
    "search_stemmed" ->
      s"""WITH p AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, ${graft.operators.Search.sStemSql
              .replace("\n", " ")} AS term FROM (
        |      SELECT doc_id, unnest(${wordsExprOf("lower(text)")}) AS term
        |      FROM documents
        |    )
        |  ) WHERE term IN ('vector', 'query', 'join', 'window')
        |  GROUP BY doc_id, term
        |), d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum((tf * 1000000 * n_docs) // df) AS BIGINT) AS score_micro
        |FROM p JOIN d USING (term) CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // BM25 mirror: same tokenizer, same two integer divisions in the same
    // positions (idf doubled-rational, saturation cleared by 10·L; see
    // Search.bm25TopK). All operands positive → // ≡ div.
    "search_bm25" ->
      s"""WITH wl AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS ws FROM documents
        |), dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM wl),
        |p AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS term FROM wl
        |  ) WHERE term IN ('vector', 'hash', 'join', 'window')
        |  GROUP BY doc_id, term
        |), d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |n AS (SELECT count(*) AS n_docs, sum(dl) AS corpus_len FROM dl)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(
        |    ((((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1))
        |     * ((22 * tf * corpus_len * 1000000)
        |        // (10 * tf * corpus_len + 3 * corpus_len + 9 * dl * n_docs)))
        |    // 1000000) AS BIGINT) AS score_micro
        |FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    "text_bpe_vocab" -> bpeSql(graft.Queries.bpeMerges, k = 20),

    // fertility: the bpeSql fold with the source column riding along and
    // tokens counted arithmetically (no unnest)
    "text_bpe_fertility" -> {
      val merges = graft.Queries.bpeMerges
      def d(s: String) = s"chr(31) || '$s' || chr(31)"
      val chain = merges.zipWithIndex.map { case ((a, b), i) =>
        s"""s${i + 1} AS (SELECT source, replace(s,
           |  chr(31) || '$a' || chr(31) || ${d(b)},
           |  ${d(a + b)}) AS s FROM s$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH w AS (
         |  SELECT source, unnest(${wordsExprOf("lower(text)")}) AS word
         |  FROM documents
         |), s0 AS (
         |  SELECT source, substr(regexp_replace(word, '(.)',
         |    chr(31) || chr(31) || '\\1', 'g'), 2) || chr(31) AS s FROM w
         |),
         |$chain,
         |t AS (
         |  SELECT source, CAST(len(string_split(trim(s, chr(31)),
         |    chr(31) || chr(31))) AS BIGINT) AS toks
         |  FROM s${merges.size}
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST((sum(toks) * 1000000) // count(*) AS BIGINT)
         |    AS fertility_micro
         |FROM t GROUP BY source ORDER BY source""".stripMargin
    },

    "text_bpe_learn" -> bpeLearnSql(k = 8),

    // rational Simpson index over the per-doc character histogram — the
    // log-free character-entropy filter, integer micro-units throughout
    "text_char_diversity" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(text) + 1),
        |    i -> substr(text, CAST(i AS INT), 1))) AS ch
        |  FROM documents WHERE len(text) > 0
        |), c AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM ch GROUP BY 1, 2
        |)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(1000000 - (1000000 * sum(c * c))
        |    // (sum(c) * sum(c)) AS BIGINT) AS diversity_micro
        |FROM c GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "text_ttr" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT w) AS BIGINT) AS n_types,
        |  round(CAST(count(DISTINCT w) AS DOUBLE) / count(*), 6) AS ttr
        |FROM (SELECT source, unnest(${wordsExprOf("lower(text)")}) AS w
        |      FROM documents)
        |GROUP BY source""".stripMargin,

    // Church-Gale burstiness: per-(doc, term) counts, per-term moments,
    // dispersion (N*ss - s^2)*1e6 // (s*(N-1)) with N = total docs
    "text_burstiness" ->
      s"""WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |pd AS (
        |  SELECT doc_id, term, count(*) AS c
        |  FROM (SELECT doc_id, unnest(${wordsExprOf("lower(text)")})
        |          AS term FROM documents)
        |  GROUP BY doc_id, term
        |), t AS (
        |  SELECT term, count(*) AS n_present,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM pd GROUP BY term
        |)
        |SELECT term, CAST(n_present AS BIGINT) AS n_present,
        |  s AS total,
        |  CAST(((n_docs * ss - s * s) * 1000000)
        |    // (s * greatest(n_docs - 1, 1)) AS BIGINT) AS dispersion_micro
        |FROM t CROSS JOIN n
        |ORDER BY total DESC, term LIMIT 20""".stripMargin,

    // RAKE keyphrases: stopword-free runs via a prefix count of stopword
    // positions, deg/freq word scores in micro, phrase = sum of its
    // words' scores — mirrors TextOps.rakeKeyphrases stage for stage
    "text_keyphrases" -> {
      val stops = Seq("the", "a", "an", "of", "to", "and", "in", "is",
        "are", "for", "on", "with", "as", "by", "at", "or")
        .map(s => s"'$s'").mkString(", ")
      s"""WITH ws AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS w FROM documents
        |), toks AS (
        |  SELECT doc_id, i - 1 AS pos, w[i] AS w,
        |    w[i] IN ($stops) AS stop
        |  FROM ws, unnest(range(1, len(w) + 1)) AS t(i)
        |), pid AS (
        |  SELECT doc_id, pos, w, stop,
        |    sum(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS pid
        |  FROM toks
        |), phrases AS (
        |  SELECT doc_id, pid,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS len
        |  FROM pid WHERE NOT stop GROUP BY doc_id, pid
        |), wstats AS (
        |  SELECT w, count(*) AS freq, sum(len) AS deg
        |  FROM (SELECT len, unnest(string_split(phrase, ' ')) AS w
        |        FROM phrases)
        |  GROUP BY w
        |), occ AS (
        |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM phrases GROUP BY phrase
        |), scores AS (
        |  SELECT phrase,
        |    CAST(sum((deg * 1000000) // freq) AS BIGINT) AS score_micro
        |  FROM (
        |    SELECT DISTINCT phrase FROM phrases
        |  ), LATERAL (SELECT unnest(string_split(phrase, ' ')) AS w)
        |  JOIN wstats USING (w)
        |  GROUP BY phrase
        |)
        |SELECT phrase, n_occurrences, score_micro
        |FROM occ JOIN scores USING (phrase)
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin
    },

    // Zipf head: top-20 terms (freq desc, term tiebreak), integer ratio
    // f1*1e6 // (rank*freq) — mirrors TextOps.zipfTable
    "text_zipf" ->
      s"""WITH tf AS (
        |  SELECT term, count(*) AS freq
        |  FROM (SELECT unnest(${wordsExprOf("lower(text)")}) AS term
        |        FROM documents)
        |  GROUP BY term
        |), top AS (
        |  SELECT term, CAST(freq AS BIGINT) AS freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
        |      AS rank
        |  FROM tf ORDER BY freq DESC, term LIMIT 20
        |), f1 AS (SELECT max(freq) AS f1 FROM top)
        |SELECT rank, term, freq,
        |  CAST((f1 * 1000000) // (rank * freq) AS BIGINT) AS zipf_micro
        |FROM top CROSS JOIN f1""".stripMargin,

    // Heaps-law growth curve: term first-occurrence doc_ids bucketed by
    // the first prefix checkpoint containing them, then a 4-row cumsum —
    // mirrors TextOps.heapsGrowth bucket for bucket (integer thresholds)
    "text_heaps" ->
      s"""WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |da AS (
        |  SELECT CASE WHEN doc_id <= max_id // 8 THEN 1
        |              WHEN doc_id <= (2 * max_id) // 8 THEN 2
        |              WHEN doc_id <= (4 * max_id) // 8 THEN 4
        |              ELSE 8 END AS b,
        |    count(*) AS d, sum(CAST(len($wordsExpr) AS BIGINT)) AS t
        |  FROM documents CROSS JOIN mx GROUP BY 1
        |), terms AS (
        |  SELECT term, min(doc_id) AS first_doc
        |  FROM (SELECT doc_id, unnest($wordsExpr) AS term FROM documents)
        |  GROUP BY term
        |), ta AS (
        |  SELECT CASE WHEN first_doc <= max_id // 8 THEN 1
        |              WHEN first_doc <= (2 * max_id) // 8 THEN 2
        |              WHEN first_doc <= (4 * max_id) // 8 THEN 4
        |              ELSE 8 END AS b, count(*) AS v
        |  FROM terms CROSS JOIN mx GROUP BY 1
        |), ks AS (SELECT unnest([1, 2, 4, 8]) AS b)
        |SELECT CAST(b AS BIGINT) AS eighth,
        |  CAST(sum(coalesce(d, 0)) OVER w AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(t, 0)) OVER w AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(v, 0)) OVER w AS BIGINT) AS vocab_size
        |FROM ks LEFT JOIN da USING (b) LEFT JOIN ta USING (b)
        |WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)""".stripMargin,

    // RRF over the two lexical top-20 pages (same CTE bases as
    // search_tfidf / search_bm25); 1e6 // (60 + rank) summed per doc
    "search_hybrid_rrf" ->
      s"""WITH wl AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS ws FROM documents
        |), dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM wl),
        |p AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS term FROM wl
        |  ) WHERE term IN ('vector', 'hash', 'join', 'window')
        |  GROUP BY doc_id, term
        |), d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |n AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |             (SELECT sum(dl) FROM dl) AS corpus_len),
        |tfk AS (
        |  SELECT doc_id, sum((tf * 1000000 * n_docs) // df) AS s
        |  FROM p JOIN d USING (term) CROSS JOIN n
        |  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20
        |), bmk AS (
        |  SELECT doc_id, sum(
        |    ((((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1))
        |     * ((22 * tf * corpus_len * 1000000)
        |        // (10 * tf * corpus_len + 3 * corpus_len + 9 * dl * n_docs)))
        |    // 1000000) AS s
        |  FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN n
        |  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20
        |), u AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
        |  FROM tfk
        |  UNION ALL
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) FROM bmk
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf_micro
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    // true hybrid retrieval: the BM25 page fused with the exact cosine
    // top-k page over the aligned embeddings (doc_id = vec_id) by RRF
    "search_hybrid_vec" ->
      s"""WITH wl AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS ws FROM documents
        |), dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM wl),
        |p AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS term FROM wl
        |  ) WHERE term IN ('vector', 'hash', 'join', 'window')
        |  GROUP BY doc_id, term
        |), d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |n AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
        |             (SELECT sum(dl) FROM dl) AS corpus_len),
        |bmk AS (
        |  SELECT doc_id, sum(
        |    ((((2 * (n_docs - df) + 1) * 1000000) // (2 * df + 1))
        |     * ((22 * tf * corpus_len * 1000000)
        |        // (10 * tf * corpus_len + 3 * corpus_len + 9 * dl * n_docs)))
        |    // 1000000) AS s
        |  FROM p JOIN d USING (term) JOIN dl USING (doc_id) CROSS JOIN n
        |  GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 20
        |), vk AS (
        |  SELECT vec_id AS doc_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS s
        |  FROM embeddings WHERE vec_id <> 0
        |  ORDER BY s DESC, doc_id LIMIT 20
        |), u AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rnk
        |  FROM bmk
        |  UNION ALL
        |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) FROM vk
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(1000000 // (60 + rnk)) AS BIGINT) AS rrf_micro
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,

    // exact-phrase search over the positional index: anchor = first-word
    // position, each later phrase word must sit at pos+i (adjacency
    // semi-joins); phrase-unit integer TF-IDF
    "search_phrase" ->
      s"""WITH wl AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS ws FROM documents
        |), pp AS (
        |  SELECT doc_id, ws[i] AS term, i AS pos
        |  FROM wl, unnest(generate_series(1, len(ws))) AS u(i)
        |  WHERE ws[i] IN ('stream', 'table', 'hash')
        |), a AS (SELECT doc_id, pos FROM pp WHERE term = 'stream'),
        |m AS (
        |  SELECT a.doc_id, a.pos FROM a
        |  WHERE EXISTS (SELECT 1 FROM pp p WHERE p.doc_id = a.doc_id
        |          AND p.pos = a.pos + 1 AND p.term = 'table')
        |    AND EXISTS (SELECT 1 FROM pp p WHERE p.doc_id = a.doc_id
        |          AND p.pos = a.pos + 2 AND p.term = 'hash')
        |), ph AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY doc_id
        |), d AS (SELECT count(*) AS df FROM ph),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tf, (tf * 1000000 * n_docs) // df AS score_micro
        |FROM ph CROSS JOIN d CROSS JOIN n
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // anchored sloppy phrase (±2): the slop window is exploded on the
    // candidate side exactly like the engine, positions 1-based here vs
    // 0-based there — relative arithmetic cancels the shift
    "search_phrase_sloppy" ->
      s"""WITH wl AS (
        |  SELECT doc_id, ${wordsExprOf("lower(text)")} AS ws FROM documents
        |), pp AS (
        |  SELECT doc_id, ws[i] AS term, i AS pos
        |  FROM wl, unnest(generate_series(1, len(ws))) AS u(i)
        |  WHERE ws[i] IN ('stream', 'table', 'hash')
        |), a AS (SELECT doc_id, pos FROM pp WHERE term = 'stream'),
        |c1 AS (
        |  SELECT doc_id, pos - 1 + d AS pos, min(abs(d)) AS dev_1
        |  FROM pp, unnest(generate_series(-2, 2)) AS dd(d)
        |  WHERE term = 'table' GROUP BY doc_id, pos - 1 + d
        |), c2 AS (
        |  SELECT doc_id, pos - 2 + d AS pos, min(abs(d)) AS dev_2
        |  FROM pp, unnest(generate_series(-2, 2)) AS dd(d)
        |  WHERE term = 'hash' GROUP BY doc_id, pos - 2 + d
        |), m AS (
        |  SELECT a.doc_id, dev_1 + dev_2 AS devsum
        |  FROM a JOIN c1 USING (doc_id, pos) JOIN c2 USING (doc_id, pos)
        |), ph AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS tf,
        |    CAST(sum(1000000 // (1 + devsum)) AS BIGINT) AS prox_micro
        |  FROM m GROUP BY doc_id
        |), d AS (SELECT count(*) AS df FROM ph),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, tf, prox_micro,
        |  (prox_micro * n_docs) // df AS score_micro
        |FROM ph CROSS JOIN d CROSS JOIN n
        |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin,

    // corpus heavy-hitter bigrams; deterministic ties (count desc, ngram)
    "text_top_ngrams" ->
      s"""WITH w AS (SELECT $wordsExpr AS w FROM documents),
        |gr AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS ngram
        |  FROM w WHERE len(w) >= 2
        |)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM gr GROUP BY ngram
        |ORDER BY n_occurrences DESC, ngram LIMIT 20""".stripMargin,

    // count-min sketch rebuilt in SQL: the digit-only MD5 bucket hash is
    // portable arithmetic, so sketch counters AND min-estimates are
    // bit-identical (DuckDB regexp_replace needs the 'g' flag; Spark's is
    // global by default)
    // left fold, first element as init (list_reduce ≡ Spark aggregate with
    // element_at(xs,1) init); // ≡ arithmetic shiftright for any sign
    "events_ewma" ->
      """WITH xs AS (
        |  SELECT user_id, CAST(count(*) AS INTEGER) AS n_events,
        |    array_agg(CAST(round(value * 1000000, 0) AS BIGINT)
        |      ORDER BY ts, event_id) AS xs
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, n_events,
        |  CAST(list_reduce(xs, (a, x) -> (a + x) // 2) AS BIGINT)
        |    AS ewma_micro
        |FROM xs""".stripMargin,

    // rolling-median/MAD local outliers: ±3-row centered window per user,
    // lower-middle median, integer micro-units — mirrors
    // Events.rollingMadAnomalies cell for cell
    "events_anomaly_mad" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS v
        |  FROM events
        |), win AS (
        |  SELECT user_id, v,
        |    list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS vals
        |  FROM v
        |), med AS (
        |  SELECT user_id, v, vals,
        |    list_sort(vals)[(len(vals) + 1) // 2] AS med
        |  FROM win
        |), mad AS (
        |  SELECT user_id, v, med, abs(v - med) AS dev,
        |    list_sort(list_transform(vals, x -> abs(x - med)))
        |      [(len(vals) + 1) // 2] AS mad
        |  FROM med
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN dev > mad * 4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  CAST(sum(dev) AS BIGINT) AS sum_dev,
        |  CAST(max(mad) AS BIGINT) AS max_mad
        |FROM mad GROUP BY user_id""".stripMargin,

    // CUSUM via the exact prefix-sum closed form S_i = P_i - min(0, min P_j):
    // two ordered window aggregates, no recurrence; all-integer
    // self-calibrated target/slack/threshold mirror Events.cusumAlarms
    "events_cusum" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS x
        |  FROM events
        |), t AS (
        |  SELECT *, CAST(sum(x) OVER (PARTITION BY user_id)
        |      // count(*) OVER (PARTITION BY user_id) AS BIGINT) AS target
        |  FROM v
        |), d AS (SELECT *, x - target - target // 4 AS y FROM t),
        |p AS (
        |  SELECT *, CAST(sum(y) OVER w AS BIGINT) AS p FROM d
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)
        |), s AS (
        |  SELECT *, p - least(min(p) OVER w, 0) AS s FROM p
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN s > target * 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_alarms,
        |  CAST(max(s) AS BIGINT) AS max_cusum,
        |  min(CASE WHEN s > target * 2 THEN event_id END) AS first_alarm_id
        |FROM s GROUP BY user_id""".stripMargin,

    // interval-union sweep: break where start > running max of prior
    // ends (half-open: touching merges), prefix-sum islands, rollup
    "events_coverage" ->
      """WITH v AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), p AS (
        |  SELECT user_id, event_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM v
        |), b AS (
        |  SELECT user_id, event_id, s, e,
        |    CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS brk
        |  FROM p
        |), isl AS (
        |  SELECT user_id, s, e,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM b
        |), runs AS (
        |  SELECT user_id, island, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY user_id, island
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
        |  CAST(max(i_e - i_s) AS BIGINT) AS max_interval_us
        |FROM runs GROUP BY user_id""".stripMargin,

    // one-way eta^2 by hour-of-day phase: exact centi-unit integer
    // sufficient statistics; the one float sum folds in ascending-phase
    // list order (list_sum is sequential over the list) to match Spark's
    // sorted-array fold; epoch_us(ts) // 3600e6 mirrors ts_us div
    "events_eta2" ->
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(round(value * 100, 0) AS BIGINT) AS x,
        |    (epoch_us(ts) // 3600000000) % 24 AS phase
        |  FROM events
        |), g AS (
        |  SELECT event_type, phase, count(*) AS n_g,
        |    CAST(sum(x) AS BIGINT) AS s_g,
        |    CAST(sum(x * x) AS BIGINT) AS ss_g
        |  FROM v GROUP BY event_type, phase
        |), t AS (
        |  SELECT event_type,
        |    CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
        |    CAST(sum(ss_g) AS BIGINT) AS ss,
        |    CAST(count(*) AS BIGINT) AS n_phases,
        |    list_sum(list_transform(
        |      list_sort(list(ROW(phase, s_g, n_g))),
        |      r -> CAST(r[2] AS DOUBLE) * CAST(r[2] AS DOUBLE)
        |        / CAST(r[3] AS DOUBLE))) AS sb
        |  FROM g GROUP BY event_type
        |)
        |SELECT event_type, n, n_phases,
        |  round((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE))
        |    / NULLIF(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
        |      * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0), 6) AS eta2
        |FROM t ORDER BY event_type""".stripMargin,

    // temporal graph growth (mirrors GraphAlgorithms.temporalGrowth):
    // first-occurrence month per edge/endpoint, then cumulative running
    // sums over the month rollup — one corpus scan for every snapshot
    "graph_growth" ->
      """WITH e AS (
        |  SELECT o_custkey AS a, l_partkey AS b,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), fe AS (
        |  SELECT m, count(*) AS ne FROM (
        |    SELECT a, b, min(m) AS m FROM e GROUP BY 1, 2) GROUP BY m
        |), fa AS (
        |  SELECT m, count(*) AS na FROM (
        |    SELECT a, min(m) AS m FROM e GROUP BY 1) GROUP BY m
        |), fb AS (
        |  SELECT m, count(*) AS nb FROM (
        |    SELECT b, min(m) AS m FROM e GROUP BY 1) GROUP BY m
        |), ms AS (
        |  SELECT DISTINCT m FROM (
        |    SELECT m FROM fe UNION ALL SELECT m FROM fa
        |    UNION ALL SELECT m FROM fb)
        |), j AS (
        |  SELECT ms.m, coalesce(ne, 0) AS ne, coalesce(na, 0) AS na,
        |    coalesce(nb, 0) AS nb
        |  FROM ms LEFT JOIN fe USING (m) LEFT JOIN fa USING (m)
        |  LEFT JOIN fb USING (m)
        |), c AS (
        |  SELECT m,
        |    sum(ne) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum_edges,
        |    sum(na) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum_a,
        |    sum(nb) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum_b
        |  FROM j
        |)
        |SELECT m, CAST(cum_edges AS BIGINT) AS cum_edges,
        |  CAST(cum_a AS BIGINT) AS cum_a, CAST(cum_b AS BIGINT) AS cum_b,
        |  CAST((cum_edges * 1000000) // (cum_a * cum_b) AS BIGINT)
        |    AS density_micro
        |FROM c""".stripMargin,

    // reciprocity over the thresholded transition graph (the markov CTE
    // chain re-derived, edges at >= ~uniform propensity)
    "graph_reciprocity" ->
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), c AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM p WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type
        |), t AS (
        |  SELECT prev_type, sum(n) AS row_n FROM c GROUP BY prev_type
        |), e AS (
        |  SELECT DISTINCT c.prev_type AS a, c.next_type AS b
        |  FROM c JOIN t USING (prev_type)
        |  WHERE (c.n * 1000000) // t.row_n >= 195000
        |    AND c.prev_type <> c.next_type
        |), r AS (
        |  SELECT e.a, e.b FROM e
        |  SEMI JOIN e x ON e.a = x.b AND e.b = x.a
        |)
        |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS m,
        |  CAST((SELECT count(*) FROM r) AS BIGINT) AS n_reciprocal,
        |  CAST(((SELECT count(*) FROM r) * 1000000)
        |    // greatest((SELECT count(*) FROM e), 1) AS BIGINT)
        |    AS reciprocity_micro""".stripMargin,

    // global Markov matrix from per-user lag pairs; micro-unit
    // row-conditional probabilities
    "events_markov" ->
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), c AS (
        |  SELECT prev_type, event_type AS next_type, count(*) AS n
        |  FROM p WHERE prev_type IS NOT NULL
        |  GROUP BY prev_type, event_type
        |), t AS (
        |  SELECT prev_type, sum(n) AS row_n FROM c GROUP BY prev_type
        |)
        |SELECT c.prev_type, c.next_type, CAST(c.n AS BIGINT) AS n,
        |  CAST((c.n * 1000000) // t.row_n AS BIGINT) AS p_micro
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type, next_type""".stripMargin,

    // Holt level+trend fold with the packed-Long two-accumulator state
    // (list_reduce has no init, so element 1 is pre-packed); >> is
    // arithmetic/floor in both engines, unlike / vs //
    "events_holt" -> {
      val l = "(a >> 32)"
      val t = s"(a - ($l << 32) - 2147483648)"
      val l2 = s"greatest(((x + $l + $t) >> 1), 0)"
      val t2 = s"(($t + $l2 - $l) >> 1)"
      s"""WITH xs AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    array_agg(CAST(round(value * 1000000, 0) AS BIGINT)
        |      ORDER BY ts, event_id) AS xs
        |  FROM events GROUP BY user_id
        |), packed AS (
        |  SELECT user_id, n_events,
        |    [xs[1] * 4294967296 + 2147483648] || xs[2:] AS xs2
        |  FROM xs
        |), folded AS (
        |  SELECT user_id, n_events,
        |    CAST(list_reduce(xs2,
        |      (a, x) -> (($l2 << 32) + $t2 + 2147483648)) AS BIGINT) AS s
        |  FROM packed
        |)
        |SELECT user_id, n_events, (s >> 32) AS level_micro,
        |  (s - ((s >> 32) << 32) - 2147483648) AS trend_micro,
        |  (s >> 32) + (s - ((s >> 32) << 32) - 2147483648)
        |    AS forecast_micro
        |FROM folded""".stripMargin
    },

    // seasonal-naive vs random-walk absolute-error sums on the common
    // scoring support (t > season); NULL mase on a zero denominator
    "events_mase" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS x
        |  FROM events
        |), l AS (
        |  SELECT user_id, x, lag(x, 7) OVER w AS xs, lag(x, 1) OVER w AS x1
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), a AS (
        |  SELECT user_id, count(*) AS n_scored,
        |    sum(abs(x - xs)) AS mae_seasonal, sum(abs(x - x1)) AS mae_naive
        |  FROM l WHERE xs IS NOT NULL GROUP BY user_id
        |)
        |SELECT user_id, CAST(n_scored AS BIGINT) AS n_scored,
        |  CAST(mae_seasonal AS BIGINT) AS mae_seasonal,
        |  CAST(mae_naive AS BIGINT) AS mae_naive,
        |  CAST(CASE WHEN mae_naive = 0 THEN NULL
        |    ELSE (mae_seasonal * 1000000) // mae_naive END AS BIGINT)
        |    AS mase_micro
        |FROM a""".stripMargin,

    // lag-1/2 raw autocorrelation; centi-unit values so (num·1e6) div den
    // stays in BIGINT on the Spark side (DuckDB's HUGEINT sums are cast
    // back down after the division)
    "events_acf" ->
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(round(value * 100, 0) AS BIGINT) AS x
        |  FROM events
        |), l AS (
        |  SELECT user_id, x,
        |    lead(x, 1) OVER w AS x1, lead(x, 2) OVER w AS x2
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), a AS (
        |  SELECT user_id, count(*) AS n_events,
        |    sum(x * x) AS den, sum(x * x1) AS num1, sum(x * x2) AS num2
        |  FROM l GROUP BY user_id
        |)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST((coalesce(num1, 0) * 1000000) // den AS BIGINT) AS acf1_micro,
        |  CAST((coalesce(num2, 0) * 1000000) // den AS BIGINT) AS acf2_micro
        |FROM a""".stripMargin,

    // largest-remainder apportionment, mirrored division order throughout
    "curate_mixture_quota" ->
      s"""WITH s AS (
        |  SELECT source, sum(COALESCE(CAST(list_sum(list_transform(
        |    $wordsExpr, w -> 1 + CAST(floor(length(w) / 4) AS BIGINT)))
        |    AS BIGINT), 0)) AS tokens
        |  FROM documents GROUP BY source
        |), r AS (
        |  SELECT source, tokens,
        |    CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS r
        |  FROM s
        |), t AS (SELECT sum(r) AS rsum FROM r),
        |b AS (
        |  SELECT source, tokens, (1000000 * r) // rsum AS base_quota,
        |    (1000000 * r) % rsum AS rem
        |  FROM r CROSS JOIN t
        |), q AS (SELECT sum(base_quota) AS qsum FROM b)
        |SELECT source, CAST(tokens AS BIGINT) AS tokens,
        |  CAST(base_quota + CASE WHEN row_number()
        |      OVER (ORDER BY rem DESC, source) <= 1000000 - qsum
        |    THEN 1 ELSE 0 END AS BIGINT) AS quota
        |FROM b CROSS JOIN q""".stripMargin,

    // DIRECT aggregation — the Spark side goes through daily partial
    // states + merge; hash equality proves the merge law on real data
    "incr_agg_rollup" ->
      """SELECT event_type, CAST(count(value) AS BIGINT) AS cnt,
        |  round(CAST(sum(value) AS DOUBLE), 4) AS sum,
        |  round(CAST(sum(value) / count(value) AS DOUBLE), 4) AS avg,
        |  round(CAST(min(value) AS DOUBLE), 4) AS min,
        |  round(CAST(max(value) AS DOUBLE), 4) AS max
        |FROM events GROUP BY event_type""".stripMargin,

    // mergeable-quantile mirror: bin directly over ALL events (the engine
    // goes through per-day histogram partials + merge — the hash gate
    // proves the merge law); first bin where 100*cum >= p*cnt, all-integer
    "incr_quantile_rollup" ->
      """WITH b AS (
        |  SELECT event_type,
        |    LEAST(31, GREATEST(0, CAST(floor(value / 16) AS INTEGER))) AS bin
        |  FROM events
        |), t AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY event_type
        |), c AS (
        |  SELECT event_type, bin, count(*) AS bc FROM b GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bin,
        |    sum(bc) OVER (PARTITION BY event_type ORDER BY bin) AS cum
        |  FROM c
        |), q AS (
        |  SELECT cum.event_type,
        |    min(CASE WHEN 100 * cum >= 50 * t.cnt THEN bin END) AS p50_bin,
        |    min(CASE WHEN 100 * cum >= 95 * t.cnt THEN bin END) AS p95_bin
        |  FROM cum JOIN t ON cum.event_type = t.event_type
        |  GROUP BY cum.event_type
        |)
        |SELECT q.event_type, t.cnt,
        |  p50_bin, CAST(p50_bin AS BIGINT) * 16 AS p50_lo,
        |  p95_bin, CAST(p95_bin AS BIGINT) * 16 AS p95_lo
        |FROM q JOIN t ON q.event_type = t.event_type""".stripMargin,

    // portable integer HLL (Sketch.hllSketch/hllEstimate): generated
    // leading-zero CASE, exact 2^(55-r) harmonic sum, α = 709/1000
    "sketch_hll" -> {
      val bits = 54
      val rhoSql = s"CASE WHEN rest = 0 THEN ${bits + 1}" +
        (bits - 1 to 0 by -1).map(k =>
          s" WHEN rest >= ${1L << k} THEN ${bits - k}").mkString + " END"
      s"""WITH h0 AS (
        |  SELECT ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM lineitem
        |), b AS (SELECT h % 64 AS bucket, h // 64 AS rest FROM h0),
        |rho AS (SELECT bucket, $rhoSql AS rho FROM b),
        |regs AS (
        |  SELECT bucket, CAST(max(rho) AS BIGINT) AS r FROM rho
        |  GROUP BY bucket
        |), allb AS (SELECT unnest(range(0, 64)) AS bucket),
        |filled AS (
        |  SELECT a.bucket, coalesce(r.r, 0) AS r
        |  FROM allb a LEFT JOIN regs r USING (bucket)
        |), s AS (
        |  SELECT CAST(sum(CAST(pow(2, 55 - least(r, 40)) AS BIGINT))
        |    AS BIGINT) AS s
        |  FROM filled
        |)
        |SELECT CAST((((64 * 36028797018963968) // s) * 709 // 1000) * 64
        |    AS BIGINT) AS distinct_est,
        |  (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
        |    AS n_exact
        |FROM s""".stripMargin
    },

    // HLL set algebra: per-source registers (same generated rho CASE as
    // sketch_hll), union = register-wise max (the exact HLL merge law),
    // intersection by clamped inclusion-exclusion, Jaccard micro
    // MRL mergeable quantile sketch: the engine certifies its own rank
    // windows against EXACT corpus ranks (the compaction-lemma invariant
    // |estRank − trueRank| ≤ err), so the oracle pins ok=1 as a constant
    // while the exact per-group n pins the group/rollup partition — any
    // ledger or merge bug flips ok and fails the hash gate
    "sketch_mrl_quantiles" ->
      """WITH g AS (
        |  SELECT event_type AS grp, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT '__all__', CAST(count(*) AS BIGINT) FROM events
        |)
        |SELECT grp, q, n, CAST(1 AS BIGINT) AS ok
        |FROM g CROSS JOIN (SELECT unnest(['p50', 'p90', 'p99']) AS q)
        |ORDER BY grp, q""".stripMargin,

    "sketch_hll_setops" -> {
      val bits = 54
      val rhoSql = s"CASE WHEN rest = 0 THEN ${bits + 1}" +
        (bits - 1 to 0 by -1).map(k =>
          s" WHEN rest >= ${1L << k} THEN ${bits - k}").mkString + " END"
      val est = "CAST((((64 * 36028797018963968) // s) * 709 // 1000) * 64" +
        " AS BIGINT)"
      s"""WITH h0 AS (
        |  SELECT g, ('0x' || substr(md5(CAST(tok AS VARCHAR)), 1, 15))
        |    ::BIGINT AS h
        |  FROM (
        |    SELECT g, unnest(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS tok
        |    FROM (SELECT source AS g, $wordsExpr AS w FROM documents)
        |    WHERE len(w) >= 3)
        |), b AS (SELECT g, h % 64 AS bucket, h // 64 AS rest FROM h0),
        |rho AS (SELECT g, bucket, $rhoSql AS rho FROM b),
        |regs0 AS (
        |  SELECT g, bucket, CAST(max(rho) AS BIGINT) AS r FROM rho
        |  GROUP BY g, bucket
        |), allb AS (
        |  SELECT g, unnest(range(0, 64)) AS bucket
        |  FROM (SELECT DISTINCT source AS g FROM documents)
        |), regs AS (
        |  SELECT a.g, a.bucket, coalesce(r.r, 0) AS r
        |  FROM allb a LEFT JOIN regs0 r
        |    ON a.g = r.g AND a.bucket = r.bucket
        |), pg AS (
        |  SELECT g, $est AS est FROM (
        |    SELECT g, CAST(sum(CAST(pow(2, 55 - least(r, 40)) AS BIGINT))
        |      AS BIGINT) AS s
        |    FROM regs GROUP BY g)
        |), pairs AS (
        |  SELECT a.g AS ga, b.g AS gb
        |  FROM (SELECT DISTINCT g FROM regs) a,
        |       (SELECT DISTINCT g FROM regs) b
        |  WHERE a.g < b.g
        |), mr AS (
        |  SELECT p.ga, p.gb, ra.bucket, greatest(ra.r, rb.r) AS r
        |  FROM pairs p
        |  JOIN regs ra ON ra.g = p.ga
        |  JOIN regs rb ON rb.g = p.gb AND rb.bucket = ra.bucket
        |), u AS (
        |  SELECT ga, gb, $est AS union_est FROM (
        |    SELECT ga, gb, CAST(sum(CAST(pow(2, 55 - least(r, 40))
        |      AS BIGINT)) AS BIGINT) AS s
        |    FROM mr GROUP BY ga, gb)
        |)
        |SELECT u.ga, u.gb, u.union_est,
        |  greatest(pa.est + pb.est - u.union_est, 0) AS inter_est,
        |  CAST((greatest(pa.est + pb.est - u.union_est, 0) * 1000000)
        |    // u.union_est AS BIGINT) AS jac_micro
        |FROM u JOIN pg pa ON pa.g = u.ga JOIN pg pb ON pb.g = u.gb
        |ORDER BY ga, gb""".stripMargin
    },

    // KMV: k smallest distinct portable hashes; estimate (k-1)*M // h_k
    "sketch_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT CAST(substr(regexp_replace(
        |    md5(CAST(l_partkey AS VARCHAR)), '[a-f]', '', 'g') || '000000',
        |    1, 6) AS BIGINT) AS h
        |  FROM lineitem
        |), b AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |s AS (SELECT count(*) AS n, max(h) AS hk FROM b)
        |SELECT CAST(CASE WHEN n < 256 THEN n
        |  ELSE (255 * 1000000) // hk END AS BIGINT) AS distinct_est,
        |  (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
        |    AS n_exact
        |FROM s""".stripMargin,

    // sharded heavy-hitter summaries (Mergeable Summaries, PODS'12 — the
    // deterministic SpaceSaving): per-half exact word counts routed by the
    // portable digit-only md5 into 4 disjoint shards, top-8 kept per
    // (half, shard) + max-dropped residual, then the MERGE re-applies the
    // same trim with the summed residual bound — mirrors
    // Sketch.heavyHitters + heavyHittersMerge end to end
    "sketch_heavy_hitters" ->
      s"""WITH w AS (
        |  SELECT doc_id, unnest($wordsExpr) AS key FROM documents
        |), cnts AS (
        |  SELECT doc_id % 2 AS part, CAST(key AS VARCHAR) AS key,
        |    count(*) AS cnt
        |  FROM w GROUP BY 1, 2
        |), sh AS (
        |  SELECT part, key, cnt,
        |    CAST(substr(regexp_replace(md5('hh|' || key), '[a-f]', '', 'g')
        |      || '000000', 1, 6) AS BIGINT) % 4 AS shard
        |  FROM cnts
        |), rk AS (
        |  SELECT part, shard, key, cnt, row_number() OVER (
        |    PARTITION BY part, shard ORDER BY cnt DESC, key) AS rk
        |  FROM sh
        |), summ AS (
        |  SELECT k.part, k.shard, k.key, k.cnt, coalesce(e.e, 0) AS err_ub
        |  FROM (SELECT part, shard, key, cnt FROM rk WHERE rk <= 8) k
        |  LEFT JOIN (SELECT part, shard, max(cnt) AS e FROM rk
        |             WHERE rk > 8 GROUP BY 1, 2) e
        |    ON k.part = e.part AND k.shard = e.shard
        |), errtot AS (
        |  SELECT shard, sum(pe) AS e FROM (
        |    SELECT part, shard, max(err_ub) AS pe FROM summ GROUP BY 1, 2)
        |  GROUP BY shard
        |), mrk AS (
        |  SELECT shard, key, cnt, row_number() OVER (
        |    PARTITION BY shard ORDER BY cnt DESC, key) AS rk
        |  FROM (SELECT shard, key, sum(cnt) AS cnt FROM summ GROUP BY 1, 2)
        |), dropped AS (
        |  SELECT shard, max(cnt) AS d FROM mrk WHERE rk > 8 GROUP BY shard
        |)
        |SELECT m.shard, m.key, CAST(m.cnt AS BIGINT) AS cnt,
        |  CAST(coalesce(t.e, 0) + coalesce(d.d, 0) AS BIGINT) AS err_ub
        |FROM mrk m LEFT JOIN errtot t USING (shard)
        |LEFT JOIN dropped d USING (shard)
        |WHERE m.rk <= 8""".stripMargin,

    // KMV set algebra (Beyer et al. SIGMOD'07): per-source bottom-128
    // vocabulary sketches, pairwise merge law, union/Jaccard/intersection
    // estimates in integer units — mirrors Sketch.kmvGroupSketch/kmvSetOps
    "sketch_kmv_setops" ->
      s"""WITH w AS (
        |  SELECT source AS g, unnest($wordsExpr) AS tok FROM documents
        |), h0 AS (
        |  SELECT DISTINCT g, CAST(substr(regexp_replace(
        |    md5(CAST(tok AS VARCHAR)), '[a-f]', '', 'g') || '000000',
        |    1, 6) AS BIGINT) AS h
        |  FROM w
        |), sk AS (
        |  SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        |    FROM h0) WHERE rn <= 128
        |), gs AS (SELECT DISTINCT g FROM sk),
        |pairs AS (
        |  SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g
        |), tagged AS (
        |  SELECT ga, gb, h, 1 AS in_a, 0 AS in_b
        |  FROM pairs JOIN sk ON sk.g = pairs.ga
        |  UNION ALL
        |  SELECT ga, gb, h, 0 AS in_a, 1 AS in_b
        |  FROM pairs JOIN sk ON sk.g = pairs.gb
        |), merged AS (
        |  SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b
        |  FROM tagged GROUP BY ga, gb, h
        |), bk AS (
        |  SELECT * FROM (
        |    SELECT ga, gb, h, in_a, in_b,
        |      row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
        |    FROM merged) WHERE rn <= 128
        |), agg AS (
        |  SELECT ga, gb, CAST(count(*) AS BIGINT) AS n, max(h) AS hk,
        |    CAST(sum(in_a * in_b) AS BIGINT) AS shared
        |  FROM bk GROUP BY ga, gb
        |), est AS (
        |  SELECT ga, gb,
        |    CAST(CASE WHEN n < 128 THEN n
        |      ELSE (127 * 1000000) // hk END AS BIGINT) AS union_est,
        |    CAST((shared * 1000000) // n AS BIGINT) AS jac_micro
        |  FROM agg
        |)
        |SELECT ga, gb, union_est, jac_micro,
        |  CAST((jac_micro * union_est) // 1000000 AS BIGINT) AS inter_est
        |FROM est ORDER BY ga, gb""".stripMargin,

    "sketch_countmin" ->
      s"""WITH w AS (SELECT unnest($wordsExpr) AS term FROM documents),
        |rows_ AS (SELECT unnest([0, 1, 2, 3]) AS row),
        |lanes AS (
        |  SELECT row,
        |    CAST(substr(regexp_replace(md5(CAST(row AS VARCHAR) || '|' || term),
        |      '[a-f]', '', 'g') || '000000', 1, 6) AS BIGINT) % 64 AS bucket
        |  FROM w CROSS JOIN rows_
        |), sk AS (
        |  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lanes GROUP BY row, bucket
        |), probes AS (
        |  SELECT unnest(['join', 'hash', 'vector', 'window', 'data']) AS term
        |), pl AS (
        |  SELECT term, row,
        |    CAST(substr(regexp_replace(md5(CAST(row AS VARCHAR) || '|' || term),
        |      '[a-f]', '', 'g') || '000000', 1, 6) AS BIGINT) % 64 AS bucket
        |  FROM probes CROSS JOIN rows_
        |), est AS (
        |  SELECT term, min(coalesce(cnt, 0)) AS est_cnt FROM pl
        |  LEFT JOIN sk USING (row, bucket) GROUP BY term
        |), tr AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS true_cnt FROM w
        |  WHERE term IN ('join', 'hash', 'vector', 'window', 'data')
        |  GROUP BY term
        |)
        |SELECT term, est_cnt, true_cnt FROM est JOIN tr USING (term)""".stripMargin,

    // duplicate-n-gram fraction per doc (Gopher repetition filter), n=2,3;
    // docs with < n words contribute NULL (both engines' avg skips nulls)
    "text_repetition" -> s"""WITH w AS (
        |  SELECT lang, $wordsExpr AS w FROM documents
        |), r AS (
        |  SELECT lang,
        |    CASE WHEN len(w) >= 2 THEN
        |      (len(w) - 1 - len(list_distinct(list_transform(range(1, len(w)),
        |        i -> w[i] || ' ' || w[i+1]))))::DOUBLE / (len(w) - 1) END AS rep2,
        |    CASE WHEN len(w) >= 3 THEN
        |      (len(w) - 2 - len(list_distinct(list_transform(range(1, len(w) - 1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))))::DOUBLE / (len(w) - 2)
        |      END AS rep3
        |  FROM w
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(rep2), 6) AS avg_rep2,
        |  round(avg(rep3), 6) AS avg_rep3,
        |  CAST(sum(CASE WHEN rep2 > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM r GROUP BY lang""".stripMargin,

    // n_media mirrors decodeHeader's container detection for payloads that
    // are valid UTF-8 text: PNG (0x89) and JPEG (0xFF) magic bytes cannot
    // lead a UTF-8 sequence, and the BMP branch requires an exact DIB header
    // size that four ASCII bytes can never encode — so only the GIF and
    // RIFF/WAVE ASCII prefixes are reachable and need mirroring here.
    "mm_decode_features" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
        |  CAST(sum(octet_length(text::BLOB) * 31
        |    + ascii(substr(text, 1, 1)) + ascii(substr(text, -1, 1))) AS BIGINT) AS checksum_sum,
        |  CAST(sum(CASE WHEN octet_length(text::BLOB) >= 12 AND
        |      (text LIKE 'GIF87a%' OR text LIKE 'GIF89a%'
        |       OR (substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'WAVE'))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_media
        |FROM documents GROUP BY source""".stripMargin,

    // The decode side is Spark-only byte parsing; the oracle recomputes the
    // dims each synthesized header encodes, straight from the same integer
    // formulas (mediaDecodeRoundtrip derives w/h/rate/channels/bits from
    // doc_id and n_chars before encoding).
    "mm_decode_roundtrip" ->
      """WITH d AS (
        |  SELECT doc_id, (n_chars % 1000) + 1 AS w, (doc_id % 500) + 1 AS h,
        |         (doc_id % 2) + 1 AS ch
        |  FROM documents
        |), f AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'wav' END AS format,
        |         CASE doc_id % 3 WHEN 2 THEN 8000 + w * 4 ELSE w END AS width,
        |         CASE doc_id % 3 WHEN 2 THEN ch ELSE h END AS height,
        |         CASE doc_id % 3 WHEN 2 THEN 8 * ch ELSE 8 END AS depth
        |  FROM d
        |)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(width) AS BIGINT) AS sum_width,
        |  CAST(sum(height) AS BIGINT) AS sum_height,
        |  CAST(sum(depth) AS BIGINT) AS sum_depth
        |FROM f GROUP BY format ORDER BY format""".stripMargin,

    // Real-PCM round trip: the Spark side encodes samples from this exact
    // integer formula into WAV bytes and DECODES THE BYTES; the oracle
    // recomputes the per-frame features from the formula alone. Frames are
    // fixed-point Goertzel over the formula samples (32 unrolled
    // recurrence levels); the Spark side must reach the same powers
    // THROUGH WAV encode + container walk + PCM decode
    // equalization round trip: histogram, cdf, and the truncating remap
    // rebuilt relationally from the generating formula (bytes-blind)
    "mm_image_equalize" ->
      """WITH dims AS (
        |  SELECT doc_id AS id, (doc_id % 5) + 3 AS w, (doc_id % 4) + 2 AS h
        |  FROM documents
        |), px AS (
        |  SELECT id, ((id + x * 3 + y * 5) % 64) + 32 AS g
        |  FROM dims, unnest(range(0, w)) AS tx(x),
        |    unnest(range(0, h)) AS ty(y)
        |), hist AS (SELECT id, g, count(*) AS c FROM px GROUP BY id, g),
        |cdf AS (
        |  SELECT id, g, c,
        |    sum(c) OVER (PARTITION BY id ORDER BY g
        |      ROWS UNBOUNDED PRECEDING) AS cdf
        |  FROM hist
        |), st AS (
        |  SELECT id, min(cdf) AS cdfmin, sum(c) AS n FROM cdf GROUP BY id
        |), eq AS (
        |  SELECT cdf.id, g, c,
        |    ((cdf - cdfmin) * 255) // greatest(n - cdfmin, 1) AS e
        |  FROM cdf JOIN st ON cdf.id = st.id
        |)
        |SELECT id AS doc_id, CAST(sum(c) AS BIGINT) AS n_px,
        |  CAST(min(g) AS BIGINT) AS min_in, CAST(max(g) AS BIGINT) AS max_in,
        |  CAST(min(e) AS BIGINT) AS min_eq, CAST(max(e) AS BIGINT) AS max_eq,
        |  CAST(sum(e * c) AS BIGINT) AS sum_eq
        |FROM eq GROUP BY id ORDER BY doc_id""".stripMargin,

    // resample round trip: the interpolation recomputed at the source
    // coordinates from the generating formula (bytes-blind); `//` is
    // truncating on the negative diffs, matching Java int division
    "mm_audio_resample" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |js AS (SELECT unnest(range(0, 31)) AS j),
        |pos AS (
        |  SELECT id, j, (j * 3) // 2 AS i0, (j * 3) % 2 AS fr
        |  FROM ids CROSS JOIN js
        |), sv AS (
        |  SELECT id, j, fr,
        |    ((id*7 + 13*i0 + ((i0*i0) % 97)*31) % 2001) - 1000 AS s0,
        |    ((id*7 + 13*(i0+1) + (((i0+1)*(i0+1)) % 97)*31) % 2001) - 1000
        |      AS s1
        |  FROM pos
        |), y AS (SELECT id, j, s0 + (fr * (s1 - s0)) // 2 AS y FROM sv)
        |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_out,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum((j + 1) * y) AS BIGINT) AS wsum_y,
        |  CAST(min(y) AS BIGINT) AS min_y,
        |  CAST(max(y) AS BIGINT) AS max_y
        |FROM y GROUP BY id ORDER BY doc_id""".stripMargin,

    "mm_audio_goertzel" ->
      s"""WITH ${goertzelCtes(32, Seq(1, 2, 4, 8))}
        |SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(s1 * s1 + s2 * s2 - ((c * s1) // 16384) * s2) AS BIGINT)
        |    AS sum_power,
        |  CAST(min(s1 * s1 + s2 * s2 - ((c * s1) // 16384) * s2) AS BIGINT)
        |    AS min_power,
        |  CAST(max(s1 * s1 + s2 * s2 - ((c * s1) // 16384) * s2) AS BIGINT)
        |    AS max_power
        |FROM g32 GROUP BY band ORDER BY band""".stripMargin,

    // the same [floor(f*ns/4), floor((f+1)*ns/4)) windows; zero crossings
    // count adjacent sign flips over the nonzero samples in s-order.
    "mm_audio_frames" ->
      """WITH d AS (
        |  SELECT doc_id, (n_chars % 50) + 10 AS ns FROM documents
        |), v AS (
        |  SELECT doc_id, ns, CAST(s.s AS BIGINT) AS s,
        |    CAST(((doc_id * 31 + s.s * 7) % 2001) - 1000 AS BIGINT) AS val
        |  FROM d, LATERAL (SELECT unnest(range(0, ns)) AS s) s
        |), fb AS (
        |  SELECT doc_id, ns, CAST(f.f AS INTEGER) AS frame_no,
        |    (f.f * ns) // 4 AS s0, ((f.f + 1) * ns) // 4 AS s1
        |  FROM d, LATERAL (SELECT unnest(range(0, 4)) AS f) f
        |), j AS (
        |  SELECT fb.doc_id, fb.frame_no, v.s, v.val
        |  FROM fb JOIN v ON v.doc_id = fb.doc_id AND v.s >= fb.s0 AND v.s < fb.s1
        |), zc AS (
        |  SELECT doc_id, frame_no,
        |    CASE WHEN sign(val) <> lag(sign(val)) OVER w THEN 1 ELSE 0 END AS flip
        |  FROM j WHERE val <> 0
        |  WINDOW w AS (PARTITION BY doc_id, frame_no ORDER BY s)
        |), per AS (
        |  SELECT j.doc_id, j.frame_no,
        |    count(*) AS n_samples, max(abs(val)) AS peak, sum(abs(val)) AS sum_abs
        |  FROM j GROUP BY j.doc_id, j.frame_no
        |), perz AS (
        |  SELECT doc_id, frame_no, CAST(sum(flip) AS BIGINT) AS zc
        |  FROM zc GROUP BY doc_id, frame_no
        |)
        |SELECT per.frame_no, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(per.n_samples) AS BIGINT) AS sum_samples,
        |  CAST(sum(per.peak) AS BIGINT) AS sum_peak,
        |  CAST(sum(per.sum_abs) AS BIGINT) AS sum_abs_total,
        |  CAST(sum(coalesce(perz.zc, 0)) AS BIGINT) AS sum_zc
        |FROM per LEFT JOIN perz USING (doc_id, frame_no)
        |GROUP BY per.frame_no ORDER BY per.frame_no""".stripMargin,

    // Real-pixel round trip: the Spark side encodes gray levels from this
    // exact integer formula into 24bpp BMP bytes (bottom-up rows, stride
    // padding, BGR channels) and DECODES THE BYTES, then nearest-neighbor
    // resizes to 4x4 with src = dst*srcDim//4; the oracle evaluates the
    // formula at those source coordinates directly.
    "mm_image_resize" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 5) + 3 AS w, (doc_id % 4) + 2 AS h
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 31 + ((x.x * w) // 4) * 7 + ((y.y * h) // 4) * 13)
        |      % 256 AS gray
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, 4)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, 4)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(gray) AS BIGINT) AS sum_gray,
        |  CAST(sum(CASE WHEN gray >= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bright
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // PNG round-trip mirror: the oracle recomputes the gray formula at the
    // nearest-neighbor source coordinates — deflate/inflate and the five
    // filter/unfilter pairs cancel only if the codec is correct
    "mm_png_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 6) + 3 AS w, (doc_id % 5) + 6 AS h
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 37 + ((x.x * w) // 4) * 11 + ((y.y * h) // 4) * 17)
        |      % 256 AS gray
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, 4)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, 4)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(gray) AS BIGINT) AS sum_gray,
        |  CAST(sum(CASE WHEN gray >= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bright
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // RGB sibling of mm_png_pixels: three channel formulas replayed at the
    // resize source coordinates — the Spark side's 3-byte-pixel filters +
    // deflate must cancel exactly
    "mm_png_color" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 6) + 3 AS w, (doc_id % 5) + 6 AS h
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 37 + ((x.x * w) // 4) * 11 + ((y.y * h) // 4) * 17)
        |      % 256 AS r,
        |    (doc_id * 23 + ((x.x * w) // 4) * 7 + ((y.y * h) // 4) * 13)
        |      % 256 AS g,
        |    (doc_id * 41 + ((x.x * w) // 4) * 5 + ((y.y * h) // 4) * 19)
        |      % 256 AS b
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, 4)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, 4)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // GIF sibling of mm_png_pixels: the oracle replays the pixel formula
    // at the resize source coordinates; LZW compress/decompress on the
    // Spark side must cancel exactly for the hashes to agree
    "mm_gif_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 5) + 4 AS w, (doc_id % 4) + 5 AS h
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 29 + ((x.x * w) // 4) * 13 + ((y.y * h) // 4) * 19)
        |      % 256 AS gray
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, 4)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, 4)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(gray) AS BIGINT) AS sum_gray,
        |  CAST(sum(CASE WHEN gray >= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bright
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // REAL baseline JPEG roundtrip (DCT/quant/Huffman encode → marker
    // walk/Huffman/dequant/IDCT decode): blocks are 8×8-constant with DC
    // quant 8, so decode is bit-exact and the oracle replays the block
    // formula bytes-blind; a non-uniform decoded block poisons its cell
    // with -1 and breaks the sum
    "mm_jpeg_pixels" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 3) + 2 AS bw, (doc_id % 2) + 2 AS bh
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 31 + x.x * 17 + y.y * 23) % 256 AS gray
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, bh)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, bw)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(gray) AS BIGINT) AS sum_gray,
        |  CAST(sum(CASE WHEN gray >= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bright
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // full-color JPEG roundtrip: the oracle replays the block-constant
    // Y/Cb/Cr formulas bytes-blind — chroma entropy decode, dequant,
    // IDCT, and upsample must all be exact for the sums to cancel
    "mm_jpeg_color" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id % 3) + 2 AS bw, (doc_id % 2) + 2 AS bh
        |  FROM documents
        |), cell AS (
        |  SELECT doc_id, CAST(y.y AS INTEGER) AS y, CAST(x.x AS INTEGER) AS x,
        |    (doc_id * 31 + x.x * 17 + y.y * 23) % 256 AS yv,
        |    (doc_id * 13 + x.x * 7 + y.y * 29) % 256 AS cb,
        |    (doc_id * 19 + x.x * 11 + y.y * 5) % 256 AS cr
        |  FROM d,
        |    LATERAL (SELECT unnest(range(0, bh)) AS y) y,
        |    LATERAL (SELECT unnest(range(0, bw)) AS x) x
        |)
        |SELECT y, x, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(yv) AS BIGINT) AS sum_y,
        |  CAST(sum(cb) AS BIGINT) AS sum_cb,
        |  CAST(sum(cr) AS BIGINT) AS sum_cr
        |FROM cell GROUP BY y, x ORDER BY y, x""".stripMargin,

    // image near-dup via DCT pHash: the oracle knows the planting — 7
    // grating patterns by doc_id % 7, so intra pairs are n·(n−1)/2 per
    // group and cross pairs must be zero; a pHash that loses recall
    // through the lossy JPEG roundtrip (or collides across patterns)
    // breaks the counts
    "mm_phash_pairs" ->
      """SELECT CAST(doc_id % 7 AS BIGINT) AS grp,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_intra,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // color near-dup via per-channel block-mean hashes: the recolor
    // planting (one luma layout, 5 chroma patterns by doc_id % 5) means
    // every same-group duo must pair through the lossy color codec and
    // zero cross-group pairs may survive — a hash that reads only luma
    // (or loses chroma recall to the dropped luma-band buckets) breaks
    // the counts
    "mm_phash_color" ->
      """SELECT CAST(doc_id % 5 AS BIGINT) AS grp,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_intra,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // incremental image probe: the planting makes the outcome exact —
    // every new image (doc_id >= 150) matches ALL corpus images
    // (doc_id < 150) of its recolor group at distance 0, nothing else
    "mm_phash_probe" ->
      """SELECT CAST(doc_id % 5 AS BIGINT) AS grp,
        |  CAST(count(CASE WHEN doc_id >= 150 THEN 1 END) AS BIGINT) AS n_new,
        |  CAST(count(CASE WHEN doc_id < 150 THEN 1 END) AS BIGINT) AS n_old,
        |  CAST(count(CASE WHEN doc_id >= 150 THEN 1 END)
        |    * count(CASE WHEN doc_id < 150 THEN 1 END) AS BIGINT) AS n_matched,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // audio near-dup via dominant-bin fingerprints: the planting is 4
    // melodies by doc_id % 4 — same-melody duos must pair through the
    // real WAV roundtrip at every per-doc volume (dominance is
    // scale-invariant), distinct melodies disagree in every frame
    "mm_audio_fingerprint" ->
      """SELECT CAST(doc_id % 4 AS BIGINT) AS grp,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_intra,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // video near-dup via sampled-keyframe aHash: 4 planted clips by
    // doc_id % 4 — same-clip duos pair through the real animated-GIF
    // roundtrip at every per-doc brightness (aHash is mean-relative),
    // distinct clips disagree in >= 96 of 192 signature bits
    "mm_video_fingerprint" ->
      """SELECT CAST(doc_id % 4 AS BIGINT) AS grp,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_intra,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // incremental video probe: every new clip (doc_id >= 150) matches
    // ALL corpus clips (doc_id < 150) of its group at distance 0
    "mm_video_probe" ->
      """SELECT CAST(doc_id % 4 AS BIGINT) AS grp,
        |  CAST(count(CASE WHEN doc_id >= 150 THEN 1 END) AS BIGINT) AS n_new,
        |  CAST(count(CASE WHEN doc_id < 150 THEN 1 END) AS BIGINT) AS n_old,
        |  CAST(count(CASE WHEN doc_id >= 150 THEN 1 END)
        |    * count(CASE WHEN doc_id < 150 THEN 1 END) AS BIGINT) AS n_matched,
        |  CAST(0 AS BIGINT) AS n_cross
        |FROM documents WHERE doc_id < 200
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // shot boundaries: doc_id % 3 + 1 planted segments per 12-frame clip,
    // consecutive segments 32 Hamming bits apart (> threshold 16), so
    // n_cuts = doc_id % 3 exactly through the codec roundtrip
    "mm_video_scenes" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(12 AS BIGINT) AS n_frames,
        |  CAST(doc_id % 3 AS BIGINT) AS n_cuts
        |FROM documents WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,

    // HashingTF rebuilt in SQL (same portable digit-only-MD5 bucket hash
    // as sketch_countmin); all 16 slots per doc, zeros included
    "text_feature_hash" ->
      s"""WITH w AS (SELECT doc_id, unnest($wordsExpr) AS tok FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CAST(substr(regexp_replace(md5(tok), '[a-f]', '', 'g') || '000000',
        |      1, 6) AS BIGINT) % 16 AS slot
        |  FROM w
        |), c AS (
        |  SELECT doc_id, slot, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY doc_id, slot
        |), slots AS (SELECT unnest(range(0, 16)) AS slot)
        |SELECT d.doc_id, CAST(s.slot AS INTEGER) AS slot,
        |  CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |CROSS JOIN slots s
        |LEFT JOIN c ON c.doc_id = d.doc_id AND c.slot = s.slot""".stripMargin,

    // collocations by exact integer lift ((c_ab*N*1e6) // (c_a*c_b));
    // min-support 5, deterministic ties (lift desc, bigram)
    "text_collocations" ->
      s"""WITH toks AS (SELECT unnest($wordsExpr) AS tok FROM documents),
        |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_toks FROM toks),
        |w AS (SELECT $wordsExpr AS w FROM documents),
        |bi AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS bigram
        |  FROM w WHERE len(w) >= 2
        |), bc AS (
        |  SELECT bigram, count(*) AS c_ab FROM bi GROUP BY bigram
        |  HAVING count(*) >= 5
        |)
        |SELECT bigram, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST((c_ab * n_toks * 1000000) // (a.c1 * b.c1) AS BIGINT) AS lift_micro
        |FROM bc
        |JOIN uni a ON a.tok = string_split(bigram, ' ')[1]
        |JOIN uni b ON b.tok = string_split(bigram, ' ')[2]
        |CROSS JOIN n
        |ORDER BY lift_micro DESC, bigram LIMIT 20""".stripMargin,

    // pairwise cosine between per-label centroids (centroids rounded to 6
    // first, so the pairwise stage starts from engine-identical inputs)
    "emb_label_affinity" ->
      """WITH x AS (
        |  SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |  FROM embeddings
        |), c AS (
        |  SELECT label, s.dim AS dim, round(avg(s.v), 6) AS cv
        |  FROM x GROUP BY label, s.dim
        |), cent AS (
        |  SELECT label, list(cv ORDER BY dim) AS cvl FROM c GROUP BY label
        |)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(list_cosine_similarity(a.cvl, b.cvl), 6) AS cos_sim
        |FROM cent a JOIN cent b ON a.label < b.label""".stripMargin,

    // RAG chunker: 40-word windows stepping by 30; the final short window
    // is kept, empty documents produce no chunks
    "text_chunks" ->
      s"""WITH w AS (SELECT doc_id, $wordsExpr AS w FROM documents),
        |ix AS (
        |  SELECT doc_id, w, unnest(range(0,
        |    CASE WHEN len(w) = 0 THEN 0 ELSE (len(w) - 1) // 30 + 1 END)) AS ci
        |  FROM w
        |)
        |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
        |  array_to_string(list_slice(w, ci * 30 + 1, ci * 30 + 40), ' ') AS chunk_text,
        |  CAST(len(list_slice(w, ci * 30 + 1, ci * 30 + 40)) AS INTEGER) AS n_tokens
        |FROM ix""".stripMargin,

    // weekly cohort retention: integer 7-day buckets from 2024-01-01
    // (engine-portable — calendar week start conventions are not); DuckDB
    // reads the nano parquet as micro TIMESTAMP, date-truncation matches
    // the Spark side's pure nano Long division
    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |    (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS week
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
        |), s AS (
        |  SELECT cohort_week, count(*) AS cohort_size FROM c GROUP BY 1
        |)
        |SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
        |  CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT uw.user_id) AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size
        |FROM uw JOIN c USING (user_id)
        |JOIN s ON s.cohort_week = c.cohort_week
        |GROUP BY c.cohort_week, uw.week - c.cohort_week, s.cohort_size
        |ORDER BY cohort_week, week_offset""".stripMargin,

    // paragraph-level cross-doc dedup: non-overlapping 3-word windows,
    // md5-fingerprinted; histogram of windows recurring in > 1 doc
    "dedup_chunk_dups" ->
      s"""WITH w AS (SELECT doc_id, $wordsExpr AS w FROM documents),
        |ix AS (
        |  SELECT doc_id, w, unnest(range(0,
        |    CASE WHEN len(w) = 0 THEN 0 ELSE (len(w) - 1) // 3 + 1 END)) AS ci
        |  FROM w
        |), c AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(w, ci * 3 + 1, ci * 3 + 3), ' ') AS t,
        |    len(list_slice(w, ci * 3 + 1, ci * 3 + 3)) AS toks
        |  FROM ix WHERE len(list_slice(w, ci * 3 + 1, ci * 3 + 3)) > 0
        |), g AS (
        |  SELECT md5(t) AS h, count(DISTINCT doc_id) AS n_docs,
        |    count(*) AS n_occ, sum(toks) AS toks
        |  FROM c GROUP BY md5(t)
        |)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(n_occ) AS BIGINT) AS n_occurrences,
        |  CAST(sum(toks) AS BIGINT) AS dup_tokens
        |FROM g WHERE n_docs > 1 GROUP BY n_docs""".stripMargin,

    // exact-dup keeper by source priority (src2 best, then src0, then
    // everything else; doc_id breaks ties)
    "dedup_priority" ->
      """WITH d AS (
        |  SELECT md5(text) AS content_hash, doc_id AS keeper_id,
        |    source AS keeper_source,
        |    CASE WHEN source = 'src2' THEN 0
        |         WHEN source = 'src0' THEN 1 ELSE 2 END AS prio
        |  FROM documents
        |), g AS (
        |  SELECT content_hash, keeper_id, keeper_source,
        |    count(*) OVER (PARTITION BY content_hash) AS n_docs,
        |    row_number() OVER (PARTITION BY content_hash
        |                       ORDER BY prio, keeper_id) AS rn
        |  FROM d
        |)
        |SELECT content_hash, keeper_id, keeper_source,
        |  CAST(n_docs AS BIGINT) AS n_docs
        |FROM g WHERE rn = 1""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_minhash_lsh" -> s"""$shingleCte,
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), seeds AS (
        |  SELECT seed, ('0x' || substr(md5(CAST(seed AS VARCHAR)), 1, 15))::BIGINT AS c
        |  FROM (SELECT unnest(range(16)) AS seed)
        |), mh AS (
        |  SELECT doc_id, seed, min(xor(h, c)) AS mh
        |  FROM post CROSS JOIN seeds GROUP BY doc_id, seed
        |), bk AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS sig
        |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
        |), okbk AS (
        |  -- maxBucket=1024 skew valve mirrored from Dedup.minhashLsh
        |  SELECT band, sig FROM bk GROUP BY band, sig HAVING count(*) <= 1024
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |  FROM bk x JOIN okbk o ON o.band = x.band AND o.sig = x.sig
        |    JOIN bk y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        |)
        |SELECT id1, id2, jac FROM (
        |  SELECT id1, id2, round(len(list_intersect(a.s, b.s)) * 1.0 /
        |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jac
        |  FROM cand JOIN sh a ON cand.id1 = a.doc_id JOIN sh b ON cand.id2 = b.doc_id)
        |WHERE jac >= 0.5""".stripMargin,

    // incremental probe: batch = doc_id%10=0, index = the rest; candidates
    // share a band signature; agree = matching-component fraction of the
    // two stored 16-hash signatures (k/16 — exact binary fractions)
    "dedup_incremental_probe" -> s"""$shingleCte,
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), seeds AS (
        |  SELECT seed, ('0x' || substr(md5(CAST(seed AS VARCHAR)), 1, 15))::BIGINT AS c
        |  FROM (SELECT unnest(range(16)) AS seed)
        |), mh AS (
        |  SELECT doc_id, seed, min(xor(h, c)) AS mh
        |  FROM post CROSS JOIN seeds GROUP BY doc_id, seed
        |), bk AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS sig
        |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
        |), cand AS (
        |  SELECT DISTINCT p.doc_id AS new_id, x.doc_id AS old_id
        |  FROM bk p JOIN bk x ON p.band = x.band AND p.sig = x.sig
        |  WHERE p.doc_id % 10 = 0 AND x.doc_id % 10 <> 0
        |)
        |SELECT new_id, old_id, agree FROM (
        |  SELECT new_id, old_id,
        |    round(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) * 1.0 / 16, 6)
        |      AS agree
        |  FROM cand
        |  JOIN mh a ON a.doc_id = new_id
        |  JOIN mh b ON b.doc_id = old_id AND b.seed = a.seed
        |  GROUP BY new_id, old_id)
        |WHERE agree >= 0.5""".stripMargin,

    "dedup_clusters" -> s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), seeds AS (
        |  SELECT seed, ('0x' || substr(md5(CAST(seed AS VARCHAR)), 1, 15))::BIGINT AS c
        |  FROM (SELECT unnest(range(16)) AS seed)
        |), mh AS (
        |  SELECT doc_id, seed, min(xor(h, c)) AS mh
        |  FROM post CROSS JOIN seeds GROUP BY doc_id, seed
        |), bk AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS sig
        |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
        |), okbk AS (
        |  -- maxBucket=1024 skew valve mirrored from Dedup.minhashLsh
        |  SELECT band, sig FROM bk GROUP BY band, sig HAVING count(*) <= 1024
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |  FROM bk x JOIN okbk o ON o.band = x.band AND o.sig = x.sig
        |    JOIN bk y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM (
        |    SELECT id1, id2, round(len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jac
        |    FROM cand JOIN sh a ON cand.id1 = a.doc_id JOIN sh b ON cand.id2 = b.doc_id)
        |  WHERE jac >= 0.5
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a AS src, a AS dst FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        |)
        |SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster
        |FROM reach GROUP BY src""".stripMargin,

    // hot-shingle cap mirrored from Dedup.ngramJaccardPairs(maxPostings=64):
    // shingles in > 64 docs leave the index entirely (pairs AND set sizes)
    "dedup_ngram_jaccard" -> s"""$shingleCte,
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), keep AS (SELECT h FROM post GROUP BY h HAVING count(*) <= 64),
        |kp AS (SELECT post.* FROM post JOIN keep USING (h)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM kp GROUP BY 1),
        |common AS (
        |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS inter
        |  FROM kp x JOIN kp y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, jac FROM (
        |  SELECT id1, id2,
        |    round(inter * 1.0 / (a.n + b.n - inter), 6) AS jac
        |  FROM common JOIN sizes a ON common.id1 = a.doc_id JOIN sizes b ON common.id2 = b.doc_id)
        |WHERE jac >= 0.5""".stripMargin,

    // recall audit: the exact posting-join chain and the minhash-LSH
    // chain share one shingle/posting base; recall = found/exact micro
    "dedup_recall_report" -> s"""$shingleCte,
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), keep AS (SELECT h FROM post GROUP BY h HAVING count(*) <= 64),
        |kp AS (SELECT post.* FROM post JOIN keep USING (h)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM kp GROUP BY 1),
        |common AS (
        |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS inter
        |  FROM kp x JOIN kp y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |), ex AS (
        |  SELECT id1, id2 FROM (
        |    SELECT id1, id2,
        |      round(inter * 1.0 / (a.n + b.n - inter), 6) AS jac
        |    FROM common JOIN sizes a ON common.id1 = a.doc_id
        |      JOIN sizes b ON common.id2 = b.doc_id)
        |  WHERE jac >= 0.5
        |), seeds AS (
        |  SELECT seed, ('0x' || substr(md5(CAST(seed AS VARCHAR)), 1, 15))::BIGINT AS c
        |  FROM (SELECT unnest(range(16)) AS seed)
        |), mh AS (
        |  SELECT doc_id, seed, min(xor(h, c)) AS mh
        |  FROM post CROSS JOIN seeds GROUP BY doc_id, seed
        |), bk AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS sig
        |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
        |), okbk AS (
        |  SELECT band, sig FROM bk GROUP BY band, sig HAVING count(*) <= 1024
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |  FROM bk x JOIN okbk o ON o.band = x.band AND o.sig = x.sig
        |    JOIN bk y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        |), lsh AS (
        |  SELECT id1, id2 FROM (
        |    SELECT id1, id2, round(len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jac
        |    FROM cand JOIN sh a ON cand.id1 = a.doc_id
        |      JOIN sh b ON cand.id2 = b.doc_id)
        |  WHERE jac >= 0.5
        |), fnd AS (
        |  SELECT id1, id2 FROM ex INTERSECT SELECT id1, id2 FROM lsh
        |)
        |SELECT
        |  CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_exact,
        |  CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
        |  CAST((SELECT count(*) FROM fnd) AS BIGINT) AS n_found,
        |  CAST(((SELECT count(*) FROM fnd) * 1000000) //
        |    greatest((SELECT count(*) FROM ex), 1) AS BIGINT)
        |    AS recall_micro""".stripMargin,

    // same posting/cap chain as dedup_ngram_jaccard; asymmetric ratios
    "dedup_containment" -> s"""$shingleCte,
        |post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), keep AS (SELECT h FROM post GROUP BY h HAVING count(*) <= 64),
        |kp AS (SELECT post.* FROM post JOIN keep USING (h)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM kp GROUP BY 1),
        |common AS (
        |  SELECT x.doc_id AS id1, y.doc_id AS id2, count(*) AS inter
        |  FROM kp x JOIN kp y ON x.h = y.h AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id1, id2, c12, c21 FROM (
        |  SELECT id1, id2,
        |    round(inter * 1.0 / a.n, 6) AS c12,
        |    round(inter * 1.0 / b.n, 6) AS c21
        |  FROM common JOIN sizes a ON common.id1 = a.doc_id
        |    JOIN sizes b ON common.id2 = b.doc_id)
        |WHERE greatest(c12, c21) >= 0.8""".stripMargin,

    // Mirrors operators.Corpus.cleanStats(lang=en, minScore=0.5, 3-gram
    // shingles, 16 hashes, 4 bands, threshold 0.5): language gate →
    // quality gate → exact dedup (min doc_id per md5(text)) → MinHash+LSH
    // pairs → recursive-CTE connected components → drop non-keepers →
    // per-source survivor counts + token volume.
    "corpus_clean" -> s"""WITH RECURSIVE g0 AS (
        |  SELECT doc_id, source, text,
        |    list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS wl
        |  FROM documents
        |), lid AS (
        |  SELECT *,
        |    len(list_filter(wl, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(wl, x -> x IN ('the','a','of','and','to','in','is','it'))) AS h_en,
        |    len(list_filter(wl, x -> x IN ('el','la','los','y','es','un','una'))) AS h_es,
        |    len(list_filter(wl, x -> x IN ('le','la','les','et','est','un','une'))) AS h_fr
        |  FROM g0
        |), scored AS (
        |  SELECT *,
        |    CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        |      WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
        |      WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |      WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |      ELSE 'fr' END AS pred_lang,
        |    CASE WHEN len(w) < 5 THEN 0.0 ELSE
        |      least(len(w) / 100.0, 1.0) * 0.4 +
        |      least((len(list_filter(wl, x -> x IN ('the','a','of','and','to','in','is','it')))
        |        * 1.0 / len(w)) * 5.0, 1.0) * 0.3 +
        |      least(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 /
        |        greatest(length(text), 1), 1.0) * 0.3 END AS score
        |  FROM lid
        |), gated AS (
        |  SELECT doc_id, source, text, w FROM scored
        |  WHERE pred_lang = 'en' AND score >= 0.5
        |), ek AS (
        |  SELECT doc_id, source, text, w FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM gated)
        |  WHERE doc_id = keeper
        |), sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM ek WHERE len(w) >= 3
        |), post AS (
        |  SELECT DISTINCT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |), seeds AS (
        |  SELECT seed, ('0x' || substr(md5(CAST(seed AS VARCHAR)), 1, 15))::BIGINT AS c
        |  FROM (SELECT unnest(range(16)) AS seed)
        |), mh AS (
        |  SELECT doc_id, seed, min(xor(h, c)) AS mh
        |  FROM post CROSS JOIN seeds GROUP BY doc_id, seed
        |), bk AS (
        |  SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
        |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed)) AS sig
        |  FROM mh GROUP BY doc_id, CAST(floor(seed / 4) AS INT)
        |), okbk AS (
        |  -- maxBucket=1024 skew valve mirrored from Dedup.minhashLsh
        |  SELECT band, sig FROM bk GROUP BY band, sig HAVING count(*) <= 1024
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
        |  FROM bk x JOIN okbk o ON o.band = x.band AND o.sig = x.sig
        |    JOIN bk y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
        |), pairs AS (
        |  SELECT id1, id2 FROM (
        |    SELECT id1, id2, round(len(list_intersect(a.s, b.s)) * 1.0 /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jac
        |    FROM cand JOIN sh a ON cand.id1 = a.doc_id JOIN sh b ON cand.id2 = b.doc_id)
        |  WHERE jac >= 0.5
        |), edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs
        |), reach AS (
        |  SELECT a AS src, a AS dst FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        |), drops AS (
        |  SELECT src AS doc_id FROM (
        |    SELECT src, min(dst) AS cluster FROM reach GROUP BY src)
        |  WHERE src <> cluster
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(${tokExpr("text")}) AS BIGINT) AS total_tokens
        |FROM ek WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        |GROUP BY source""".stripMargin,

    // TrainingData.twoHopCandidates over the per-nation QA frame: 2-hop
    // schemas with trail semantics (r1≠r2 on the stored-edge identity,
    // tgt≠src) and supervision vs the nation's order nodes.
    "td_twohop" -> withGraph(
      s""", qa AS (
         |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS id
         |  FROM customer WHERE c_nationkey <= 2
         |), gold AS (
         |  SELECT CAST(6000000000 + o_orderkey AS BIGINT) AS gid,
         |    CAST(c_nationkey AS BIGINT) AS gnat
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  WHERE c_nationkey <= 2
         |)
         |SELECT q.id, s.label AS src_label, s.name AS src_name,
         |  e1.relType AS rel1_type, m.label AS mid_label,
         |  e2.relType AS rel2_type, t.label AS tgt_label,
         |  CAST(count(DISTINCT t.nodeId) AS BIGINT) AS num_results,
         |  CAST(count(DISTINCT CASE WHEN g.gid IS NOT NULL THEN t.nodeId END)
         |    AS BIGINT) AS hits,
         |  'MATCH (x1:' || s.label || ' {name: "' || s.name || '"})-[r1:' ||
         |    e1.relType || ']-(x2:' || m.label || ')-[r2:' || e2.relType ||
         |    ']-(x3:' || t.label || ') RETURN DISTINCT x3.name AS name'
         |    AS cypher_query
         |FROM qa q
         |JOIN nodes s ON s.name = 'NATION_' || CAST(q.id AS VARCHAR)
         |JOIN bidir e1 ON s.nodeId = e1.a
         |JOIN nodes m ON e1.b = m.nodeId
         |JOIN bidir e2 ON m.nodeId = e2.a
         |JOIN nodes t ON e2.b = t.nodeId
         |LEFT JOIN gold g ON t.nodeId = g.gid AND g.gnat = q.id
         |WHERE t.nodeId <> s.nodeId AND $trailNeq
         |GROUP BY 1, 2, 3, 4, 5, 6, 7""".stripMargin),

    "dedup_simhash" -> s"""WITH w AS (
        |  SELECT doc_id, unnest($wordsExpr) AS word
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(lower(word)), 1, 8)) AS BIGINT) AS h
        |  FROM w
        |), tal AS (
        |  SELECT doc_id, ${(0 until 16).map(i =>
             s"sum(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS t_$i").mkString(", ")}
        |  FROM h GROUP BY doc_id
        |), sig AS (
        |  SELECT doc_id, CAST(${(0 until 16).map(i =>
             s"(CASE WHEN t_$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
        |  FROM tal
        |)
        |SELECT simhash, min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS n_docs
        |FROM sig GROUP BY simhash HAVING count(*) > 1""".stripMargin,

    "dedup_simhash_near" -> s"""WITH w AS (
        |  SELECT doc_id, unnest($wordsExpr) AS word
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(lower(word)), 1, 8)) AS BIGINT) AS h
        |  FROM w
        |), tal AS (
        |  SELECT doc_id, ${(0 until 32).map(i =>
             s"sum(CASE WHEN ((h >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS t_$i").mkString(", ")}
        |  FROM h GROUP BY doc_id
        |), sig AS (
        |  SELECT doc_id, CAST(${(0 until 32).map(i =>
             s"(CASE WHEN t_$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
        |  FROM tal
        |), bk AS (
        |  SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
        |  FROM sig, (SELECT unnest(range(4)) AS band) b
        |), kept AS (
        |  -- the maxBucket occupancy valve: over-full buckets are dropped
        |  SELECT band, key FROM bk
        |  GROUP BY band, key HAVING count(*) > 1 AND count(*) <= 64
        |), pairs AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
        |    CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS dist
        |  FROM bk x
        |  JOIN bk y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |  JOIN kept k ON k.band = x.band AND k.key = x.key
        |)
        |SELECT id1, id2, dist FROM pairs WHERE dist <= 2""".stripMargin,

    // bucket-skew stress: the planted hot band (all-zero signatures on
    // ~96% of the corpus) must be DROPPED by the maxBucket=24 valve while
    // the small planted group (doc_id % 29 = 0, signatures differing in
    // bit 0 by parity) pairs exactly — 1431677610 = 0x5555AAAA
    "dedup_band_skew" -> s"""WITH sigs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 29 = 0
        |      THEN xor(CAST(1431677610 AS BIGINT),
        |               CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |      ELSE CAST(0 AS BIGINT) END AS simhash
        |  FROM documents
        |), bk AS (
        |  SELECT doc_id, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS key
        |  FROM sigs, (SELECT unnest(range(4)) AS band) b
        |), kept AS (
        |  SELECT band, key FROM bk
        |  GROUP BY band, key HAVING count(*) > 1 AND count(*) <= 24
        |), pairs AS (
        |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
        |    CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS dist
        |  FROM bk x
        |  JOIN bk y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |  JOIN kept k ON k.band = x.band AND k.key = x.key
        |)
        |SELECT id1, id2, dist FROM pairs WHERE dist <= 4""".stripMargin,

    "text_langid" -> s"""WITH w AS (
        |  SELECT lang AS actual_lang,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
        |  FROM documents
        |), h AS (
        |  SELECT actual_lang,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','nicht','ein'))) AS h_de,
        |    len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS h_en,
        |    len(list_filter(w, x -> x IN ('el','la','los','y','es','un','una'))) AS h_es,
        |    len(list_filter(w, x -> x IN ('le','la','les','et','est','un','une'))) AS h_fr
        |  FROM w
        |)
        |SELECT actual_lang,
        |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
        |    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
        |    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |    ELSE 'fr' END AS pred_lang,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM h GROUP BY 1, 2""".stripMargin,

    // integer Flesch: 206835 − (1015·nw)//ns − (84600·sy)//nw milli-units,
    // sentences = [.!?]+ runs (min 1), syllables = vowel-group runs —
    // mirrors TextOps.readabilityBySource term for term
    "text_readability" ->
      s"""WITH d AS (
        |  SELECT source,
        |    CAST(len($wordsExpr) AS BIGINT) AS nw,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS ns,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT)
        |      AS sy
        |  FROM documents
        |), f AS (
        |  SELECT source, sy,
        |    206835 - (1015 * nw) // ns - (84600 * sy) // nw AS fl
        |  FROM d WHERE nw >= 1
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(fl) AS BIGINT) AS sum_flesch_milli,
        |  CAST(min(fl) AS BIGINT) AS min_flesch_milli,
        |  CAST(max(fl) AS BIGINT) AS max_flesch_milli,
        |  CAST(sum(sy) AS BIGINT) AS sum_syllables
        |FROM f GROUP BY source""".stripMargin,

    "text_quality" -> s"""WITH f AS (
        |  SELECT source, $wordsExpr AS w,
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS wl,
        |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 /
        |      greatest(length(text), 1) AS alpha_ratio
        |  FROM documents
        |), m AS (
        |  SELECT source, len(w) * 1.0 AS n_words,
        |    CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mwl,
        |    len(list_filter(wl, x -> x IN ('the','a','of','and','to','in','is','it'))) * 1.0
        |      / len(w) AS stop_ratio,
        |    alpha_ratio
        |  FROM f
        |), s AS (
        |  SELECT source, n_words, mwl,
        |    CASE WHEN n_words < 5 THEN 0.0 ELSE
        |      least(n_words / 100.0, 1.0) * 0.4 +
        |      least(stop_ratio * 5.0, 1.0) * 0.3 +
        |      least(alpha_ratio, 1.0) * 0.3 END AS score
        |  FROM m
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(score), 6) AS avg_score, round(avg(n_words), 6) AS avg_words,
        |  round(avg(mwl), 6) AS avg_word_len
        |FROM s GROUP BY source""".stripMargin,

    "text_tokens" -> s"""WITH t AS (
        |  SELECT lang, CAST(list_sum(list_transform($wordsExpr,
        |    w -> 1 + CAST(floor(length(w) / 4) AS BIGINT))) AS BIGINT) AS tok
        |  FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tokens, round(avg(tok), 6) AS avg_tokens
        |FROM t GROUP BY lang""".stripMargin,

    "text_fingerprint" -> s"""WITH fp AS (
        |  SELECT doc_id, md5(array_to_string(list_sort(list_distinct(
        |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))), ' ')) AS fp
        |  FROM documents
        |)
        |SELECT fp, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keeper_id
        |FROM fp GROUP BY fp HAVING count(*) > 1""".stripMargin,

    // one row per profiled column ([[graft.operators.Profile.tableProfile]]);
    // min/max rendered as strings so all columns share one schema
    // declarative DQ gate: each rule mirrored as a violation-count query
    "dq_checks" ->
      """SELECT 'pk_unique' AS rule, CAST(count(*) AS BIGINT) AS n_violations,
        |  count(*) = 0 AS passed FROM (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  GROUP BY 1, 2 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'suppkey_not_null', CAST(count(*) AS BIGINT), count(*) = 0
        |FROM lineitem WHERE l_suppkey IS NULL
        |UNION ALL
        |SELECT 'quantity_in_domain', CAST(count(*) AS BIGINT), count(*) = 0
        |FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        |UNION ALL
        |SELECT 'discount_in_domain', CAST(count(*) AS BIGINT), count(*) = 0
        |FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |UNION ALL
        |SELECT 'orderkey_ri', CAST(count(*) AS BIGINT), count(*) = 0
        |FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey"""
        .stripMargin,

    "profile_documents" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map(c =>
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin)
      .mkString("\nUNION ALL\n"),

    "mm_binary_stats" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY source""".stripMargin,

    "join_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, ts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT c.click_id, v.view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,

    // the custom AsOfJoinExec path scores against the SAME native ASOF
    // oracle as the compositional join_asof — equivalence proven by hash
    "join_asof_exec" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, ts, max(event_id) AS view_id FROM events
        |  WHERE event_type = 'view' GROUP BY 1, 2
        |)
        |SELECT c.click_id, v.view_id
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts""".stripMargin,

    "join_range" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id AS click_id FROM events
        |  WHERE event_type = 'click'
        |), errors AS (
        |  SELECT user_id, ts, event_id AS error_id FROM events
        |  WHERE event_type = 'error'
        |)
        |SELECT c.click_id, e.error_id
        |FROM clicks c JOIN errors e ON c.user_id = e.user_id
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 1 HOUR""".stripMargin,

    // interval-overlap self-join (Joins.intervalJoinBinned): the oracle is
    // the direct per-supplier overlap join; the Spark side must reproduce
    // it through bin-explode + first-shared-bin dedup
    "join_interval" ->
      """WITH iv AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS s,
        |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
        |      + 1 + CAST(l_quantity AS INTEGER) % 30 AS BIGINT) AS e,
        |    l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_quantity > 45
        |)
        |SELECT a.l_suppkey, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
        |    AS sum_overlap_days
        |FROM iv a JOIN iv b ON a.l_suppkey = b.l_suppkey
        |  AND a.s < b.e AND b.s < a.e
        |  AND (a.l_orderkey < b.l_orderkey OR
        |       (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
        |GROUP BY a.l_suppkey""".stripMargin,

    "events_json_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |  CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_distinct_k
        |FROM events GROUP BY event_type""".stripMargin,

    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // classical additive seasonal decomposition of the hourly count
    // series: centered 25-point MA trend (full frames only), per-hour-of-
    // day mean of the detrended series — integer micro-units throughout
    "events_seasonal" ->
      """WITH hourly AS (
        |  SELECT (epoch_us(ts) // 3600000000) AS h, count(*) AS y
        |  FROM events GROUP BY 1
        |), t AS (
        |  SELECT h, y,
        |    sum(y) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING
        |      AND 12 FOLLOWING) AS fsum,
        |    count(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING
        |      AND 12 FOLLOWING) AS fcnt
        |  FROM hourly
        |), d AS (
        |  SELECT h % 24 AS hod,
        |    y * 1000000 - ((fsum * 1000000) // fcnt) AS detr
        |  FROM t WHERE fcnt = 25
        |)
        |SELECT CAST(hod AS BIGINT) AS hod, CAST(count(*) AS BIGINT) AS n_obs,
        |  CAST(sum(detr) // count(*) AS BIGINT) AS seasonal_micro
        |FROM d GROUP BY 1 ORDER BY hod""".stripMargin,

    // trailing 1-hour per-user RANGE window (frame on integer epoch
    // seconds — order-insensitive for equal-second ties in both engines)
    "events_rolling" ->
      """SELECT event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_window,
        |  round(sum(value) OVER w, 2) AS sum_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000)
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""".stripMargin,

    // per-type Tukey fences from exact interpolated quartiles
    // (quantile_cont ≡ Spark percentile); fences compared unrounded —
    // both engines derive them with the identical IEEE expression
    "events_outliers" ->
      """WITH b AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type
        |), f AS (
        |  SELECT event_type, n_events,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        |  FROM b
        |)
        |SELECT e.event_type, f.n_events,
        |  CAST(sum(CASE WHEN e.value < f.lo OR e.value > f.hi
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(f.lo, 6) AS lo, round(f.hi, 6) AS hi
        |FROM events e JOIN f USING (event_type)
        |GROUP BY e.event_type, f.n_events, f.lo, f.hi""".stripMargin,

    // SCD2 validity intervals: lead() over (user, second, event_id)
    // point-in-time SCD2 lookup: clicks joined to the purchase-state
    // interval valid at click time (open interval capped at horizon);
    // the oracle is the direct range join over the lead() intervals
    "join_scd2_lookup" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value,
        |    (epoch_us(ts) // 1000000) AS tss
        |  FROM events
        |), p AS (
        |  SELECT user_id, event_id AS dim_id, value, tss AS valid_from,
        |    lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id)
        |      AS valid_to
        |  FROM e WHERE event_type = 'purchase'
        |), h AS (SELECT max(valid_from) + 1 AS horizon FROM p),
        |c AS (
        |  SELECT user_id, event_id AS click_id, tss FROM e
        |  WHERE event_type = 'click'
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |  CAST(sum(c.click_id) AS BIGINT) AS sum_click_ids,
        |  CAST(sum(p.dim_id) AS BIGINT) AS sum_dim_ids,
        |  round(CAST(sum(p.value) AS DOUBLE), 2) AS sum_state
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.tss >= p.valid_from
        |  AND c.tss < coalesce(p.valid_to, (SELECT horizon FROM h))""".stripMargin,

    "events_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    (epoch_us(ts) // 1000000) AS tss
        |  FROM events
        |)
        |SELECT user_id, event_id, value,
        |  tss AS valid_from,
        |  lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS valid_to,
        |  lead(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) IS NULL AS is_current
        |FROM e""".stripMargin,

    // SymSpell deletion blocking + exact levenshtein verify over distinct
    // part names (blocking is complete up to distance 1; shared variants
    // only bound distance at 2, hence the verify)
    // Soundex blocking (mirrors Fuzzy.soundexCode: one translate, three
    // collapse passes per digit, zero drop, rpad; the h/w-transparency
    // refinement is omitted in BOTH engines)
    "er_soundex" -> {
      val codes = "translate(name, 'abcdefghijklmnopqrstuvwxyz', " +
        "'01230120022455012623010202')"
      val collapsed = (1 to 6).foldLeft(codes) { (c, d) =>
        (1 to 3).foldLeft(c)((cc, _) => s"replace($cc, '$d$d', '$d')")
      }
      s"""WITH w AS (
        |  SELECT regexp_extract(p_name, '^[a-z]+', 0) AS name FROM part
        |), n AS (SELECT name FROM w WHERE length(name) > 0),
        |c AS (
        |  SELECT name,
        |    upper(substr(name, 1, 1)) ||
        |    rpad(substr(replace(substr($collapsed, 2, 100), '0', ''),
        |      1, 3), 3, '0') AS code
        |  FROM n
        |)
        |SELECT code, CAST(count(DISTINCT name) AS BIGINT) AS n_names,
        |  CAST(count(*) AS BIGINT) AS n_rows, min(name) AS first_name
        |FROM c GROUP BY code ORDER BY code""".stripMargin
    },

    // Tabibitosan gaps-and-islands: value - row_number constant within a
    // run; one keyed window, cross-key rollup
    "dq_islands" ->
      """WITH v AS (
        |  SELECT DISTINCT o_custkey AS k, o_orderkey AS v FROM orders
        |), g AS (
        |  SELECT k, v,
        |    v - row_number() OVER (PARTITION BY k ORDER BY v) AS grp,
        |    v - lag(v, 1) OVER (PARTITION BY k ORDER BY v) - 1 AS gap
        |  FROM v
        |), pk AS (
        |  SELECT k, count(*) AS n_vals,
        |    count(DISTINCT grp) AS n_islands,
        |    max(coalesce(gap, 0)) AS max_gap
        |  FROM g GROUP BY k
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(n_islands) AS BIGINT) AS n_islands_total,
        |  CAST(max(n_islands) AS BIGINT) AS max_islands_per_key,
        |  CAST(max(max_gap) AS BIGINT) AS max_gap
        |FROM pk""".stripMargin,

    // two-sample drift (even vs odd orders over 10 quantity bins): L1 and
    // chi-square contributions in integer micro-units — integer sums are
    // order-independent, and the only float ops are IEEE-exactly-rounded
    // multiply/divide on integer-valued doubles (no ln/exp)
    "dq_drift" ->
      """WITH t AS (
        |  SELECT LEAST(9, (CAST(l_quantity AS BIGINT) - 1) // 5) AS bin,
        |    CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END AS side
        |  FROM lineitem
        |), c AS (
        |  SELECT bin,
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM t GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c
        |), b AS (
        |  SELECT bin, n_ref, n_cur,
        |    CAST(round(1000000.0 * abs(
        |      CAST(n_ref AS DOUBLE) / t_ref - CAST(n_cur AS DOUBLE) / t_cur)) AS BIGINT) AS l1_micro,
        |    CAST(round(1000000.0 * CAST(n_ref * t_cur - n_cur * t_ref AS DOUBLE)
        |        * CAST(n_ref * t_cur - n_cur * t_ref AS DOUBLE)
        |      / (CAST(t_ref AS DOUBLE) * t_cur * (n_ref + n_cur))) AS BIGINT) AS chi2_micro
        |  FROM c, tot
        |)
        |SELECT bin, n_ref, n_cur, l1_micro, chi2_micro FROM b
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), CAST(sum(n_ref) AS BIGINT),
        |  CAST(sum(n_cur) AS BIGINT), CAST(sum(l1_micro) AS BIGINT),
        |  CAST(sum(chi2_micro) AS BIGINT)
        |FROM b
        |ORDER BY bin""".stripMargin,

    // pairwise Pearson r: exact Long moments in one pass, then the
    // double expression mirrored term for term (cast BEFORE the n·Σxy
    // products, which overflow Long by design)
    "profile_corr" -> {
      def rExpr(a: String, b: String) =
        s"round((CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)" +
          s" - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))" +
          s" / NULLIF(sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)" +
          s" - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))" +
          s" * sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)" +
          s" - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)), 0), 6)"
      def row(a: String, b: String) =
        s"""SELECT '${a}_$b' AS pair, CAST(n AS BIGINT) AS n,
           |  s_$a AS sx, s_$b AS sy, sp_${a}_$b AS sxy,
           |  ${rExpr(a, b)} AS r
           |FROM m""".stripMargin
      s"""WITH q AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS price,
        |    CAST(round(l_discount * 100, 0) AS BIGINT) AS disc
        |  FROM lineitem
        |), m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(qty) AS BIGINT) AS s_qty,
        |    CAST(sum(price) AS BIGINT) AS s_price,
        |    CAST(sum(disc) AS BIGINT) AS s_disc,
        |    CAST(sum(qty * qty) AS BIGINT) AS ss_qty,
        |    CAST(sum(price * price) AS BIGINT) AS ss_price,
        |    CAST(sum(disc * disc) AS BIGINT) AS ss_disc,
        |    CAST(sum(price * qty) AS BIGINT) AS sp_price_qty,
        |    CAST(sum(disc * price) AS BIGINT) AS sp_disc_price,
        |    CAST(sum(disc * qty) AS BIGINT) AS sp_disc_qty
        |  FROM q
        |)
        |${row("disc", "price")}
        |UNION ALL
        |${row("disc", "qty")}
        |UNION ALL
        |${row("price", "qty")}
        |ORDER BY pair""".stripMargin
    },

    "er_fuzzy_pairs" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |v AS (
        |  SELECT name, unnest(list_append(
        |    list_transform(range(1, len(name) + 1),
        |      i -> substr(name, 1, i - 1) || substr(name, i + 1)),
        |    name)) AS variant
        |  FROM names
        |), cand AS (
        |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
        |  FROM v a JOIN v b ON a.variant = b.variant AND a.name < b.name
        |)
        |SELECT name_a, name_b FROM cand
        |WHERE levenshtein(name_a, name_b) <= 1""".stripMargin,

    // equi-width value histogram (10 buckets over [0, 100))
    "events_histogram" ->
      """SELECT event_type,
        |  CAST(least(9, floor(value / 10)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    // equi-depth quartile bins over a deterministic (value, event_id)
    // total order; lo/hi are raw column doubles — bit-identical cross-engine
    "events_equidepth" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS bin
        |  FROM events
        |)
        |SELECT event_type, CAST(bin AS INTEGER) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(value) AS lo, max(value) AS hi
        |FROM b GROUP BY 1, 2""".stripMargin,

    // hour x type pivot as filtered counts (fixed column list)
    "events_pivot" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,

    // ordered conversion funnel: each stage's first completion must come
    // STRICTLY after the user's previous-stage completion
    "events_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_us(ts) // 1000000) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND (epoch_us(e.ts) // 1000000) > s1.t
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(epoch_us(e.ts) // 1000000) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND (epoch_us(e.ts) // 1000000) > s2.t
        |  GROUP BY e.user_id
        |)
        |SELECT 1 AS stage_idx, 'view' AS stage,
        |  CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        |UNION ALL SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        |UNION ALL SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)""".stripMargin,

    // ranking-window family over one deterministic total order
    "window_rank_funcs" ->
      """SELECT c_nationkey, c_custkey, rnk,
        |  round(pct, 6) AS pct_rank, round(cd, 6) AS cume, quartile
        |FROM (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(rank() OVER w AS INTEGER) AS rnk,
        |    percent_rank() OVER w AS pct,
        |    cume_dist() OVER w AS cd,
        |    CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey
        |               ORDER BY c_acctbal DESC, c_custkey)
        |) WHERE rnk <= 10""".stripMargin,

    // per-label embedding centroids (float -> double widening is exact in
    // both engines; avg rounded to 6)
    "emb_label_centroids" ->
      """WITH x AS (
        |  SELECT label, unnest(list_transform(range(1, len(embedding) + 1),
        |    i -> {'dim': i - 1, 'v': CAST(embedding[i] AS DOUBLE)})) AS s
        |  FROM embeddings
        |)
        |SELECT label, CAST(s.dim AS INTEGER) AS dim,
        |  CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(s.v), 6) AS centroid
        |FROM x GROUP BY label, s.dim""".stripMargin,

    // one-pass two-level ROLLUP (leaf, per-flag subtotal, grand total);
    // gid is the standard grouping bitmask with the first column as MSB
    "profile_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_measure
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "events_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, date_trunc('second', ts) AS tss FROM events
        |), flagged AS (
        |  SELECT user_id,
        |    CASE WHEN lag(tss) OVER (PARTITION BY user_id ORDER BY tss, event_id) IS NULL
        |      OR date_diff('second', lag(tss) OVER (PARTITION BY user_id
        |        ORDER BY tss, event_id), tss) > 21600 THEN 1 ELSE 0 END AS new_session
        |  FROM e
        |), per AS (
        |  SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions
        |  FROM flagged GROUP BY user_id
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(sessions) AS BIGINT) AS total_sessions,
        |  round(avg(sessions * 1.0), 6) AS avg_sessions,
        |  CAST(max(sessions) AS BIGINT) AS max_sessions
        |FROM per""".stripMargin
  )

  /** Recall@10 of each ANN oracle against the exact brute-force top-10 —
    * assembled from the per-method entries above (each method SQL runs as a
    * subquery; a drift between a method and its recall row is impossible by
    * construction). Mirrors [[graft.Queries.annRecallReport]]. */
  private def annRecallReportSql(m: Map[String, String]): String = {
    val bf = """SELECT vec_id FROM (
      |  SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
      |    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS similarity
      |  FROM embeddings ORDER BY similarity DESC, vec_id LIMIT 10)""".stripMargin
    val methods = Seq("ivf" -> "ann_ivf_topk", "ivf_kmeans" -> "ann_ivf_kmeans",
      "ivfpq" -> "ann_ivfpq_topk", "lsh" -> "ann_lsh_topk",
      "pq" -> "ann_pq_topk", "sq8" -> "ann_sq8_topk")
    methods.map { case (name, key) =>
      s"""SELECT '$name' AS method,
         |  round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall
         |FROM (${m(key)}) mm JOIN ($bf) bf ON mm.vec_id = bf.vec_id""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY method")
  }

  val all: Map[String, String] =
    base + ("ann_recall_report" -> annRecallReportSql(base))

  /** K-means-trained IVF ([[graft.operators.Vectors.ivfKmeansTopK]])
    * unrolled: each Lloyd iteration = one assignment CTE (argmax of
    * round(cos,6), cid tiebreak) + one per-dimension mean CTE (components
    * rounded to 6) + one array rebuild ordered by dimension. The zipped
    * double-unnest pairs each element with its 1-based position; the
    * position is only a within-engine sort key, so the 0-based Spark
    * posexplode aligns. */
  /** argmax-cosine centroid assignment CTE shared by the k-means oracles
    * (mirrors [[graft.operators.Vectors.assignToCentroids]]). */
  private def kmeansAssignCte(out: String, cents: String): String =
    s"""$out AS (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid) AS rn
       |    FROM e CROSS JOIN $cents c) WHERE rn = 1
       |)""".stripMargin

  /** Unrolled Lloyd iterations c1..cN over seed c0 (mirrors
    * [[graft.operators.Vectors.kmeansCentroids]]). */
  private def kmeansIterCtes(lloydIters: Int): String =
    (1 to lloydIters).map { t =>
      s"""${kmeansAssignCte(s"a$t", s"c${t - 1}")},
         |m$t AS (
         |  SELECT cid, i, round(avg(x), 6) AS m FROM (
         |    SELECT cid, unnest(range(1, len(v) + 1)) AS i, unnest(v) AS x FROM a$t)
         |  GROUP BY cid, i
         |), c$t AS (
         |  SELECT cid, list_transform(list(struct_pack(i := i, m := m) ORDER BY i),
         |    s -> s.m) AS cv
         |  FROM m$t GROUP BY cid
         |)""".stripMargin
    }.mkString(",\n")

  /** Per-centroid balance + angular inertia after the unrolled Lloyd
    * rounds (mirrors [[graft.operators.Vectors.kmeansQualityReport]]);
    * cos→micro via round(cos·1e6, 0), the events_ewma conversion. */
  private def kmeansQualitySql(nCentroids: Int, lloydIters: Int): String =
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT $nCentroids),
       |${kmeansIterCtes(lloydIters)},
       |${kmeansAssignCte("af", s"c$lloydIters")},
       |j AS (
       |  SELECT af.cid,
       |    CAST(round(list_cosine_similarity(af.v, c.cv) * 1000000, 0)
       |      AS BIGINT) AS cm
       |  FROM af JOIN c$lloydIters c USING (cid)
       |)
       |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(sum(1000000 - cm) AS BIGINT) AS inertia_micro,
       |  CAST(min(cm) AS BIGINT) AS worst_cos_micro
       |FROM j GROUP BY cid""".stripMargin

  private def ivfKmeansSql(k: Int, nCentroids: Int, nProbe: Int,
                           lloydIters: Int): String =
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE id = 0),
       |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT $nCentroids),
       |${kmeansIterCtes(lloydIters)},
       |${kmeansAssignCte("af", s"c$lloydIters")},
       |p AS (
       |  SELECT cid FROM c$lloydIters, q
       |  ORDER BY round(list_cosine_similarity(cv, qv), 6) DESC, cid LIMIT $nProbe
       |)
       |SELECT af.id AS vec_id, round(list_cosine_similarity(af.v, q.qv), 6) AS similarity
       |FROM af JOIN p USING (cid), q
       |ORDER BY similarity DESC, af.id LIMIT $k""".stripMargin

  /** SemDeDup ([[graft.operators.Dedup.semanticDedup]]) unrolled: same
    * k-means CTEs, then within-cluster pairs with cosine ≥ threshold drop
    * the higher id; per-cluster member/dropped counts. */
  private def semanticDedupSql(nClusters: Int, lloydIters: Int,
                               threshold: Double): String =
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT $nClusters),
       |${kmeansIterCtes(lloydIters)},
       |${kmeansAssignCte("af", s"c$lloydIters")},
       |pr AS (
       |  SELECT x.cid AS cid, y.id AS id
       |  FROM af x JOIN af y ON x.cid = y.cid AND x.id < y.id
       |  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= $threshold
       |  GROUP BY 1, 2
       |),
       |d AS (SELECT cid, count(*) AS n_dropped FROM pr GROUP BY cid)
       |SELECT m.cid, m.n_members, CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped
       |FROM (SELECT cid, CAST(count(*) AS BIGINT) AS n_members FROM af GROUP BY cid) m
       |LEFT JOIN d USING (cid)""".stripMargin

  /** GraphX `connectedComponents` (labels = component-min nodeId)
    * replicated as unrolled min-label propagation: each step every node
    * takes the min of its own and its neighbors' labels; after `iters` ≥
    * graph diameter steps the labels are the component minima. The TPC-H
    * graph's diameter is ≤ 8 (part—order—customer—nation—region chains);
    * 12 gives margin, and a non-converged oracle would fail the hash
    * check loudly rather than silently. O(V·iters) rows — the recursive
    * reachability form would be O(V·|component|) and is infeasible on a
    * connected graph. Output = the size histogram (n_nodes,
    * n_components), matching [[graft.graph.GraphXBridge.componentSizes]]. */
  /** MMR greedy selection ([[graft.operators.Vectors.mmrRerank]]) unrolled:
    * pick 1 is the relevance top-1; each later pick r maximizes
    * `lam*qs - (10-lam)*max(sim to s(r-1))` over the remaining pool, ties
    * on id. All similarities are 6-dp-rounded then integer micro-units, so
    * both engines compare identical BIGINTs. */
  private def mmrSql(poolSize: Int, k: Int, lamTenths: Int): String = {
    val lam = lamTenths; val inv = 10 - lamTenths
    def micro(x: String): String =
      s"CAST(round(round($x, 6) * 1000000, 0) AS BIGINT)"
    val picks = (2 to k).map { r =>
      s"""p$r AS (
         |  SELECT p.id, $lam * p.qs - $inv * (
         |      SELECT max(s) FROM sims
         |      WHERE ia = p.id AND ib IN (SELECT id FROM s${r - 1})) AS score
         |  FROM pool p WHERE p.id NOT IN (SELECT id FROM s${r - 1})
         |  ORDER BY score DESC, p.id LIMIT 1),
         |s$r AS (SELECT id FROM s${r - 1} UNION ALL SELECT id FROM p$r)"""
        .stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(r =>
      s"SELECT $r AS rank, id AS vec_id, score FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v FROM e WHERE vec_id = 0),
       |pool AS (
       |  SELECT vec_id AS id,
       |    ${micro("list_cosine_similarity(v, (SELECT v FROM q))")} AS qs, v
       |  FROM e WHERE vec_id <> 0
       |  ORDER BY qs DESC, id LIMIT $poolSize),
       |sims AS (
       |  SELECT a.id AS ia, b.id AS ib,
       |    ${micro("list_cosine_similarity(a.v, b.v)")} AS s
       |  FROM pool a JOIN pool b ON a.id <> b.id),
       |p1 AS (SELECT id, $lam * qs AS score FROM pool
       |       ORDER BY score DESC, id LIMIT 1),
       |s1 AS (SELECT id FROM p1),
       |$picks
       |SELECT rank, vec_id, score FROM (
       |$union) ORDER BY rank""".stripMargin
  }

  /** Product quantization ([[graft.operators.Vectors.pqTopK]]) unrolled:
    * per-subspace codebooks seeded at the first `kCodes` ids, `lloydIters`
    * rounded-mean Lloyd steps, ADC tables, candidate sum, exact re-rank.
    * Distances are round(Σ(x-y)², 6) with code/id tiebreaks, mirroring the
    * Spark side exactly. `subDim` = vector dim / m. */
  private def pqSql(k: Int, m: Int, kCodes: Int, lloydIters: Int, ef: Int,
                    subDim: Int): String = {
    def d2(x: String, y: String): String =
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"j -> ($x[j] - $y[j]) * ($x[j] - $y[j]))), 6)"
    def assign(out: String, cbk: String): String =
      s"""$out AS (
         |  SELECT id, sub, sv, code FROM (
         |    SELECT s.id, s.sub, s.sv, c.code,
         |      row_number() OVER (PARTITION BY s.id, s.sub
         |        ORDER BY ${d2("s.sv", "c.cv")} ASC, c.code) AS rn
         |    FROM sv s JOIN $cbk c ON s.sub = c.sub) WHERE rn = 1
         |)""".stripMargin
    val iters = (1 to lloydIters).map { t =>
      s"""${assign(s"a$t", s"cb${t - 1}")},
         |m$t AS (
         |  SELECT sub, code, i, round(avg(x), 6) AS mx FROM (
         |    SELECT sub, code, unnest(range(1, ${subDim + 1})) AS i,
         |      unnest(sv) AS x FROM a$t)
         |  GROUP BY sub, code, i
         |), cb$t AS (
         |  SELECT sub, code,
         |    list_transform(list(struct_pack(i := i, m := mx) ORDER BY i),
         |      s -> s.m) AS cv
         |  FROM m$t GROUP BY sub, code
         |)""".stripMargin
    }.mkString(",\n")
    val cbF = s"cb$lloydIters"
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE id = 0),
       |subs AS (SELECT unnest(range(0, $m)) AS sub),
       |sv AS (
       |  SELECT id, sub, list_slice(v, sub * $subDim + 1, (sub + 1) * $subDim) AS sv
       |  FROM e CROSS JOIN subs
       |),
       |seed AS (SELECT id FROM e ORDER BY id LIMIT $kCodes),
       |cb0 AS (SELECT s.sub, s.id AS code, s.sv AS cv FROM sv s JOIN seed USING (id)),
       |$iters,
       |${assign("af", cbF)},
       |qd AS (
       |  SELECT c.sub, c.code,
       |    ${d2("c.cv", s"list_slice(q.qv, c.sub * $subDim + 1, (c.sub + 1) * $subDim)")} AS qd2
       |  FROM $cbF c, q
       |),
       |cand AS (
       |  SELECT a.id, round(sum(qd.qd2), 6) AS adist
       |  FROM af a JOIN qd ON a.sub = qd.sub AND a.code = qd.code
       |  GROUP BY a.id ORDER BY adist ASC, a.id LIMIT $ef
       |)
       |SELECT e.id AS vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS similarity
       |FROM e JOIN cand USING (id), q
       |ORDER BY similarity DESC, e.id LIMIT $k""".stripMargin
  }

  /** IVF-PQ over residuals ([[graft.operators.Vectors.ivfPqTopK]]) rebuilt
    * in SQL: coarse assign by round-6 cosine (cid tiebreak), residual
    * v − centroid, shared sub-codebooks seeded at the first `kCodes` ids'
    * residual subvectors and Lloyd-refined with round-6 means, per-cell
    * query residual, ADC sum over (cell, sub, code), exact re-rank. */
  private def ivfPqSql(k: Int, nCells: Int, nProbe: Int, m: Int, kCodes: Int,
                       lloydIters: Int, ef: Int, subDim: Int): String = {
    val dim = m * subDim
    def d2(x: String, y: String): String =
      s"round(list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"j -> ($x[j] - $y[j]) * ($x[j] - $y[j]))), 6)"
    def assign(out: String, cbk: String): String =
      s"""$out AS (
         |  SELECT id, cid, sub, sv, code FROM (
         |    SELECT s.id, s.cid, s.sub, s.sv, c.code,
         |      row_number() OVER (PARTITION BY s.id, s.sub
         |        ORDER BY ${d2("s.sv", "c.cv")} ASC, c.code) AS rn
         |    FROM sv s JOIN $cbk c ON s.sub = c.sub) WHERE rn = 1
         |)""".stripMargin
    val iters = (1 to lloydIters).map { t =>
      s"""${assign(s"a$t", s"cb${t - 1}")},
         |m$t AS (
         |  SELECT sub, code, i, round(avg(x), 6) AS mx FROM (
         |    SELECT sub, code, unnest(range(1, ${subDim + 1})) AS i,
         |      unnest(sv) AS x FROM a$t)
         |  GROUP BY sub, code, i
         |), cb$t AS (
         |  SELECT sub, code,
         |    list_transform(list(struct_pack(i := i, m := mx) ORDER BY i),
         |      s -> s.m) AS cv
         |  FROM m$t GROUP BY sub, code
         |)""".stripMargin
    }.mkString(",\n")
    val cbF = s"cb$lloydIters"
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM e WHERE id = 0),
       |cents AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT $nCells),
       |asg AS (
       |  SELECT id, v, cid FROM (
       |    SELECT e.id, e.v, c.cid,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid) AS rn
       |    FROM e CROSS JOIN cents c) WHERE rn = 1
       |),
       |res AS (
       |  SELECT a.id, a.cid,
       |    list_transform(range(1, ${dim + 1}), i -> a.v[i] - c.cv[i]) AS r
       |  FROM asg a JOIN cents c USING (cid)
       |),
       |subs AS (SELECT unnest(range(0, $m)) AS sub),
       |sv AS (
       |  SELECT id, cid, sub,
       |    list_slice(r, sub * $subDim + 1, (sub + 1) * $subDim) AS sv
       |  FROM res CROSS JOIN subs
       |),
       |seed AS (SELECT id FROM e ORDER BY id LIMIT $kCodes),
       |cb0 AS (SELECT s.sub, s.id AS code, s.sv AS cv FROM sv s JOIN seed USING (id)),
       |$iters,
       |${assign("af", cbF)},
       |probes AS (
       |  SELECT cid, cv FROM (
       |    SELECT c.cid, c.cv,
       |      round(list_cosine_similarity(c.cv, q.qv), 6) AS qs
       |    FROM cents c, q ORDER BY qs DESC, c.cid LIMIT $nProbe)
       |),
       |qr AS (
       |  SELECT p.cid,
       |    list_transform(range(1, ${dim + 1}), i -> q.qv[i] - p.cv[i]) AS qr
       |  FROM probes p, q
       |),
       |qd AS (
       |  SELECT r.cid, c.sub, c.code,
       |    ${d2("c.cv", s"list_slice(r.qr, c.sub * $subDim + 1, (c.sub + 1) * $subDim)")} AS qd2
       |  FROM $cbF c CROSS JOIN qr r
       |),
       |cand AS (
       |  SELECT a.id, round(sum(qd.qd2), 6) AS adist
       |  FROM af a JOIN qd ON a.cid = qd.cid AND a.sub = qd.sub AND a.code = qd.code
       |  GROUP BY a.id ORDER BY adist ASC, a.id LIMIT $ef
       |)
       |SELECT e.id AS vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS similarity
       |FROM e JOIN cand USING (id), q
       |ORDER BY similarity DESC, e.id LIMIT $k""".stripMargin
  }

  /** k-core peeling ([[graft.graph.GraphAlgorithms.kCoreSizes]]) unrolled:
    * adj0 = distinct undirected neighbor pairs; each round keeps edges
    * whose both endpoints have current degree ≥ k. */
  /** Unrolled Bellman-Ford over the small-part co-occurrence graph with
    * affinity-distance weights, mirroring
    * [[graft.graph.GraphAlgorithms.ssspBounded]] +
    * [[graft.Queries.coocWeighted]]. */
  private def ssspSql(iters: Int, k: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""sd$t AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM sd${t - 1}
         |    UNION ALL
         |    SELECT e.b, n.d + e.w FROM sd${t - 1} n JOIN syms e ON n.v = e.a
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS kk, l_partkey AS p FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
       |), ew AS (
       |  SELECT x.p AS a, y.p AS b, 1000000 // count(*) AS w
       |  FROM li x JOIN li y ON x.kk = y.kk AND x.p < y.p GROUP BY x.p, y.p
       |), syms AS MATERIALIZED (
       |  SELECT a, b, w FROM ew UNION ALL SELECT b, a, w FROM ew
       |),
       |sd0 AS (SELECT v, CAST(0 AS BIGINT) AS d FROM
       |  (SELECT DISTINCT a AS v FROM syms ORDER BY a LIMIT 3)),
       |$rounds
       |SELECT v AS node_id, d AS dist FROM sd$iters
       |ORDER BY d, v LIMIT $k""".stripMargin
  }

  /** Distance-bounded Brandes betweenness unrolled
    * ([[graft.graph.GraphAlgorithms.betweennessTopK]]): forward layer CTEs
    * carry (src, v, d, σ) with σ = Σ over predecessors saturated at 1e6;
    * backward CTEs propagate δ(v) = Σ ⌊σv·(1e6+δw)/σw⌋ saturated at 1e12,
    * deepest layer δ = 0. Both saturations and the hop bound are engine
    * semantics, mirrored here. */
  private def betweennessSql(iters: Int, k: Int): String = {
    val fwd = (1 to iters).map { t =>
      s"""f$t AS MATERIALIZED (
         |  SELECT c.src, c.v, $t AS d, c.sigma FROM (
         |    SELECT p.src, e.b AS v, least(sum(p.sigma), 1000000) AS sigma
         |    FROM f${t - 1} p JOIN adjx e ON p.v = e.a
         |    GROUP BY p.src, e.b) c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM vis${t - 1} x WHERE x.src = c.src AND x.v = c.v)
         |),
         |vis$t AS MATERIALIZED (
         |  SELECT src, v, d, sigma FROM vis${t - 1}
         |  UNION ALL SELECT src, v, d, sigma FROM f$t
         |)""".stripMargin
    }.mkString(",\n")
    val bwd = ((iters - 1) to 0 by -1).map { t =>
      s"""del$t AS MATERIALIZED (
         |  SELECT l.src, l.v, l.sigma, COALESCE(s.delta, 0) AS delta
         |  FROM f$t l LEFT JOIN (
         |    SELECT l2.src, l2.v,
         |      least(sum((l2.sigma * (1000000 + dw.delta)) // dw.sigma),
         |        1000000000000) AS delta
         |    FROM f$t l2 JOIN adjx e ON l2.v = e.a
         |    JOIN del${t + 1} dw ON dw.src = l2.src AND dw.v = e.b
         |    GROUP BY l2.src, l2.v) s ON s.src = l.src AND s.v = l.v
         |)""".stripMargin
    }.mkString(",\n")
    val accUnion = (0 to iters).map(t => s"SELECT src, v, delta FROM del$t")
      .mkString("\n  UNION ALL ")
    s""", adjx AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |f0 AS (
       |  SELECT nodeId AS src, nodeId AS v, 0 AS d, CAST(1 AS BIGINT) AS sigma
       |  FROM nodes WHERE label = 'Region' AND name IN ('ASIA', 'EUROPE')
       |),
       |vis0 AS (SELECT src, v, d, sigma FROM f0),
       |$fwd,
       |del$iters AS (
       |  SELECT src, v, sigma, CAST(0 AS BIGINT) AS delta FROM f$iters
       |),
       |$bwd,
       |acc AS (
       |  $accUnion
       |)
       |SELECT v AS node_id, CAST(sum(delta) AS BIGINT) AS bc_micro
       |FROM acc WHERE v <> src
       |GROUP BY v ORDER BY bc_micro DESC, node_id LIMIT $k""".stripMargin
  }

  /** Unrolled BFS min-distance propagation from the ASIA region anchor,
    * mirroring [[graft.graph.GraphAlgorithms.bfsLayers]] (MATERIALIZED per
    * level — each level is referenced twice by the next). */
  /** Src-keyed bounded BFS (mirrors [[graft.graph.GraphAlgorithms
    * .eccentricityEst]]): every anchor's search in one keyed chain, final
    * row per anchor = (name, max distance, nodes reached). */
  private def eccSql(iters: Int, names: Seq[String]): String = {
    val nameList = names.map(n => s"'$n'").mkString(", ")
    val rounds = (1 to iters).map { t =>
      s"""ec$t AS MATERIALIZED (
         |  SELECT src, v, min(d) AS d FROM (
         |    SELECT src, v, d FROM ec${t - 1}
         |    UNION ALL
         |    SELECT n.src, e.b, n.d + 1 FROM ec${t - 1} n JOIN adje e ON n.v = e.a
         |  ) GROUP BY src, v
         |)""".stripMargin
    }.mkString(",\n")
    s""", adje AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |ec0 AS (
       |  SELECT nodeId AS src, nodeId AS v, 0 AS d FROM nodes
       |  WHERE label = 'Region' AND name IN ($nameList)
       |),
       |$rounds
       |SELECT n.name AS anchor, CAST(max(s.d) AS BIGINT) AS ecc,
       |  CAST(count(*) AS BIGINT) AS n_reached
       |FROM ec$iters s JOIN nodes n ON s.src = n.nodeId
       |GROUP BY n.name""".stripMargin
  }

  /** Greedy-matching handshake rounds unrolled (mirrors
    * [[graft.graph.GraphAlgorithms.greedyMatching]]): per round each live
    * node's min-priority edge, mutual picks matched, endpoints removed. */
  private def matchingSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""ends$t AS (
         |  SELECT a AS v, p FROM live${t - 1}
         |  UNION ALL SELECT b, p FROM live${t - 1}
         |), best$t AS (SELECT v, min(p) AS bp FROM ends$t GROUP BY v),
         |m$t AS MATERIALIZED (
         |  SELECT l.a, l.b FROM live${t - 1} l
         |  JOIN best$t x ON l.a = x.v AND l.p = x.bp
         |  JOIN best$t y ON l.b = y.v AND l.p = y.bp
         |), dead$t AS (SELECT a AS v FROM m$t UNION SELECT b FROM m$t),
         |live$t AS MATERIALIZED (
         |  SELECT l.a, l.b, l.p FROM live${t - 1} l
         |  ANTI JOIN dead$t da ON l.a = da.v
         |  ANTI JOIN dead$t db ON l.b = db.v
         |)""".stripMargin
    }.mkString(",\n")
    val allm = (1 to iters).map(t => s"SELECT a, b FROM m$t")
      .mkString(" UNION ALL ")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
       |), live0 AS MATERIALIZED (
       |  SELECT a, b, ('0x' || substr(md5(CAST(a AS VARCHAR) || '-' ||
       |    CAST(b AS VARCHAR)), 1, 15))::BIGINT AS p
       |  FROM (
       |    SELECT DISTINCT x.p AS a, y.p AS b
       |    FROM li x JOIN li y ON x.k = y.k AND x.p < y.p)
       |),
       |$rounds,
       |allm AS ($allm)
       |SELECT CAST((SELECT count(*) FROM allm) AS BIGINT) AS n_matched_edges,
       |  CAST(2 * (SELECT count(*) FROM allm) AS BIGINT) AS n_matched_nodes,
       |  CAST((SELECT count(*) FROM live$iters) AS BIGINT) AS n_live_edges"""
      .stripMargin
  }

  /** Luby MIS rounds unrolled (mirrors
    * [[graft.graph.GraphAlgorithms.lubyMisAssign]]): per round the live
    * strict-minimum-priority nodes join the set, they and their live
    * neighbors leave, and the live adjacency is pruned to both-ends-live. */
  private def misSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""mn$t AS (
         |  SELECT a.a AS v, min(un.p) AS mp FROM adj${t - 1} a
         |  JOIN u${t - 1} un ON a.b = un.v
         |  GROUP BY a.a
         |), win$t AS MATERIALIZED (
         |  SELECT u.v FROM u${t - 1} u LEFT JOIN mn$t m ON u.v = m.v
         |  WHERE m.mp IS NULL OR u.p < m.mp
         |), dead$t AS (
         |  SELECT v FROM win$t
         |  UNION
         |  SELECT a.b FROM adj${t - 1} a SEMI JOIN win$t w ON a.a = w.v
         |), u$t AS MATERIALIZED (
         |  SELECT u.v, u.p FROM u${t - 1} u ANTI JOIN dead$t d ON u.v = d.v
         |), adj$t AS MATERIALIZED (
         |  SELECT a.a, a.b FROM adj${t - 1} a
         |  SEMI JOIN u$t x ON a.a = x.v
         |  SEMI JOIN u$t y ON a.b = y.v
         |)""".stripMargin
    }.mkString(",\n")
    val allw = (1 to iters).map(t => s"SELECT v FROM win$t")
      .mkString(" UNION ALL ")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
       |), e0 AS (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.k = y.k AND x.p < y.p
       |), adj0 AS MATERIALIZED (
       |  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
       |), u0 AS MATERIALIZED (
       |  SELECT v, ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT
       |    AS p
       |  FROM (SELECT DISTINCT a AS v FROM adj0)
       |),
       |$rounds,
       |allw AS ($allw)
       |SELECT CAST((SELECT count(*) FROM allw) AS BIGINT) AS n_mis_nodes,
       |  CAST((SELECT coalesce(sum(v), 0) FROM allw) AS BIGINT)
       |    AS sum_mis_ids,
       |  CAST((SELECT count(*) FROM u$iters) AS BIGINT) AS n_undecided"""
      .stripMargin
  }

  /** Jones–Plassmann rounds unrolled (mirrors
    * [[graft.graph.GraphAlgorithms.jonesPlassmannColors]]): per round the
    * uncolored local-priority maxima take the mex of their colored
    * neighbors' colors. */
  private def coloringSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""mx$t AS (
         |  SELECT a.a AS v, max(un.p) AS mp FROM adjc a
         |  JOIN u${t - 1} uv ON a.a = uv.v
         |  JOIN u${t - 1} un ON a.b = un.v
         |  GROUP BY a.a
         |), win$t AS MATERIALIZED (
         |  SELECT u.v FROM u${t - 1} u LEFT JOIN mx$t m ON u.v = m.v
         |  WHERE m.mp IS NULL OR u.p > m.mp
         |), used$t AS (
         |  SELECT w.v, list(DISTINCT c.color) AS cs
         |  FROM win$t w JOIN adjc a ON w.v = a.a
         |  JOIN c${t - 1} c ON a.b = c.v
         |  GROUP BY w.v
         |), asg$t AS MATERIALIZED (
         |  SELECT w.v, coalesce(list_min(list_filter(
         |    range(0, len(u2.cs) + 1),
         |    x -> NOT list_contains(u2.cs, x))), 0) AS color
         |  FROM win$t w LEFT JOIN used$t u2 ON w.v = u2.v
         |), c$t AS MATERIALIZED (
         |  SELECT v, color FROM c${t - 1}
         |  UNION ALL SELECT v, color FROM asg$t
         |), u$t AS MATERIALIZED (
         |  SELECT u.v, u.p FROM u${t - 1} u ANTI JOIN win$t w ON u.v = w.v
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
       |), und AS MATERIALIZED (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.k = y.k AND x.p < y.p
       |), adjc AS MATERIALIZED (
       |  SELECT a, b FROM und UNION ALL SELECT b, a FROM und
       |), u0 AS (
       |  SELECT DISTINCT a AS v,
       |    ('0x' || substr(md5(CAST(a AS VARCHAR)), 1, 15))::BIGINT AS p
       |  FROM adjc
       |), c0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS v, CAST(NULL AS BIGINT) AS color
       |  WHERE 1 = 0
       |),
       |$rounds
       |SELECT CAST(color AS BIGINT) AS color,
       |  CAST(count(*) AS BIGINT) AS n_nodes
       |FROM c$iters GROUP BY color
       |UNION ALL
       |SELECT -1, CAST(count(*) AS BIGINT) FROM u$iters
       |HAVING count(*) > 0""".stripMargin
  }

  /** FW-BW reachability from the min-id pivot over DIRECTED rels
    * (mirrors [[graft.graph.GraphAlgorithms.fwBwPartition]]). */
  private def fwBwSql(iters: Int): String = {
    def chain(tag: String, joinA: String, joinB: String): String =
      (1 to iters).map { t =>
        s"""$tag$t AS MATERIALIZED (
           |  SELECT DISTINCT v FROM (
           |    SELECT v FROM $tag${t - 1}
           |    UNION ALL
           |    SELECT e.$joinB FROM $tag${t - 1} n JOIN dadj e ON n.v = e.$joinA
           |  )
           |)""".stripMargin
      }.mkString(",\n")
    s""", dadj AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM rels),
       |piv AS (SELECT least(min(a), min(b)) AS v FROM dadj),
       |f0 AS (SELECT v FROM piv),
       |${chain("f", "a", "b")},
       |b0 AS (SELECT v FROM piv),
       |${chain("b", "b", "a")},
       |alln AS (SELECT a AS v FROM dadj UNION SELECT b FROM dadj),
       |flag AS (
       |  SELECT n.v,
       |    CASE WHEN f.v IS NOT NULL THEN 1 ELSE 0 END AS in_f,
       |    CASE WHEN b.v IS NOT NULL THEN 1 ELSE 0 END AS in_b
       |  FROM alln n
       |  LEFT JOIN f$iters f ON n.v = f.v
       |  LEFT JOIN b$iters b ON n.v = b.v
       |)
       |SELECT CAST(sum(in_f * in_b) AS BIGINT) AS n_scc,
       |  CAST(sum(in_f * (1 - in_b)) AS BIGINT) AS n_fwd_only,
       |  CAST(sum((1 - in_f) * in_b) AS BIGINT) AS n_bwd_only,
       |  CAST(sum((1 - in_f) * (1 - in_b)) AS BIGINT) AS n_rest
       |FROM flag""".stripMargin
  }

  /** Bounded SCC certificates (mirrors
    * [[graft.graph.GraphAlgorithms.sccBoundedStats]]): forward and
    * backward min-label propagation chains, then the fm = bm grouping. */
  private def sccBoundedSql(iters: Int): String = {
    def chain(tag: String, srcCol: String, dstCol: String): String =
      (1 to iters).map { t =>
        s"""$tag$t AS MATERIALIZED (
           |  SELECT v, min(m) AS m FROM (
           |    SELECT v, m FROM $tag${t - 1}
           |    UNION ALL
           |    SELECT e.$srcCol, n.m FROM $tag${t - 1} n
           |    JOIN dadj e ON n.v = e.$dstCol
           |  ) GROUP BY v
           |)""".stripMargin
      }.mkString(",\n")
    s""", dadj AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM rels),
       |alln AS (SELECT a AS v FROM dadj UNION SELECT b FROM dadj),
       |f0 AS (SELECT v, v AS m FROM alln),
       |${chain("f", "a", "b")},
       |b0 AS (SELECT v, v AS m FROM alln),
       |${chain("b", "b", "a")},
       |j AS (
       |  SELECT f.v, f.m AS fm, b.m AS bm
       |  FROM f$iters f JOIN b$iters b ON f.v = b.v
       |), cl AS (
       |  SELECT fm AS scc, count(*) AS sz FROM j WHERE fm = bm GROUP BY fm
       |)
       |SELECT
       |  CAST((SELECT count(*) FROM cl) AS BIGINT) AS n_sccs,
       |  CAST((SELECT coalesce(sum(sz), 0) FROM cl) AS BIGINT)
       |    AS n_classified,
       |  CAST((SELECT coalesce(max(sz), 0) FROM cl) AS BIGINT)
       |    AS largest_scc,
       |  CAST((SELECT count(*) FROM j WHERE fm <> bm) AS BIGINT)
       |    AS n_unclassified""".stripMargin
  }

  private def bfsSql(iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""bd$t AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM bd${t - 1}
         |    UNION ALL
         |    SELECT e.b, n.d + 1 FROM bd${t - 1} n JOIN adjb e ON n.v = e.a
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    s""", adjb AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |bd0 AS (
       |  SELECT nodeId AS v, 0 AS d FROM nodes
       |  WHERE label = 'Region' AND name IN ('ASIA')
       |),
       |$rounds
       |SELECT s.d AS dist, n.label, CAST(count(*) AS BIGINT) AS n_nodes
       |FROM bd$iters s JOIN nodes n ON s.v = n.nodeId
       |GROUP BY s.d, n.label""".stripMargin
  }

  /** Sparse personalized PageRank from the ASIA anchor, mirroring
    * [[graft.graph.GraphAlgorithms.personalizedPageRank]] term-for-term
    * ((rank/deg)*0.85 contribs + 0.15 teleport rows summed together;
    * round-4 output like the global PageRank oracle). */
  private def pprSql(iters: Int, k: Int): String = {
    // initial mass and teleport are divided by the anchor count, exactly
    // mirroring personalizedPageRank's 1/nA and 0.15/nA (IEEE double
    // division in both engines) — so a multi-anchor query stays oracle-exact
    val rounds = (1 to iters).map { t =>
      s"""pp$t AS MATERIALIZED (
         |  SELECT v, sum(c) AS rank FROM (
         |    SELECT e.b AS v, r.rank * e.w AS c
         |    FROM pp${t - 1} r
         |    JOIN adjw e ON r.v = e.a
         |    UNION ALL
         |    SELECT v, 0.15 / n FROM anch CROSS JOIN na
         |  ) GROUP BY v
         |)""".stripMargin
    }.mkString(",\n")
    s""", adjp AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |degp AS (SELECT a, CAST(count(*) AS DOUBLE) AS deg FROM adjp GROUP BY a),
       |adjw AS MATERIALIZED (
       |  SELECT p.a, p.b, 0.85 / d.deg AS w
       |  FROM adjp p JOIN degp d ON p.a = d.a),
       |anch AS (SELECT nodeId AS v FROM nodes
       |         WHERE label = 'Region' AND name IN ('ASIA')),
       |na AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM anch),
       |pp0 AS (SELECT v, 1.0 / n AS rank FROM anch CROSS JOIN na),
       |$rounds
       |SELECT v AS node_id, round(rank, 4) AS rank
       |FROM pp$iters ORDER BY round(rank, 4) DESC, v LIMIT $k""".stripMargin
  }

  private def kCoreSql(k: Int, iters: Int): String = {
    // MATERIALIZED keeps DuckDB from inlining each round into the next
    // (each adj level is referenced three times per round — the plain-CTE
    // tree grows 3^iters, same failure the components oracle hit)
    val rounds = (1 to iters).map { t =>
      s"""d$t AS (SELECT a, count(*) AS deg FROM adj${t - 1} GROUP BY a),
         |alive$t AS (SELECT a AS id FROM d$t WHERE deg >= $k),
         |adj$t AS MATERIALIZED (
         |  SELECT t.a, t.b FROM adj${t - 1} t
         |  JOIN alive$t x ON t.a = x.id
         |  JOIN alive$t y ON t.b = y.id
         |)""".stripMargin
    }.mkString(",\n")
    s""", adj0 AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |$rounds
       |SELECT n.label, CAST(count(*) AS BIGINT) AS n_core
       |FROM (SELECT DISTINCT a FROM adj$iters) s
       |JOIN nodes n ON s.a = n.nodeId
       |GROUP BY n.label""".stripMargin
  }

  /** Derandomized DeepWalk unrolled (mirrors GraphAlgorithms
    * .deterministicWalks: neighbor rank by id order, choice =
    * md5("<start>_<c>_<t>") via the shared 60-bit hex-prefix family,
    * modulo degree). */
  /** k-truss support peeling unrolled ([[graft.graph.GraphAlgorithms
    * .kTrussStats]]): per round, symmetric adjacency → wedges (u, x<y) →
    * closures credit the closing edge once per triangle corner → peel
    * edges with support < k−2. The engine early-exits on an identity
    * round; extra unrolled rounds here are the identity, so results agree. */
  private def ktrussSql(k: Int, iters: Int): String = {
    val roundCtes = (1 to iters).map { r =>
      val p = r - 1
      s"""sym$r AS (SELECT a, b FROM e$p UNION ALL SELECT b, a FROM e$p),
         |w$r AS (
         |  SELECT s1.a AS u, s1.b AS x, s2.b AS y
         |  FROM sym$r s1 JOIN sym$r s2 ON s1.a = s2.a AND s1.b < s2.b
         |), t$r AS (
         |  SELECT w.x, w.y FROM w$r w
         |  WHERE EXISTS (SELECT 1 FROM e$p c WHERE c.a = w.x AND c.b = w.y)
         |), sup$r AS (
         |  SELECT x AS a, y AS b, count(*) AS s FROM t$r GROUP BY 1, 2
         |), e$r AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e$p e
         |  LEFT JOIN sup$r s ON s.a = e.a AND s.b = e.b
         |  WHERE coalesce(s.s, 0) >= ${k - 2}
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS kk, l_partkey AS p FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
       |), e0 AS MATERIALIZED (
       |  SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM li x JOIN li y ON x.kk = y.kk AND x.p < y.p
       |),
       |$roundCtes
       |SELECT CAST((SELECT count(*) FROM e$iters) AS BIGINT) AS n_edges,
       |  CAST((SELECT count(*) FROM (
       |    SELECT a AS v FROM e$iters UNION SELECT b FROM e$iters)) AS BIGINT)
       |    AS n_nodes""".stripMargin
  }

  private def walksSql(steps: Int): String = {
    val stepCtes = (1 to steps).map { t =>
      s"""wk$t AS MATERIALIZED (
         |  SELECT w.start, r.b AS c FROM wk${t - 1} w
         |  JOIN adjw r ON r.a = w.c AND r.rnk =
         |    (('0x' || substr(md5(w.start || '_' || w.c || '_' || $t),
         |      1, 15))::BIGINT) % r.deg
         |)""".stripMargin
    }.mkString(",\n")
    val unioned = (0 to steps)
      .map(t => s"SELECT $t AS step, start, c FROM wk$t")
      .mkString("\nUNION ALL\n")
    s""", adjw AS MATERIALIZED (
       |  SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS rnk,
       |    count(*) OVER (PARTITION BY a) AS deg
       |  FROM (SELECT DISTINCT a, b FROM bidir)
       |),
       |wk0 AS (SELECT nodeId AS start, nodeId AS c FROM nodes),
       |$stepCtes,
       |allsteps AS ($unioned)
       |SELECT CAST(step AS INTEGER) AS step,
       |  CAST(count(*) AS BIGINT) AS n_walks,
       |  CAST(count(DISTINCT c) AS BIGINT) AS n_nodes,
       |  CAST(sum(c) AS BIGINT) AS sum_node
       |FROM allsteps GROUP BY step ORDER BY step""".stripMargin
  }

  /** Skip-gram pairs over the unrolled walks: forward (center, context)
    * pairs at step distance 1..window, multiplicity histogram. */
  private def skipgramSql(steps: Int, window: Int): String = {
    val stepCtes = (1 to steps).map { t =>
      s"""wk$t AS MATERIALIZED (
         |  SELECT w.start, r.b AS c FROM wk${t - 1} w
         |  JOIN adjw r ON r.a = w.c AND r.rnk =
         |    (('0x' || substr(md5(w.start || '_' || w.c || '_' || $t),
         |      1, 15))::BIGINT) % r.deg
         |)""".stripMargin
    }.mkString(",\n")
    val unioned = (0 to steps)
      .map(t => s"SELECT $t AS step, start, c FROM wk$t")
      .mkString("\nUNION ALL\n")
    s""", adjw AS MATERIALIZED (
       |  SELECT a, b, row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS rnk,
       |    count(*) OVER (PARTITION BY a) AS deg
       |  FROM (SELECT DISTINCT a, b FROM bidir)
       |),
       |wk0 AS (SELECT nodeId AS start, nodeId AS c FROM nodes),
       |$stepCtes,
       |allsteps AS ($unioned),
       |pairs AS (
       |  SELECT x.c AS center, y.c AS context, count(*) AS n_pairs
       |  FROM allsteps x JOIN allsteps y
       |    ON x.start = y.start AND y.step > x.step
       |   AND y.step <= x.step + $window
       |  GROUP BY x.c, y.c
       |)
       |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       |  CAST(count(*) AS BIGINT) AS n_distinct_pairs,
       |  CAST(sum(center) AS BIGINT) AS sum_center,
       |  CAST(sum(context) AS BIGINT) AS sum_context
       |FROM pairs GROUP BY n_pairs ORDER BY n_pairs""".stripMargin
  }

  /** Synchronous LPA unrolled (mirrors GraphAlgorithms
    * .labelPropagationSizes: argmax neighbor label by (count desc, label
    * asc), isolated nodes keep their seed). MATERIALIZED for the same
    * CTE-inlining reason as the other iterative oracles. */
  /** Shared synchronous-LPA CTE chain (adjacency, seed labels, `iters`
    * argmax rounds) — the prefix of both [[lpaSql]] and [[modularitySql]]. */
  private def lpaCtes(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.a AS v, r.lbl, count(*) AS cnt
         |  FROM adjl e JOIN lp${i - 1} r ON r.v = e.b
         |  GROUP BY e.a, r.lbl
         |), b$i AS (
         |  SELECT v, lbl FROM (
         |    SELECT v, lbl,
         |      row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lbl) AS rn
         |    FROM c$i) WHERE rn = 1
         |), lp$i AS MATERIALIZED (
         |  SELECT n.v, COALESCE(b.lbl, n.lbl) AS lbl
         |  FROM lp${i - 1} n LEFT JOIN b$i b ON b.v = n.v
         |)""".stripMargin
    }.mkString(",\n")
    s""", adjl AS MATERIALIZED (SELECT DISTINCT a, b FROM bidir),
       |lp0 AS MATERIALIZED (SELECT nodeId AS v, nodeId AS lbl FROM nodes),
       |$steps""".stripMargin
  }

  private def lpaSql(iters: Int): String =
    s"""${lpaCtes(iters)}
       |SELECT n_nodes, CAST(count(*) AS BIGINT) AS n_communities FROM (
       |  SELECT lbl, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM lp$iters GROUP BY lbl)
       |GROUP BY n_nodes""".stripMargin

  /** Newman modularity of the LPA partition, same micro-unit quantization
    * as [[graft.graph.GraphAlgorithms.modularityStats]]: degree share
    * floored to micro BEFORE squaring (Long-safe, order-independent). */
  private def modularitySql(iters: Int): String =
    s"""${lpaCtes(iters)},
       |tot AS (
       |  SELECT count(*) AS twom,
       |    sum(CASE WHEN la.lbl = lb.lbl THEN 1 ELSE 0 END) AS e_in
       |  FROM adjl e
       |  JOIN lp$iters la ON la.v = e.a
       |  JOIN lp$iters lb ON lb.v = e.b
       |), degc AS (
       |  SELECT l.lbl, sum(d.deg) AS d_c FROM (
       |    SELECT a, count(*) AS deg FROM adjl GROUP BY a) d
       |  JOIN lp$iters l ON l.v = d.a GROUP BY l.lbl
       |), pen AS (
       |  SELECT COALESCE(sum((t * t) // 1000000), 0) AS pen FROM (
       |    SELECT (1000000 * d_c) // twom AS t FROM degc, tot)
       |)
       |SELECT CAST(twom AS BIGINT) AS twom, CAST(e_in AS BIGINT) AS e_in,
       |  CAST((1000000 * e_in) // twom - pen AS BIGINT) AS q_micro
       |FROM tot, pen""".stripMargin

  private def componentsSql(iters: Int): String = {
    // MATERIALIZED is load-bearing: each step references the previous
    // level twice, and DuckDB inlines plain CTEs per reference — the
    // unmaterialized tree grows 2^iters and dies on open file handles.
    val steps = (1 to iters).map { i =>
      s"""lp$i AS MATERIALIZED (
         |  SELECT n.v, least(n.lbl, COALESCE(min(r.lbl), n.lbl)) AS lbl
         |  FROM lp${i - 1} n
         |  LEFT JOIN bidir e ON e.a = n.v
         |  LEFT JOIN lp${i - 1} r ON r.v = e.b
         |  GROUP BY n.v, n.lbl
         |)""".stripMargin
    }.mkString(",\n")
    s""", lp0 AS MATERIALIZED (SELECT nodeId AS v, nodeId AS lbl FROM nodes),
       |$steps
       |SELECT n_nodes, CAST(count(*) AS BIGINT) AS n_components FROM (
       |  SELECT lbl, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM lp$iters GROUP BY lbl)
       |GROUP BY n_nodes""".stripMargin
  }

  /** GraphX `staticPageRank(numIter)` replicated in ANSI SQL, unrolled
    * (power iteration is a fixed-point join-aggregate; a fixed iteration
    * count makes it CTE-expressible): directed stored edges, init rank 1.0,
    * per step `r' = 0.15 + 0.85 * Σ_{u→v} r(u)/outdeg(u)`, then the final
    * sum normalization `rank * numVertices/Σrank` Spark applies for sink
    * mass (SPARK-18847). Mirrors [[graft.graph.GraphXBridge.pageRankTopK]]:
    * order by UNROUNDED rank desc then nodeId, limit k, round to 4.
    * Validated value-exact vs GraphX at sf0.01. */
  /** BPE apply mirror ([[graft.operators.TextOps.bpeTokens]]): same
    * boundary-delimited replace chain, chr(31) = the Spark side's U+001F. */
  private def bpeSql(merges: Seq[(String, String)], k: Int): String = {
    def d(s: String) = s"chr(31) || '$s' || chr(31)"
    val chain = merges.zipWithIndex.map { case ((a, b), i) =>
      s"""s${i + 1} AS (SELECT replace(s,
         |  chr(31) || '$a' || chr(31) || ${d(b)},
         |  ${d(a + b)}) AS s FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS (
       |  SELECT unnest(${wordsExprOf("lower(text)")}) AS word FROM documents
       |), s0 AS (
       |  SELECT substr(regexp_replace(word, '(.)',
       |    chr(31) || chr(31) || '\\1', 'g'), 2) || chr(31) AS s FROM w
       |),
       |$chain
       |SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences FROM (
       |  SELECT unnest(string_split(trim(s, chr(31)), chr(31) || chr(31)))
       |    AS token FROM s${merges.size})
       |GROUP BY token ORDER BY n_occurrences DESC, token LIMIT $k""".stripMargin
  }

  /** BPE merge-LEARNING mirror ([[graft.operators.TextOps
    * .bpeLearnMerges]]): k unrolled Sennrich rounds, each a pair-count
    * CTE over the D-encoded word histogram, a 1-row argmax CTE (count
    * desc, pair asc), and a `replace` apply CTE — the same
    * unrolled-iteration oracle pattern as k-means/k-core. */
  private def bpeLearnSql(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT t[i] AS a, t[i+1] AS b, CAST(sum(freq) AS BIGINT) AS f
         |  FROM (SELECT string_split(trim(enc, chr(31)),
         |          chr(31) || chr(31)) AS t, freq FROM v${i - 1}),
         |    unnest(generate_series(1, len(t) - 1)) AS u(i)
         |  GROUP BY a, b),
         |m$i AS (SELECT a, b, f FROM p$i ORDER BY f DESC, a, b LIMIT 1),
         |v$i AS (
         |  SELECT replace(enc, chr(31) || a || chr(31) || chr(31) ||
         |      b || chr(31), chr(31) || a || b || chr(31)) AS enc, freq
         |  FROM v${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k)
      .map(i => s"SELECT $i AS rank, a, b, f FROM m$i")
      .mkString("\nUNION ALL ")
    s"""WITH w AS (
       |  SELECT unnest(${wordsExprOf("lower(text)")}) AS word FROM documents
       |), v0 AS (
       |  SELECT substr(regexp_replace(word, '(.)',
       |      chr(31) || chr(31) || '\\1', 'g'), 2) || chr(31) AS enc,
       |    CAST(count(*) AS BIGINT) AS freq
       |  FROM w GROUP BY 1
       |),
       |$rounds
       |$out""".stripMargin
  }

  /** Shared snapshot→changelog→merged CTE chain mirroring
    * [[graft.Queries.ordersChangelog]] + Lakehouse.mergeSnapshot. */
  private lazy val mergeCte: String =
    """o AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |ch AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice,
      |    1 AS seq, 'U' AS op FROM o WHERE o_orderkey % 10 = 0
      |  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice + 2000, 2, 'U'
      |    FROM o WHERE o_orderkey % 100 = 0
      |  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice, 1, 'D'
      |    FROM o WHERE o_orderkey % 10 = 1
      |  UNION ALL SELECT o_orderkey + 100000000, 'N', o_totalprice, 1, 'I'
      |    FROM o WHERE o_orderkey % 10 = 2
      |),
      |latest AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice, op FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |      ORDER BY seq DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END) AS rn
      |    FROM ch) WHERE rn = 1
      |),
      |merged AS (
      |  SELECT o.* FROM o ANTI JOIN latest l ON o.o_orderkey = l.o_orderkey
      |  UNION ALL SELECT o_orderkey, o_orderstatus, o_totalprice
      |    FROM latest WHERE op <> 'D'
      |)""".stripMargin

  /** HITS ([[graft.graph.GraphAlgorithms.hits]]) unrolled: per round, sum
    * then `(raw · 1e6) // max(raw)`. All operands positive → // ≡ div;
    * DuckDB's HUGEINT sums agree with Spark's Long at these magnitudes. */
  private def hitsSql(iters: Int, k: Int): String = {
    def round(i: Int, src: String, joinOn: String, grpOn: String,
              out: String): String =
      s"""${out}r AS (
         |  SELECT n.nodeId AS id, COALESCE(sum(p.s), 0) AS raw
         |  FROM nodes n
         |  LEFT JOIN rels e ON e.$grpOn = n.nodeId
         |  LEFT JOIN $src p ON p.id = e.$joinOn
         |  GROUP BY n.nodeId),
         |$out AS (SELECT id, (raw * 1000000) // (SELECT max(raw) FROM ${out}r) AS s
         |         FROM ${out}r)""".stripMargin
    val rounds = (1 to iters).map { i =>
      round(i, s"h${i - 1}", "src", "dst", s"a$i") + ",\n" +
        round(i, s"a$i", "dst", "src", s"h$i")
    }.mkString(",\n")
    s""", h0 AS (SELECT nodeId AS id, CAST(1000000 AS BIGINT) AS s FROM nodes),
       |$rounds
       |SELECT h.id AS node_id, CAST(h.s AS BIGINT) AS hub_score,
       |  CAST(a.s AS BIGINT) AS auth_score
       |FROM h$iters h JOIN a$iters a ON h.id = a.id
       |ORDER BY a.s DESC, h.id LIMIT $k""".stripMargin
  }

  private def pageRankSql(numIter: Int, k: Int): String = {
    val iters = (1 to numIter).map { i =>
      s"""r$i AS (
         |  SELECT n.nodeId AS id,
         |    0.15 + 0.85 * COALESCE(sum(r.rank / d.outdeg), 0) AS rank
         |  FROM nodes n
         |  LEFT JOIN rels e ON e.dst = n.nodeId
         |  LEFT JOIN r${i - 1} r ON r.id = e.src
         |  LEFT JOIN deg d ON d.id = e.src
         |  GROUP BY n.nodeId
         |)""".stripMargin
    }.mkString(",\n")
    s""", deg AS (SELECT src AS id, CAST(count(*) AS DOUBLE) AS outdeg FROM rels GROUP BY src),
       |r0 AS (SELECT nodeId AS id, 1.0 AS rank FROM nodes),
       |$iters,
       |corr AS (SELECT CAST(count(*) AS DOUBLE) / sum(rank) AS c FROM r$numIter)
       |SELECT id AS node_id, round(rank * (SELECT c FROM corr), 4) AS rank
       |FROM r$numIter
       |ORDER BY rank * (SELECT c FROM corr) DESC, id
       |LIMIT $k""".stripMargin
  }

  /** The fixed driver case of [[graft.pipeline.GraphRaft.retrieveData]]
    * composed into one CTE chain (VERDICT r2 item 2): the widened single
    * candidate `MATCH (x1:Order {name:"1"})-[:CONTAINS]-(x2:Part)`, the T3
    * node-budget events, and the KNN backfill with found-id exclusion.
    *
    * Simplifications that are EXACT for this entry (not general T3):
    *  - one candidate whose rows are DISTINCT nodes → every event is an ADD,
    *    no pattern appends, so the event stream is just the similarity-desc/
    *    nodeId row order and "evict the budget-reaching add" reduces to
    *    `row_order < maxNodes`;
    *  - maxTokens = Long.MaxValue → the token stop check can never fire
    *    (cum_tokens is a Long), so token accounting is omitted.
    * Backfill mirrors retrieveData: round(cos,6) BEFORE the order/limit,
    * rank = n_found + row_number, keep rank < maxNodes. */
  private def pipelineRetrieveSql(maxNodes: Int, ef: Int): String =
    s"""${pipelineRetrieveCtes(maxNodes, ef)}
       |SELECT * FROM pr""".stripMargin

  /** The CTE chain of [[pipelineRetrieveSql]] with the result as `pr` —
    * reused by the context-formatting oracle. */
  private def pipelineRetrieveCtes(maxNodes: Int, ef: Int): String = {
    val qv = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
    s""", pe AS (
       |  SELECT CAST(5000000000 + e.vec_id AS BIGINT) AS nodeId, p.p_name AS name,
       |    CAST(e.embedding AS DOUBLE[]) AS v
       |  FROM embeddings e JOIN part p ON p.p_partkey = e.vec_id
       |), qr AS (
       |  SELECT DISTINCT t.nodeId, t.name,
       |    list_cosine_similarity(pe.v, $qv) AS similarity
       |  FROM nodes s
       |  JOIN bidir e ON s.nodeId = e.a AND e.relType = 'CONTAINS'
       |  JOIN nodes t ON e.b = t.nodeId AND t.label = 'Part'
       |  LEFT JOIN pe ON pe.nodeId = t.nodeId
       |  WHERE s.label = 'Order' AND s.name = '1'
       |), kept AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(row_number() OVER (ORDER BY similarity DESC, nodeId)
       |      AS BIGINT) AS row_order
       |    FROM qr)
       |  WHERE row_order < $maxNodes
       |), bf AS (
       |  SELECT nodeId, name,
       |    round(list_cosine_similarity(v, $qv), 6) AS similarity
       |  FROM pe
       |  WHERE nodeId NOT IN (SELECT nodeId FROM kept)
       |  ORDER BY similarity DESC, nodeId
       |  LIMIT $ef
       |), bfr AS (
       |  SELECT nodeId, name, similarity,
       |    CAST(row_number() OVER (ORDER BY similarity DESC, nodeId)
       |      + (SELECT count(*) FROM kept) AS BIGINT) AS rank
       |  FROM bf
       |), pr AS (
       |  SELECT nodeId AS node_id, name, round(similarity, 6) AS similarity,
       |    '(x1:Order {name: "1"})-[r1:CONTAINS]-(x2:Part {name: "' || name || '"})'
       |      AS patterns,
       |    row_order AS rank
       |  FROM kept
       |  UNION ALL
       |  SELECT nodeId, name, similarity, 'No pattern', rank
       |  FROM bfr WHERE rank < $maxNodes
       |)""".stripMargin
  }

  /** [[graft.functions.tokenCountEstimate]] over a SQL string expression. */
  private def tokExpr(s: String): String =
    s"""CAST(list_sum(list_transform(list_filter(string_split_regex($s, '\\s+'),
       | x -> x <> ''), w -> 1 + CAST(floor(length(w) / 4) AS BIGINT))) AS BIGINT)"""
      .stripMargin.replace("\n", "")

  /** [[graft.operators.TextOps.bpeTokenCount]] over a SQL string
    * expression: per lowercase word, the delimiter seed/fold/count of the
    * BPE family (text_bpe_*), summed — the tokenizer-exact budget's
    * oracle twin. */
  private def bpeTokExpr(merges: Seq[(String, String)])(s: String): String = {
    val seed =
      "substr(regexp_replace(w, '(.)', chr(31) || chr(31) || '\\1', 'g'), 2)" +
        " || chr(31)"
    val folded = merges.foldLeft(seed) { case (c, (a, b)) =>
      s"replace($c, chr(31) || '$a' || chr(31) || chr(31) || '$b' || chr(31)," +
        s" chr(31) || '${a + b}' || chr(31))"
    }
    s"CAST(coalesce(list_sum(list_transform(list_filter(" +
      s"string_split_regex(lower($s), '\\s+'), x -> x <> ''), " +
      s"w -> CAST(len(string_split(trim($folded, chr(31)), " +
      s"chr(31) || chr(31))) AS BIGINT))), 0) AS BIGINT)"
  }

  /** T3 event-level budget oracle, mirroring
    * [[graft.operators.Retrieval.budgetedAssemble]] exactly: the event
    * stream (add vs pattern-append), formatted-context marginal token costs
    * (the "\n\n" node separator is whitespace-only — invariant under the
    * whitespace-splitting estimator, so omitted here), the after-every-event
    * stop check at `rate`, and evict-last-added-on-overflow. */
  private def t3OracleSql(maxNodes: Int, maxTokens: Long, rate: Double,
                          tok: String => String = tokExpr): String = {
    // same prune formula as budgetedAssemble
    val prune = {
      val cap = math.max(rate, 1.0) * math.min(maxNodes.toDouble, maxTokens.toDouble) + 1
      if (cap >= Int.MaxValue) Int.MaxValue else cap.toInt
    }
    val addTok = tok("""'name: ' || name || chr(10) || 'pattern: [''' || pattern || ''']'""")
    val appTok = tok("""', ''' || pattern || ''''""")
    s"""WITH qr1 AS (
       |  SELECT CAST(6000000000 + o_orderkey AS BIGINT) AS nodeId,
       |    CAST(o_orderkey AS VARCHAR) AS name,
       |    ((6000000000 + o_orderkey) % 1000) / 1000.0 AS similarity,
       |    'q0:PLACED' AS pattern, 0 AS query_rank
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_name = 'Customer#000000042'
       |), qr2 AS (
       |  SELECT DISTINCT CAST(5000000000 + l_partkey AS BIGINT) AS nodeId,
       |    p_name AS name,
       |    ((5000000000 + l_partkey) % 1000) / 1000.0 AS similarity,
       |    'q1:PLACED,CONTAINS' AS pattern, 1 AS query_rank
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE c_name = 'Customer#000000042'
       |), u AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(row_number() OVER (PARTITION BY query_rank
       |        ORDER BY similarity DESC, nodeId) AS BIGINT) AS row_order
       |    FROM (SELECT * FROM qr1 UNION ALL SELECT * FROM qr2))
       |  WHERE row_order <= $prune
       |), ev AS (
       |  SELECT *,
       |    (row_number() OVER (PARTITION BY nodeId ORDER BY query_rank, row_order) = 1) AS is_add,
       |    CAST(row_number() OVER (ORDER BY query_rank, row_order) AS BIGINT) AS event_pos
       |  FROM u
       |), ev2 AS (
       |  SELECT *,
       |    sum(CASE WHEN is_add THEN 1 ELSE 0 END) OVER (ORDER BY event_pos) AS n_adds,
       |    CASE WHEN is_add THEN $addTok ELSE $appTok END AS marginal
       |  FROM ev
       |), ev3 AS (
       |  SELECT *, CAST(sum(marginal) OVER (ORDER BY event_pos) AS BIGINT) AS cum_tokens
       |  FROM ev2
       |), ev4 AS (
       |  SELECT *, CASE WHEN cum_tokens >= ${rate * maxTokens}
       |      OR (is_add AND n_adds >= ${rate * maxNodes}) THEN event_pos END AS stop_pos
       |  FROM ev3
       |), g1 AS (SELECT *, min(stop_pos) OVER () AS t_star FROM ev4
       |), g2 AS (SELECT *, max(CASE WHEN is_add AND event_pos <= t_star
       |    THEN event_pos END) OVER () AS last_add_pos FROM g1
       |), g3 AS (SELECT *, max(CASE WHEN event_pos = last_add_pos
       |    THEN nodeId END) OVER () AS evict_node FROM g2
       |), kept AS (
       |  SELECT * FROM g3
       |  WHERE (t_star IS NULL OR event_pos <= t_star)
       |    AND (evict_node IS NULL OR nodeId <> evict_node)
       |), canon AS (
       |  SELECT * FROM (SELECT kept.*, row_number() OVER (PARTITION BY nodeId
       |      ORDER BY query_rank, row_order) AS rn FROM kept) WHERE rn = 1
       |), prov AS (
       |  SELECT nodeId, string_agg(pattern, '|' ORDER BY query_rank, row_order) AS patterns,
       |    CAST(sum(marginal) AS BIGINT) AS tokens
       |  FROM kept GROUP BY nodeId
       |)
       |SELECT c.nodeId AS node_id, c.name, c.similarity, p.patterns,
       |  CAST(row_number() OVER (ORDER BY c.query_rank, c.row_order) AS BIGINT) AS rank,
       |  p.tokens, c.cum_tokens
       |FROM canon c JOIN prov p ON c.nodeId = p.nodeId""".stripMargin
  }

  /** Hilbert xy2d unrolled: level k consumes bit i = bits−k of the
    * (orderkey, partkey) cell, adds the quadrant code (3·rx) xor ry at
    * weight 4^i, and applies the reflect-and-swap rotation — the exact
    * per-level walk of [[graft.expr.HilbertIndex]]. CTE materialization
    * keeps each level linear (no self-referencing CASE blowup). */
  private def hilbertCtes(bits: Int): String = {
    val n = 1L << bits
    val sb = new StringBuilder(
      s"l0 AS (SELECT l_orderkey % $n AS x, l_partkey % $n AS y, " +
        "CAST(0 AS BIGINT) AS d FROM lineitem)")
    for (k <- 1 to bits) {
      val i = bits - k
      val s = 1L << i
      val rx = s"((x // $s) % 2)"
      val ry = s"((y // $s) % 2)"
      sb.append(s""",
        |l$k AS (
        |  SELECT
        |    CASE WHEN $ry = 0 THEN
        |      (CASE WHEN $rx = 1 THEN ${n - 1} - y ELSE y END)
        |    ELSE x END AS x,
        |    CASE WHEN $ry = 0 THEN
        |      (CASE WHEN $rx = 1 THEN ${n - 1} - x ELSE x END)
        |    ELSE y END AS y,
        |    d + xor(3 * $rx, $ry) * ${1L << (2 * i)} AS d
        |  FROM l${k - 1})""".stripMargin)
    }
    sb.toString
  }

  /** Goertzel recurrence unrolled: one CTE level per sample t, carrying
    * (s1, s2) per (doc, band); sample values regenerated from the
    * mm_audio_goertzel formula, never from bytes. Q14 coefficients are the
    * SAME driver-computed integers [[graft.operators.Multimodal
    * .goertzelCoefQ14]] embeds on the Spark side. */
  private def goertzelCtes(frameLen: Int, bands: Seq[Int]): String = {
    val bandVals = bands.map(k =>
      s"($k, ${graft.operators.Multimodal.goertzelCoefQ14(k, frameLen)})")
      .mkString(", ")
    val sb = new StringBuilder(
      s"g0 AS (SELECT doc_id, band, c, CAST(0 AS BIGINT) AS s1, " +
        s"CAST(0 AS BIGINT) AS s2 FROM documents " +
        s"CROSS JOIN (VALUES $bandVals) AS b(band, c))")
    for (t <- 0 until frameLen) {
      val x = s"(((doc_id * 7 + ${13L * t} + ${(t.toLong * t % 97L) * 31L})" +
        s" % 2001) - 1000)"
      sb.append(s""",
        |g${t + 1} AS (
        |  SELECT doc_id, band, c,
        |    $x + (c * s1) // 16384 - s2 AS s1, s1 AS s2
        |  FROM g$t)""".stripMargin)
    }
    sb.toString
  }

  /** Integer TF-IDF ranking over the four probe terms (mirrors
    * [[graft.operators.Search.tfidfTopK]]); shared by the in-memory and
    * persisted-layout entries. */
  private lazy val searchTfidfSql: String =
    s"""WITH p AS (
      |  SELECT doc_id, term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(${wordsExprOf("lower(text)")}) AS term
      |    FROM documents
      |  ) WHERE term IN ('vector', 'hash', 'join', 'window')
      |  GROUP BY doc_id, term
      |), d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |  CAST(sum((tf * 1000000 * n_docs) // df) AS BIGINT) AS score_micro
      |FROM p JOIN d USING (term) CROSS JOIN n
      |GROUP BY doc_id
      |ORDER BY score_micro DESC, doc_id LIMIT 20""".stripMargin

  /** Whitespace word list (non-empty), mirroring [[graft.functions.words]]. */
  private lazy val wordsExpr: String =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""

  private def wordsExprOf(col: String): String =
    s"""list_filter(string_split_regex($col, '\\s+'), x -> x <> '')"""

  /** Word-3-gram distinct shingle sets, mirroring
    * [[graft.operators.Dedup.shingleSets]] with n=3. */
  private lazy val shingleCte: String = s"""WITH w AS (
    |  SELECT doc_id, $wordsExpr AS w FROM documents
    |), sh AS (
    |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
    |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
    |  FROM w WHERE len(w) >= 3
    |)""".stripMargin

  /** 4-bit sign LSH bucket, mirroring [[graft.operators.Vectors.lshBucket]]. */
  private lazy val bucket4: String = (1 to 4).map(i =>
    s"(CASE WHEN v[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
}
