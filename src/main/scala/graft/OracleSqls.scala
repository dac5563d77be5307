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
        |WHERE lower(nfc_normalize(name)) = lower(nfc_normalize('NaTiOn_7'))""".stripMargin),

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

    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucket4 AS bucket FROM e)
         |SELECT vec_id, round(list_cosine_similarity(v,
         |    (SELECT v FROM b WHERE vec_id = 0)), 6) AS similarity
         |FROM b WHERE bucket = (SELECT bucket FROM b WHERE vec_id = 0)
         |ORDER BY similarity DESC, vec_id LIMIT 10""".stripMargin,

    "ann_neardup_pairs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, $bucket4 AS bucket FROM e)
         |SELECT id1, id2, cos_sim FROM (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2,
         |    round(list_cosine_similarity(x.v, y.v), 6) AS cos_sim
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |WHERE cos_sim >= 0.35""".stripMargin,

    "t3_budget_retrieval" ->
      """WITH qr1 AS (
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
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_rank
        |      ORDER BY similarity DESC, nodeId) AS BIGINT) AS row_order
        |  FROM (SELECT * FROM qr1 UNION ALL SELECT * FROM qr2)
        |), canon AS (
        |  SELECT * FROM (SELECT u.*, row_number() OVER (PARTITION BY nodeId
        |      ORDER BY query_rank, row_order) AS rn FROM u) WHERE rn = 1
        |), prov AS (
        |  SELECT nodeId, list(pattern ORDER BY query_rank, row_order) AS patterns
        |  FROM u GROUP BY nodeId
        |), j AS (
        |  SELECT c.nodeId, c.query_rank, c.row_order, c.name, c.similarity, p.patterns,
        |    CAST(1 + floor(length(c.name) / 4) AS BIGINT) AS tokens
        |  FROM canon c JOIN prov p ON c.nodeId = p.nodeId
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY query_rank, row_order) AS BIGINT) AS rank,
        |    CAST(sum(tokens) OVER (ORDER BY query_rank, row_order
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM j
        |)
        |SELECT nodeId AS node_id, name, similarity, patterns, rank, tokens, cum_tokens
        |FROM r WHERE rank <= 20 AND cum_tokens <= 45""".stripMargin,

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
        |), samples AS (
        |  SELECT custkey, s.sample_no,
        |    CAST(floor(u*u*u*u*u*u*u*u*u*u * n) AS INT) AS idx
        |  FROM (
        |    SELECT custkey, n, s.sample_no,
        |      CAST(('0x' || substr(md5(CAST(custkey AS VARCHAR) || ':' ||
        |        CAST(s.sample_no AS VARCHAR)), 1, 6)) AS BIGINT) / 16777216.0 AS u
        |    FROM counts, (SELECT unnest([0, 1, 2]) AS sample_no) s
        |  ) s
        |)
        |SELECT r.custkey, s.sample_no, r.orderkey
        |FROM samples s JOIN ranked r ON s.custkey = r.custkey AND r.rk = s.idx + 1""".stripMargin
  )

  /** 4-bit sign LSH bucket, mirroring [[graft.operators.Vectors.lshBucket]]. */
  private lazy val bucket4: String = (1 to 4).map(i =>
    s"(CASE WHEN v[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
}
