package graft

/** Catalog-wide plan lint: scale invariants that must hold for EVERY driver
  * query, checked against the smallest driver dataset.
  *
  *  - No `CartesianProduct` operator anywhere: an unbroadcast cross join is
  *    never the right plan for this catalog (intended tiny cross joins —
  *    IVF centroids, label-scoped mention frames — broadcast into
  *    BroadcastNestedLoopJoin instead).
  *  - Every relational/text query that does not touch vectors must not
  *    read an embedding column (column pruning reaches the scan).
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // corpus_clean materializes eagerly inside the operator (persist +
  // collect) and returns a local-rows frame — its returned plan is
  // trivially clean, so auditing it here would be vacuous assurance AND
  // execute the whole heavy pipeline twice; its plan properties are
  // covered by its own spec/oracle instead.
  private def auditable = SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot(_._1 == "corpus_clean")

  test("no unbroadcast CartesianProduct in any catalog query plan") {
    val offenders = auditable.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("no catalog entry ships a non-scalar hash surface (driver checker)") {
    // The driver's checker materializes every entry to pandas and calls
    // sort_values across ALL columns before hashing — ANY container cell
    // is unhashable there and errs the gate row (CORRECTNESS_r14:
    // cy_return_node/cy_return_star on dicts; CORRECTNESS_r15:
    // cy_set_label on a plain string array). Catalog entry outputs are
    // SCALARS ONLY: entity-shaped results serialize to canonical JSON
    // text (Queries.jsonSurface / DuckDB to_json), list-shaped results
    // flatten with array_join — structs, maps, and arrays may exist
    // INSIDE plans and specs, never on a catalog entry's output schema.
    import org.apache.spark.sql.types._
    def unhashable(dt: DataType): Boolean = dt match {
      case _: StructType | _: MapType | _: ArrayType => true
      case _                                         => false
    }
    val offenders = auditable.flatMap { case (name, fn) =>
      val bad = fn(spark, dir).schema.fields
        .filter(f => unhashable(f.dataType)).map(_.name)
      if (bad.nonEmpty) Some(s"$name(${bad.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"non-scalar output columns (driver-unhashable) in: " +
        s"${offenders.mkString(", ")}")
  }

  test("cy_call_topk plans ONE window, never a per-row re-execution") {
    // the 100 TB contract for CALL { … LIMIT k }: one row_number window
    // partitioned by the import key over the single pattern enumeration
    val plan = SparkEntry.queries("cy_call_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("RunningWindowFunction|Window".r.findAllIn(plan).size >= 1 &&
      plan.contains("row_number"), "top-k must plan as a window")
    assert(!plan.contains("CartesianProduct"))
  }

  test("uncorrelated CALL requires a bound (aggregate or LIMIT)") {
    import graft.graph.PropertyGraph
    val g = MicroGraph(spark)
    // unbounded + uncorrelated → the cartesian blow-up guard fires
    val e = intercept[IllegalArgumentException](graft.cypher.Planner.run(g,
      """MATCH (a:Author)
        |CALL { MATCH (p:Paper) RETURN p.name AS pn }
        |RETURN a.name AS n, pn""".stripMargin))
    assert(e.getMessage.contains("uncorrelated CALL"))
    // a LIMIT bounds it — the product side is at most k rows (broadcast)
    val ok = graft.cypher.Planner.run(g,
      """MATCH (a:Author)
        |CALL { MATCH (p:Paper) RETURN p.name AS pn ORDER BY p.name LIMIT 1 }
        |RETURN a.name AS n, pn ORDER BY n""".stripMargin)
    assert(ok.count() === 3L)
    assert(!ok.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // so does an aggregate (one row)
    val agg = graft.cypher.Planner.run(g,
      """MATCH (a:Author)
        |CALL { MATCH (p:Paper) RETURN count(p) AS np }
        |RETURN a.name AS n, np ORDER BY n""".stripMargin)
    assert(agg.collect().map(_.getLong(1)).toSeq === Seq(3L, 3L, 3L))
  }

  test("bulk rel upsert broadcasts the pair batch into the semi-joins") {
    // the 100 TB contract: the driver-resident pair list ships to the
    // node/edge scans; a SortMergeJoin would shuffle the 100 TB tables
    // on the batch's account
    val plan = SparkEntry.queries("cy_unwind_rel")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "pair batch must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("cy_pattern_comp plans grouped collects, not per-row subqueries") {
    // each comprehension = one grouped aggregation LEFT-joined back; the
    // plan must contain collect_list aggregates and no cartesian
    val plan = SparkEntry.queries("cy_pattern_comp")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("collect_list"), "comprehension must pre-aggregate")
    assert(!plan.contains("CartesianProduct"))
  }

  test("curate_decontam joins the eval side via broadcast, never sort-merge") {
    // the 100 TB contract: the corpus side stays narrow; the benchmark-
    // sized eval hash set broadcasts. A SortMergeJoin here would mean the
    // full corpus posting stream shuffles on the hash key.
    val plan = SparkEntry.queries("curate_decontam")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "eval side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "corpus side must not shuffle-join")
  }

  test("curate_dsir broadcasts the bucket-ratio table to the token stream") {
    // the 100 TB contract: the dim-row ratio table ships to the corpus
    // scan; a sort-merge join would shuffle the full token stream on slot
    val plan = SparkEntry.queries("curate_dsir")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "ratio table must broadcast")
    assert(!plan.contains("SortMergeJoin"), "token stream must not shuffle-join")
  }

  test("events_retention broadcasts cohort sizes; scrubs stay joinless") {
    val plan = SparkEntry.queries("events_retention")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "cohort sizes must broadcast")
    val pii = SparkEntry.queries("curate_pii")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!pii.contains("Join"), "PII audit is a pure scan + rollup")
    val enc = SparkEntry.queries("curate_fix_encoding")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!enc.contains("Join"), "encoding audit is a pure scan + rollup")
  }

  test("curate_hash_split plans as a joinless narrow scan + one aggregate") {
    // split assignment is a pure per-row map: any join or window in this
    // plan means the md5-bucket design regressed into something stateful
    val plan = SparkEntry.queries("curate_hash_split")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "hash split must not join")
    assert(!plan.contains("Window"), "hash split must not window")
  }

  test("join_asof plans with no join operator at all") {
    // the as-of design contract: one union + one keyed window, NEVER a join
    // node — a join formulation of as-of degenerates to per-key cartesian
    // candidate sets (BroadcastNestedLoopJoin) at scale
    val plan = SparkEntry.queries("join_asof")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must be union+window, not a join")
    assert(plan.contains("Window"), "as-of carries matches with a window")
  }

  test("join_range plans as an equi-join on the bin key, not a nested loop") {
    val plan = SparkEntry.queries("join_range")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join must bin into an equi-join, not a nested loop:\n" + plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "expected a hash/sort-merge equi-join on (key, bin):\n" + plan)
  }

  test("join_interval plans as an equi-join on (key, bin), not a nested loop") {
    val plan = SparkEntry.queries("join_interval")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "interval overlap must bin into an equi-join, not a nested loop:\n" + plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "expected a hash/sort-merge equi-join on (key, bin):\n" + plan)
  }

  test("layout_hilbert is a joinless narrow scan + one aggregate") {
    // the Hilbert index is ONE codegen'd expression over two key columns:
    // no join, no window, and the scan reads only those columns
    val df = SparkEntry.queries("layout_hilbert")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "hilbert keying must not join:\n" + plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>"),
      "scan must prune to the two key columns:\n" + plan)
  }

  test("layout_zorder pushes both range predicates into the parquet scan") {
    val plan = SparkEntry.queries("layout_zorder")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(l_orderkey,1000")
      && plan.contains("LessThan(l_partkey,200"),
      "both 2-D predicates must reach the scan for footer-stats pruning:\n" + plan)
  }

  test("non-vector queries never scan an embedding column") {
    val vectorQueries = Set(
      "v1_cosine_topk", "v2_knn_exclude", "v3_knn_fallback", "v5_label_lookup",
      "ann_lsh_topk", "ann_neardup_pairs", "ann_ivf_topk", "ann_ivf_kmeans",
      "pipeline_retrieve", "emb_random_projection", "emb_hard_negatives",
      "mmr_rerank", "v_filtered_topk")
    val offenders = auditable
      .filterNot { case (n, _) => vectorQueries(n) }
      .flatMap { case (name, fn) =>
        // leaf scans only: the cached graph's LINEAGE mentions the embedding
        // join (intended — the load stage attaches vectors once, like the
        // reference's ingest), but a pruned InMemoryTableScan/parquet scan
        // must not OUTPUT the column for a non-vector query
        val leaves = fn(spark, dir).queryExecution.executedPlan.collectLeaves()
        if (leaves.exists(_.output.exists(_.name.toLowerCase.contains("embedding"))))
          Some(name) else None
      }
    assert(offenders.isEmpty, s"embedding scans in: ${offenders.mkString(", ")}")
  }
}
