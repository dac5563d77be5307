package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.PropertyGraph
import Ast._

/** Lowers a mini-Cypher AST to a DataFrame plan over a [[PropertyGraph]]
  * (SURVEY §7.1 `graft.planner`). The output is an ordinary Catalyst plan:
  * anchors broadcast into hop joins over the bidirected edge view, trail
  * (relationship-uniqueness) filters between every rel pair of a path,
  * Cypher's implicit grouping for aggregates, DISTINCT / ORDER BY / LIMIT —
  * Catalyst then does join selection, pushdown, and codegen as usual.
  *
  * Semantics mirrored from the reference's executed query family:
  *  - undirected traversal `-[r]-` (retrieval/path_retriever.py:4-13)
  *  - trail semantics: same relationship bound at most once per MATCH path
  *  - label anchor `(x:L {name: v})` = label + equality filter
  *  - `_Entity_` label matches every node (stark_neo4j_loading.py:35)
  *  - implicit grouping: non-aggregated RETURN items are group keys
  *
  * @param params query parameters: Seq[String] (UNWIND name lists /
  *   id exclusion), Seq[Long] (id lists), Seq[Double] (query embedding).
  */
final class Planner(g: PropertyGraph, params: Map[String, Any] = Map.empty) {

  import Planner._

  // Bindings flowing across WITH barriers: node variables carried whole
  // (flattened as __w_<var>_<field> columns) and scalar projections
  // (flat columns under their aliases). Rebuilt at every barrier — WITH
  // drops everything it does not list, exactly like Cypher.
  private var carriedVars: Set[String] = Set.empty
  private var carriedScalars: Set[String] = Set.empty
  // variables bound by the stage currently being planned (they shadow a
  // carried var of the same name — same nodeId, fresher alias)
  private var stageVars: Set[String] = Set.empty
  // RELATIONSHIP variables of the stage being planned: property types must
  // resolve against the relationship schema, never the node schema (a rel
  // prop sharing a node-column name of a different type would otherwise
  // flip `/` between integer and double division)
  private var stageRelVars: Set[String] = Set.empty
  // variables bound ONLY by an OPTIONAL MATCH clause: flattened to
  // __o_<var>_<field> columns by the left join (null when unmatched)
  private var optNodeVars: Set[String] = Set.empty
  private var optRelVars: Set[String] = Set.empty

  def plan(q: CypherQuery): DataFrame = {
    require(q.paths.nonEmpty || q.prefixes.nonEmpty || q.shortest.nonEmpty,
      "at least one MATCH path")
    rejectRelVarCounts(q.items,
      q.paths ++ q.optionals.map(_.path) ++ q.prefixes.flatMap(_.paths))
    val base = q.prefixes.foldLeft(Option.empty[DataFrame]) {
      (acc, st) => Some(planStage(acc, st))
    }
    // variable-length rels expand to a UNION of fixed-length queries (one
    // per hop count — Cypher semantics: one row per distinct path, so a
    // pair reachable at both 1 and 2 hops yields two pre-DISTINCT rows);
    // every expansion is projected to the same canonical tuple schema, so
    // DISTINCT / aggregation happen once, over the union. A shortestPath
    // clause instead plans ONE keyed BFS (no enumeration).
    stageVars = varsOf(q.paths)
    stageRelVars = relVarsOf(q.paths)
    val tuple =
      if (q.shortest.isDefined) shortestTuple(q)
      else if (q.paths.isEmpty) projectTuple(base.get, q) // WITH … RETURN tail
      else expandVarLength(q)
        .map(fixed => tupleFrame(base, fixed)).reduce(_.unionByName(_))

    val projected =
      if (q.isAggregating) {
        val keyCols = q.items.collect {
          case i if !isAggItem(i) => col(i.name)
        }
        val aggCols = q.items.zipWithIndex.collect {
          case (i, idx) if isAggItem(i) => aggCol(i.expr, s"__agg$idx").as(i.name)
        }
        if (keyCols.isEmpty) tuple.agg(aggCols.head, aggCols.tail: _*)
        else tuple.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else {
        if (q.distinct) tuple.distinct() else tuple
      }

    val ordered =
      if (q.orderBy.isEmpty) projected
      else projected.orderBy(q.orderBy.map { case (ref, desc) =>
        if (desc) col(ref).desc else col(ref).asc }: _*)
    val skipped = q.skip.fold(ordered)(ordered.offset)
    q.limit.fold(skipped)(skipped.limit)
  }

  /** One WITH-chained stage: plan its MATCH like a mini-query, attach the
    * carried frame (equi-join on carried nodeIds, Cypher's re-binding),
    * then project the barrier — only listed items survive. */
  private def planStage(base: Option[DataFrame], st: Stage): DataFrame = {
    require(st.paths.nonEmpty, "stage without MATCH paths")
    rejectRelVarCounts(st.withItems, st.paths)
    stageVars = varsOf(st.paths)
    stageRelVars = relVarsOf(st.paths)
    val aggItems = st.withItems.filter(isAggItem)
    val frames = expandPaths(st.paths).map { ps =>
      val joined0 = joinPaths(st.unwinds, ps)
      val attached = attachBase(base, joined0, ps)
      val filtered = applyPreds(attached, st.preds)
      projectWith(filtered, st, ps)
    }
    val unioned = frames.reduce(_.unionByName(_))
    // Cypher's implicit grouping at the barrier: non-aggregate items are
    // the keys (a carried node groups by all its flattened fields —
    // nodeId-determined, so equivalent to grouping by identity); the
    // aggregation spans ALL var-length expansions, like the final stage's
    val out =
      if (aggItems.isEmpty) unioned
      else {
        val keyNames = unioned.columns.filterNot(c =>
          aggItems.exists(i => c == s"__aggsrc_${i.name}"))
        val aggCols = aggItems.map { i =>
          aggCol(i.expr, s"__aggsrc_${i.name}").as(i.name)
        }
        if (keyNames.isEmpty) unioned.agg(aggCols.head, aggCols.tail: _*)
        else unioned.groupBy(keyNames.map(col).toSeq: _*)
          .agg(aggCols.head, aggCols.tail: _*)
      }
    val dedup = if (st.withDistinct && aggItems.isEmpty) out.distinct() else out
    // WITH … ORDER BY / SKIP / LIMIT — the per-stage trim (top-k-per-stage
    // idiom), applied BEFORE the WITH…WHERE filter per openCypher's
    // sub-clause order. Cypher leaves tie order undefined; for a
    // reproducible trim the stage appends every remaining atomic projected
    // column (name-sorted, ascending) as tie-breakers — node identity is
    // nodeId-determined, so ties break deterministically. ORDER BY + LIMIT
    // plans as TakeOrderedAndProject: no global sort materializes.
    val trimmed =
      if (st.orderBy.isEmpty && st.skip.isEmpty && st.limit.isEmpty) dedup
      else {
        val sorted =
          if (st.orderBy.isEmpty) dedup
          else {
            val keyNames = st.orderBy.map { case (ref, _) =>
              barrierColName(ref, dedup.columns) }
            val keys = st.orderBy.zip(keyNames).map { case ((_, desc), kn) =>
              if (desc) col(kn).desc else col(kn).asc }
            val ties = dedup.schema.fields
              .filter(f => !keyNames.contains(f.name) && isAtomicType(f.dataType))
              .map(_.name).sorted.map(col(_).asc)
            dedup.orderBy((keys ++ ties.toSeq): _*)
          }
        val skipped = st.skip.fold(sorted)(sorted.offset)
        st.limit.fold(skipped)(skipped.limit)
      }
    val result = applyPreds(trimmed, st.withPreds)
    // the barrier: recompute what survives for the NEXT stage
    val (vars, scalars) = st.withItems.foldLeft((Set.empty[String], Set.empty[String])) {
      case ((vs, ss), RetItem(ColRef(n), _)) =>
        if (stageVars.contains(n) || carriedVars.contains(n)) (vs + n, ss)
        else (vs, ss + n)
      case ((vs, ss), i) => (vs, ss + i.name)
    }
    carriedVars = vars
    carriedScalars = scalars
    result
  }

  /** Join the carried frame to a stage's path product: every carried node
    * variable re-matched in this stage binds by nodeId equality (unique
    * key — exactly Cypher's semantics for a re-used variable); no shared
    * variable means a Cypher cartesian product. */
  private def attachBase(base: Option[DataFrame], joined: DataFrame,
                         ps: Seq[MatchPath]): DataFrame = base match {
    case None => joined
    case Some(acc) =>
      val shared = ps.flatMap(_.nodes.map(_.varName)).toSet
        .intersect(carriedVars).toSeq.sorted
      if (shared.isEmpty) acc.crossJoin(joined)
      else acc.join(joined, shared.map(v =>
        col(s"__w_${v}_nodeId") === col(s"$v.nodeId")).reduce(_ && _))
  }

  /** Project the WITH barrier: bare node vars flatten to __w_ columns
    * (every node field survives for later prop access), scalar items
    * land under their aliases. */
  private def projectWith(df: DataFrame, st: Stage,
                          ps: Seq[MatchPath]): DataFrame = {
    val nodeFields = g.nodes.columns.toSeq
    val vars = varsOf(ps)
    val cols = st.withItems.flatMap { i =>
      i.expr match {
        case ColRef(n) if vars.contains(n) =>
          nodeFields.map(f => col(s"$n.$f").as(s"__w_${n}_$f"))
        case ColRef(n) if carriedVars.contains(n) =>
          // pass an already-carried var through untouched
          nodeFields.map(f => col(s"__w_${n}_$f"))
        case ColRef(n) if carriedScalars.contains(n) => Seq(col(n))
        case ColRef(n) =>
          throw new IllegalArgumentException(s"unbound WITH item: $n")
        // aggregates project their SOURCE column here; the groupBy at the
        // barrier (planStage) aggregates across all expansions
        case CountDistinct(v) =>
          Seq(propCol(v, "nodeId").as(s"__aggsrc_${i.name}"))
        case CountDistinctInParam(v, _) =>
          Seq(propCol(v, "nodeId").as(s"__aggsrc_${i.name}"))
        case CollectDistinct(v, p) =>
          Seq(propCol(v, p).as(s"__aggsrc_${i.name}"))
        case CollectAll(v, p) =>
          Seq(propCol(v, p).as(s"__aggsrc_${i.name}"))
        case MinMaxProp(_, v, p) =>
          Seq(propCol(v, p).as(s"__aggsrc_${i.name}"))
        case CountStar =>
          Seq(lit(1L).as(s"__aggsrc_${i.name}"))
        case CountVar(v) =>
          Seq(propCol(v, "nodeId").as(s"__aggsrc_${i.name}"))
        case AggFn(_, arg, _) =>
          Seq(exprCol(arg, df.schema).as(s"__aggsrc_${i.name}"))
        case PercentileFn(_, arg, _) =>
          Seq(exprCol(arg, df.schema).as(s"__aggsrc_${i.name}"))
        case e => Seq(exprCol(e, df.schema).as(i.name))
      }
    }
    df.select(cols: _*)
  }

  /** Resolve a stage ORDER BY ref against the barrier's output columns:
    * `v.prop` is the flattened carry column `__w_v_prop`, a bare name is a
    * projected scalar. */
  private def barrierColName(ref: String, columns: Array[String]): String = {
    val name =
      if (ref.contains('.')) {
        val Array(v, p) = ref.split("\\.", 2)
        s"__w_${v}_$p"
      } else ref
    if (!columns.contains(name))
      throw new IllegalArgumentException(
        s"WITH ORDER BY '$ref' is not among the projected items")
    name
  }

  private def isAtomicType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType |
           org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }

  private def varsOf(ps: Seq[MatchPath]): Set[String] =
    ps.flatMap(_.nodes.map(_.varName)).toSet

  private def relVarsOf(ps: Seq[MatchPath]): Set[String] =
    ps.flatMap(_.rels.flatMap(_.varName)).toSet

  private def isAggItem(i: RetItem): Boolean = i.expr match {
    case _: CountDistinct | _: CountDistinctInParam |
         _: CollectDistinct | _: CollectAll | _: MinMaxProp | CountStar |
         _: CountVar | _: AggFn | _: PercentileFn => true
    case _ => false
  }

  /** `count(r)` / `count(DISTINCT r)` on a RELATIONSHIP variable is outside
    * the dialect (node identity is nodeId; relationships have no single-id
    * column to count) — reject at plan entry with a grammar-level message
    * instead of an unresolved-column AnalysisException. */
  private def rejectRelVarCounts(items: Seq[RetItem],
                                 paths: Seq[MatchPath]): Unit = {
    val relVars = paths.flatMap(_.rels.flatMap(_.varName)).toSet
    items.foreach(_.expr match {
      case CountDistinct(v) if relVars(v) =>
        throw new IllegalArgumentException(
          s"count(DISTINCT $v) over a relationship variable is outside the " +
            "dialect — count an endpoint node or use count(*)")
      case CountVar(v) if relVars(v) =>
        throw new IllegalArgumentException(
          s"count($v) over a relationship variable is outside the dialect " +
            "— count an endpoint node or use count(*)")
      case _ => ()
    })
  }

  /** Join one clause's paths (comma patterns / consecutive MATCH
    * clauses): a node variable REUSED across patterns re-binds by nodeId
    * equality — exactly Cypher's semantics for a shared variable —
    * while fully disjoint patterns cross-join (Cypher's cartesian
    * product). The repeat occurrence is planned under a fresh internal
    * alias and equated on nodeId (unique key), so every later property
    * reference resolves against the FIRST binding unambiguously.
    * Relationship uniqueness stays per path, like consecutive MATCH
    * clauses in Neo4j. */
  private def joinPaths(unwinds: Seq[Unwind], ps: Seq[MatchPath]): DataFrame = {
    var bound = Set.empty[String]
    var df: DataFrame = null
    ps.zipWithIndex.foreach { case (p, i) =>
      val shared = p.nodes.map(_.varName).distinct.filter(bound)
      val renames = shared.map(v => v -> s"__m${i}_$v").toMap
      val renamed = MatchPath(p.nodes.map(n =>
        renames.get(n.varName).fold(n)(nn => n.copy(varName = nn))), p.rels)
      val planned = planPath(unwinds, renamed)
      df =
        if (df == null) planned
        else if (shared.isEmpty) df.crossJoin(planned)
        else df.join(planned, shared.map(v =>
          col(s"$v.nodeId") === col(s"${renames(v)}.nodeId")).reduce(_ && _))
      bound ++= p.nodes.map(_.varName)
    }
    df
  }

  /** One fixed-length expansion joined, carried-frame-attached,
    * predicate-filtered, and projected to the canonical tuple schema:
    * non-aggregate items under their output names, aggregate items as
    * their pre-aggregation source column (`__agg<i>`), so all expansions
    * union cleanly. */
  private def tupleFrame(base: Option[DataFrame], q: CypherQuery): DataFrame = {
    val joined0 = joinPaths(q.unwinds, q.paths)
    val joined = attachBase(base, joined0, q.paths)
    val filtered = applyPreds(joined, q.preds)
    // rebuilt per expansion: an optional var must not count as "already
    // bound" when the NEXT var-length expansion of the main paths plans
    // the same optional clauses again
    optNodeVars = Set.empty; optRelVars = Set.empty
    val withOpt = q.optionals.foldLeft(filtered)(attachOptional)
    projectTuple(withOpt, q)
  }

  // the shortestPath clause's path variable (length(p) resolves against it)
  private var spVar: Option[String] = None

  /** `MATCH p = shortestPath((a…)-[:T*lo..hi]-(b…))` planned as a
    * source-keyed frontier BFS ([[graft.graph.GraphAlgorithms.srcKeyedMinDist]]):
    * the anchored `a` frame seeds one BFS source per binding, `hi` rounds
    * of frontier∘adjacency joins find each reachable node's MINIMUM hop
    * count (first discovery = min distance), and the `(src, v, dist)`
    * result joins back to both endpoint frames. Never a path enumeration:
    * cost is O(rounds · frontier), so an unselective pattern that would
    * blow up the union-of-expansions planner stays linear — the shape
    * that survives 100× data. `lo = 1` (the default) drops the
    * zero-length (a, a) pair; `lo = 0` keeps it, like Neo4j. */
  private def shortestTuple(q: CypherQuery): DataFrame = {
    val sp = q.shortest.get
    require(q.paths.isEmpty && q.prefixes.isEmpty && q.optionals.isEmpty &&
      q.unwinds.isEmpty, "shortestPath must be the query's only clause")
    val Seq(aPat, bPat) = sp.path.nodes
    val rel = sp.path.rels.head
    val (lo, hi) = rel.range.getOrElse(
      throw new IllegalArgumentException("shortestPath requires *lo..hi"))
    require(lo == 0 || lo == 1,
      "shortestPath minimum hop bound must be 0 or 1 (like Neo4j)")
    stageVars = Set(aPat.varName, bPat.varName)
    spVar = Some(sp.pathVar)
    // type-constrained traversal filters the edge view once; untyped uses
    // the graph's shared cached adjacency
    val adj =
      if (rel.relTypes.isEmpty) g.adjPairs
      else g.bidir.where(col("relType").isin(rel.relTypes: _*))
        .select(col("a"), col("b")).distinct()
    val aFrame = nodeFrame(Nil, aPat)
    val aSide = if (isAnchored(Nil, aPat)) broadcast(aFrame) else aFrame
    val seeds = aFrame.select(col(s"${aPat.varName}.nodeId").as("src"))
    // BFS state is O(seeds·V): a property-anchored endpoint seeds ~1
    // source, an unanchored one up to V — size the broadcast guard for
    // the worst case so unselective patterns take the shuffle path
    val stateRows =
      if (isAnchored(Nil, aPat)) g.nodeCount
      else try math.multiplyExact(g.nodeCount, g.nodeCount)
      catch { case _: ArithmeticException => Long.MaxValue }
    val dists = graft.graph.GraphAlgorithms
      .srcKeyedMinDist(adj, seeds, hi, stateRows)
      .where(col("dist") >= lo)
      .select(col("src"), col("v").as("__spv"),
        col("dist").cast("long").as("__splen"))
    val joined = aSide
      .join(dists, col(s"${aPat.varName}.nodeId") === col("src"))
      .join(nodeFrame(Nil, bPat),
        col("__spv") === col(s"${bPat.varName}.nodeId"))
      .drop("src", "__spv")
    val filtered = applyPreds(joined, q.preds)
    projectTuple(filtered, q)
  }

  /** Apply a WHERE list: scalar predicates fold into `where` columns;
    * `[NOT] EXISTS { pattern }` predicates each become a LEFT SEMI/ANTI
    * join against the pattern's solutions ([[attachExists]]). Scalars
    * first — they prune the frame before any join. */
  private def applyPreds(df: DataFrame, preds: Seq[Pred]): DataFrame = {
    val (pattern, scalar) = preds.partition(_.isInstanceOf[ExistsPat])
    val base = scalar.foldLeft(df)((d, p) => d.where(predCol(p, d.schema)))
    pattern.foldLeft(base)((d, p) => attachExists(d, p.asInstanceOf[ExistsPat]))
  }

  /** `[NOT] EXISTS { pattern }` = a LEFT SEMI (resp. ANTI) join of the
    * current frame against the DISTINCT shared-variable keys of the
    * pattern's solutions — Cypher's pattern predicate without a count or
    * a correlated subquery. The pattern side is one enumeration (its own
    * var-length expansions union first); the semi join is an ordinary
    * nodeId equi-join, so AQE/broadcast selection applies, and the
    * distinct keeps the build side at most |bindings| rows. */
  private def attachExists(main: DataFrame, ep: ExistsPat): DataFrame = {
    val boundBefore = stageVars ++ optNodeVars ++ carriedVars
    val sharedVars = ep.path.nodes.map(_.varName).distinct.filter(boundBefore)
    require(sharedVars.nonEmpty,
      "EXISTS pattern must share at least one bound variable")
    val frames = expandPaths(Seq(ep.path)).map(_.head).map { p =>
      val planned = planPath(Nil, p)
      val saved = stageVars
      stageVars = varsOf(Seq(p))
      try planned.select(
        sharedVars.map(v => col(s"$v.nodeId").as(s"__ek_$v")): _*)
      finally stageVars = saved
    }
    val sub = frames.reduce(_.unionByName(_)).distinct()
    val cond = sharedVars.map(v => propCol(v, "nodeId") === col(s"__ek_$v"))
      .reduce(_ && _)
    main.join(sub, cond, if (ep.negated) "left_anti" else "left_semi")
  }

  /** One OPTIONAL MATCH clause = a LEFT OUTER join of the preserved frame
    * against the optional pattern's solutions, keyed on the shared (already
    * bound) variables' nodeIds. The optional side is planned like any MATCH
    * (its WHERE filters the pattern, not the preserved rows), then projected
    * to a stable flattened schema — __ok_<v> join keys for shared vars,
    * __o_<var>_<field> for its new node vars (null-extended on no match),
    * __o_<rel>_relType for its named rels — so var-length expansions union
    * cleanly before the single left join. Scale shape: the optional side is
    * one pattern enumeration (the same hop joins as a mandatory MATCH); the
    * left join is an ordinary equi-join on nodeIds, so AQE/broadcast
    * selection applies as usual. */
  private def attachOptional(main: DataFrame, om: OptionalMatch): DataFrame = {
    val boundBefore = stageVars ++ optNodeVars ++ carriedVars
    val pathVars = om.path.nodes.map(_.varName).distinct
    val sharedVars = pathVars.filter(boundBefore)
    val newNodeVars = pathVars.filterNot(boundBefore)
    require(sharedVars.nonEmpty,
      "OPTIONAL MATCH must share at least one bound variable")
    val relVars = om.path.rels.flatMap(_.varName)
    val nodeFields = g.nodes.columns.toSeq
    val frames = expandPaths(Seq(om.path)).map(_.head).map { p =>
      val planned = planPath(Nil, p)
      // predicates resolve in the optional pattern's own alias space
      // (shared vars included — they are local aliases here); rel vars
      // too, so property TYPING resolves against the rel schema
      val saved = stageVars
      val savedRels = stageRelVars
      stageVars = varsOf(Seq(p))
      stageRelVars = relVarsOf(Seq(p))
      val filteredOpt =
        try om.preds.foldLeft(planned)((df, pr) => df.where(predCol(pr, df.schema)))
        finally { stageVars = saved; stageRelVars = savedRels }
      val keyCols = sharedVars.map(v => col(s"$v.nodeId").as(s"__ok_$v"))
      val newCols = newNodeVars.flatMap(v =>
        nodeFields.map(f => col(s"$v.$f").as(s"__o_${v}_$f")))
      val relCols = relVars.map(rv => col(s"$rv.relType").as(s"__o_${rv}_relType"))
      filteredOpt.select(keyCols ++ newCols ++ relCols: _*)
    }
    val optDf = frames.reduce(_.unionByName(_))
    val cond = sharedVars.map(v => propCol(v, "nodeId") === col(s"__ok_$v"))
      .reduce(_ && _)
    optNodeVars ++= newNodeVars
    optRelVars ++= relVars
    main.join(optDf, cond, "left").drop(sharedVars.map(v => s"__ok_$v"): _*)
  }

  private def projectTuple(df: DataFrame, q: CypherQuery): DataFrame = {
    val cols = q.items.zipWithIndex.map { case (i, idx) =>
      i.expr match {
        case CountDistinct(v)            => propCol(v, "nodeId").as(s"__agg$idx")
        case CountDistinctInParam(v, _)  => propCol(v, "nodeId").as(s"__agg$idx")
        case CollectDistinct(v, p)       => propCol(v, p).as(s"__agg$idx")
        case CollectAll(v, p)            => propCol(v, p).as(s"__agg$idx")
        case MinMaxProp(_, v, p)         => propCol(v, p).as(s"__agg$idx")
        case CountStar                   => lit(1L).as(s"__agg$idx")
        case CountVar(v)                 => propCol(v, "nodeId").as(s"__agg$idx")
        case AggFn(_, arg, _)            => exprCol(arg, df.schema).as(s"__agg$idx")
        case PercentileFn(_, arg, _)     => exprCol(arg, df.schema).as(s"__agg$idx")
        case e                           => exprCol(e, df.schema).as(i.name)
      }
    }
    df.select(cols: _*)
  }

  /** Enumerate the cartesian product of hop counts for every var-length
    * rel, rewriting each choice to a fixed-length path with fresh anonymous
    * intermediate nodes (same label/type constraints as the ranged rel). */
  private def expandPaths(paths: Seq[MatchPath]): Seq[Seq[MatchPath]] = {
    def expandPath(path: MatchPath, pathIdx: Int): Seq[MatchPath] =
      path.rels.zipWithIndex.foldLeft(Seq(MatchPath(path.nodes.take(1), Nil))) {
        case (acc, (r, i)) =>
          val next = path.nodes(i + 1)
          r.range match {
            case None =>
              acc.map(p => MatchPath(p.nodes :+ next, p.rels :+ r))
            case Some((lo, hi)) =>
              for { p <- acc; k <- lo to hi } yield {
                val anons = (1 until k).map(j =>
                  NodePat(s"__v${pathIdx}_${i}_$j", None, None, None))
                // every expanded hop keeps the ranged rel's direction
                val hopRels = Seq.fill(k)(RelPat(None, r.relTypes, None, r.dir))
                MatchPath(p.nodes ++ anons :+ next, p.rels ++ hopRels)
              }
          }
      }
    paths.zipWithIndex
      .map { case (p, idx) => expandPath(p, idx) }
      .foldLeft(Seq(Seq.empty[MatchPath])) { (acc, opts) =>
        for (a <- acc; o <- opts) yield a :+ o
      }
  }

  private def expandVarLength(q: CypherQuery): Seq[CypherQuery] =
    expandPaths(q.paths).map(ps => q.copy(paths = ps))

  /** One MATCH path = anchor/label-filtered node frames chained through the
    * bidirected edge view; every node var and rel var becomes a plan alias
    * so RETURN items can reference them. */
  private def planPath(unwinds: Seq[Unwind], path: MatchPath): DataFrame = {
    val first = nodeFrame(unwinds, path.nodes.head)
    // broadcast the head only when it is genuinely anchored (tiny)
    val head = if (isAnchored(unwinds, path.nodes.head)) broadcast(first) else first

    var df = head
    path.rels.zipWithIndex.foreach { case (r, i) =>
      val rv = r.varName.getOrElse(s"__r$i")
      // directed hops traverse ONE stored orientation — a plain projection
      // of the rel table (keeps the (relType, src, dst) identity for trail
      // semantics), strictly cheaper than the undirected bidir union. The
      // left-to-right pattern direction maps to (a, b): `->` walks src→dst,
      // `<-` walks dst→src; self-loops appear once either way.
      val view = r.dir match {
        case 1  => g.rels.select(col("relType"), col("src"), col("dst"),
          col("src").as("a"), col("dst").as("b"))
        case -1 => g.rels.select(col("relType"), col("src"), col("dst"),
          col("dst").as("a"), col("src").as("b"))
        case _  => g.bidir
      }
      val e = (if (r.relTypes.isEmpty) view
               else view.where(col("relType").isin(r.relTypes: _*))).as(rv)
      val prev = path.nodes(i).varName
      val next = path.nodes(i + 1)
      val nextFrame = nodeFrame(unwinds, next)
      df =
        if (isAnchored(unwinds, next)) {
          // meet-in-the-middle: when the hop's far node is anchored (tiny),
          // filter the edge leg by the anchor BEFORE joining the frontier —
          // otherwise the frontier joins the full edge table only to discard
          // almost all of it at the anchor (the 2-path scale killer)
          val eAnchored = e.join(broadcast(nextFrame),
            col(s"$rv.b") === col(s"${next.varName}.nodeId"))
          df.join(eAnchored, col(s"$prev.nodeId") === col(s"$rv.a"))
        } else {
          df.join(e, col(s"$prev.nodeId") === col(s"$rv.a"))
            .join(nextFrame, col(s"$rv.b") === col(s"${next.varName}.nodeId"))
        }
    }
    // trail semantics: every pair of rels in the path must bind different
    // stored relationships — identity is the (relType, src, dst) triple
    val rvs = path.rels.zipWithIndex.map { case (r, i) => r.varName.getOrElse(s"__r$i") }
    for (i <- rvs.indices; j <- i + 1 until rvs.length)
      df = df.where(!(col(s"${rvs(i)}.relType") === col(s"${rvs(j)}.relType") &&
        col(s"${rvs(i)}.src") === col(s"${rvs(j)}.src") &&
        col(s"${rvs(i)}.dst") === col(s"${rvs(j)}.dst")))
    df
  }

  private def isAnchored(unwinds: Seq[Unwind], n: NodePat): Boolean =
    n.anchorValue.isDefined || unwinds.exists(u => n.anchorValue.contains(VarRef(u.varName)))

  private def nodeFrame(unwinds: Seq[Unwind], n: NodePat): DataFrame = {
    val labeled = n.label match {
      case Some("_Entity_") | None => g.nodes
      case Some(l)                 => g.nodes.where(col("label") === l)
    }
    val anchored = (n.anchorProp, n.anchorValue) match {
      case (Some(p), Some(StrLit(v)))  => labeled.where(col(p) === lit(v))
      case (Some(p), Some(LongLit(v))) => labeled.where(col(p) === lit(v))
      case (Some(p), Some(VarRef(u))) =>
        // UNWIND $param AS u / UNWIND [lit, …] AS u, then MATCH (x {p: u})
        // — anchor against the unwound list (literal lists need no
        // parameter map)
        val uw = unwinds.find(_.varName == u).getOrElse(
          throw new IllegalArgumentException(s"unbound variable $u"))
        uw.literals match {
          case Some(ls) =>
            val vals: Seq[Any] = ls.map {
              case StrLit(s)  => s
              case LongLit(v) => v
              case other => throw new IllegalArgumentException(
                s"unsupported UNWIND literal $other")
            }
            labeled.where(col(p).isin(vals: _*))
          case None => params.get(uw.param) match {
            case Some(vs: Seq[_]) => labeled.where(col(p).isin(vs: _*))
            case _ => throw new IllegalArgumentException(s"missing parameter for UNWIND var $u")
          }
        }
      case _ => labeled
    }
    anchored.as(n.varName)
  }

  /** Resolve `v.field`: a variable bound by the CURRENT stage's MATCH
    * shadows (and equals, by the nodeId re-binding join) a carried one;
    * otherwise the flattened __w_ column from the last WITH barrier. */
  private def propCol(v: String, field: String): Column =
    if (stageVars.contains(v)) col(s"$v.$field")
    else if (optNodeVars.contains(v)) col(s"__o_${v}_$field")
    else if (carriedVars.contains(v)) col(s"__w_${v}_$field")
    else col(s"$v.$field") // rel vars and anonymous expansions

  private def predCol(p: Pred,
      schema: org.apache.spark.sql.types.StructType): Column = p match {
    case ExistsPat(_, _) =>
      // routed through applyPreds everywhere it is supported; reaching
      // here means an unsupported context (e.g. OPTIONAL MATCH WHERE)
      throw new IllegalArgumentException(
        "EXISTS { … } is not supported inside this WHERE context")
    case VarNeq(a, b) => propCol(a, "nodeId") =!= propCol(b, "nodeId")
    case NotIdIn(v, param) =>
      val ids = longs(param)
      !propCol(v, "nodeId").isin(ids: _*)
    case NormEqParam(c, param) =>
      val raw = params.getOrElse(param,
        throw new IllegalArgumentException(s"missing parameter $$$param"))
        .toString
      val normed = java.text.Normalizer.normalize(
        raw.toLowerCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFC)
      graft.functions.nfc(lower(scalarCol(c))) === lit(normed)
    case ColCmp(c, op, value) => cmpLit(scalarCol(c), op, value)
    case PropCmp(v, p, op, value) => cmpLit(propCol(v, p), op, value)
    case IsNullPred(PropRef(v, p), neg) =>
      if (neg) propCol(v, p).isNotNull else propCol(v, p).isNull
    case IsNullPred(ColRef(n), neg) =>
      if (neg) col(n).isNotNull else col(n).isNull
    case IsNullPred(other, _) =>
      throw new IllegalArgumentException(
        s"IS NULL applies to properties and projected columns, not $other")
    case InList(ref, vs, neg) =>
      val c = ref match {
        case PropRef(v, p) => propCol(v, p)
        case ColRef(n)     => col(n)
        case other => throw new IllegalArgumentException(
          s"IN applies to properties and projected columns, not $other")
      }
      // typed membership, like Cypher: the ref's STATIC type must agree
      // with the (parser-guaranteed homogeneous) list's element type —
      // otherwise Spark's In coercion string-casts one side, and e.g.
      // `"1" IN [1]` comes back true where Cypher says false. Numeric
      // widening (int column, long literals) is exact and allowed.
      val refType: Option[org.apache.spark.sql.types.DataType] = ref match {
        case PropRef(v, p) => varSchema(v).fields.find(_.name == p).map(_.dataType)
        case ColRef(n)     => schema.fields.find(_.name == n).map(_.dataType)
        case _             => None
      }
      val listIsString = vs.head.isInstanceOf[StrLit]
      refType.foreach { dt =>
        val ok =
          if (listIsString) dt == org.apache.spark.sql.types.StringType
          else dt.isInstanceOf[org.apache.spark.sql.types.NumericType]
        require(ok, s"IN list of ${if (listIsString) "strings" else "integers"} " +
          s"cannot test a ${dt.simpleString} ${ref match {
            case PropRef(v, p) => s"property $v.$p"
            case ColRef(n)     => s"column $n"
            case _             => "reference"
          }} — Cypher comparison is typed (no implicit casts)")
      }
      val lits: Seq[Any] = vs.map {
        case StrLit(s)  => s
        case LongLit(v) => v
        case other => throw new IllegalArgumentException(
          s"unsupported IN-list value $other")
      }
      if (neg) !c.isin(lits: _*) else c.isin(lits: _*)
    case StrPred(l, op, r) =>
      val lc = exprCol(l, schema); val rc = exprCol(r, schema)
      op match {
        case "CONTAINS"    => lc.contains(rc)
        case "STARTS WITH" => lc.startsWith(rc)
        case "ENDS WITH"   => lc.endsWith(rc)
        // Neo4j =~ anchors the WHOLE string; Spark rlike finds anywhere —
        // wrap in ^(?:…)$ (idempotent when the pattern already anchors)
        case "=~" =>
          regexp_like(lc, concat(lit("^(?:"), rc, lit(")$")))
        case o => throw new IllegalArgumentException(s"unknown string op $o")
      }
    case LabelPred(v, label, neg) =>
      // one pushable equality on the node frame's label column;
      // `_Entity_` matches every node (stark_neo4j_loading.py:35)
      val c = if (label == "_Entity_") lit(true)
              else propCol(v, "label") === lit(label)
      if (neg) !c else c
    case ExprCmp(l, op, r) =>
      val lc = exprCol(l, schema); val rc = exprCol(r, schema)
      op match {
        case "="  => lc === rc
        case "<>" => lc =!= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
        case ">"  => lc > rc
        case ">=" => lc >= rc
        case o    => throw new IllegalArgumentException(s"unknown operator $o")
      }
    // combinators never contain ExistsPat (parse-time invariant), so they
    // fold into one boolean column
    case OrPred(l, r)  => predCol(l, schema) || predCol(r, schema)
    case AndPred(l, r) => predCol(l, schema) && predCol(r, schema)
    case NotPred(p0)   => !predCol(p0, schema)
  }

  private def cmpLit(c: Column, op: String, value: AnchorValue): Column = {
    val l = value match {
      case StrLit(v)  => lit(v)
      case LongLit(v) => lit(v)
      case other =>
        throw new IllegalArgumentException(s"unsupported comparison value $other")
    }
    op match {
      case "="  => c === l
      case "<>" => c =!= l
      case "<"  => c < l
      case "<=" => c <= l
      case ">"  => c > l
      case ">=" => c >= l
      case o => throw new IllegalArgumentException(s"unknown operator $o")
    }
  }

  /** A bare column name: a WITH-projected scalar, or (rarely) a current
    * column by that exact name. */
  private def scalarCol(c: String): Column = col(c)

  private def isIntegralType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Schema a `v.prop` reference statically resolves against: the
    * relationship schema for a relationship variable, the node schema
    * for everything else (stage/carried/optional node vars and anonymous
    * var-length expansions are all node-shaped). */
  private def varSchema(v: String): org.apache.spark.sql.types.StructType =
    if (stageRelVars.contains(v) || optRelVars.contains(v)) g.rels.schema
    else g.nodes.schema

  /** Static type of a scalar expression, when resolvable: properties via
    * [[varSchema]], bare columns via the current frame's schema. */
  private def staticType(e: Expr,
      schema: org.apache.spark.sql.types.StructType)
      : Option[org.apache.spark.sql.types.DataType] = e match {
    case PropRef(v, p) => varSchema(v).fields.find(_.name == p).map(_.dataType)
    case ColRef(n)     => schema.fields.find(_.name == n).map(_.dataType)
    case StrLitE(_)    => Some(org.apache.spark.sql.types.StringType)
    case LongLitE(_)   => Some(org.apache.spark.sql.types.LongType)
    case ScalarFn("size" | "sign" | "toInteger", _) =>
      Some(org.apache.spark.sql.types.LongType)
    case ScalarFn("toFloat", _) => Some(org.apache.spark.sql.types.DoubleType)
    case ScalarFn("abs", args)  => staticType(args.head, schema)
    case ScalarFn(_, _) => Some(org.apache.spark.sql.types.StringType)
    // a `+` with a string side is a CONCATENATION (string result), so
    // nested concats like ("a" + x) + ("b" + y) stay string-typed
    case BinOp("+", l, r)
      if staticType(l, schema).contains(org.apache.spark.sql.types.StringType) ||
         staticType(r, schema).contains(org.apache.spark.sql.types.StringType) =>
      Some(org.apache.spark.sql.types.StringType)
    // coalesce/CASE take their branches' type (first statically
    // resolvable one) — so coalesce(p.abstract, "?") + x concatenates
    // instead of falling through to numeric + and nulling out
    case CoalesceE(args) => args.flatMap(staticType(_, schema)).headOption
    case CaseExpr(bs, d) =>
      (bs.map(_._2) ++ d.toSeq).flatMap(staticType(_, schema)).headOption
    case _             => None
  }

  /** Static integral-ness of an expression — decides whether `/` is
    * Cypher's integer division (both operands integral) or double
    * division. Properties resolve against the schema of the frame their
    * VARIABLE is bound to ([[varSchema]] — rel vars against the rel
    * schema); bare columns against the current frame's. */
  private def isIntegralExpr(e: Expr,
      schema: org.apache.spark.sql.types.StructType): Boolean = e match {
    case LongLitE(_)   => true
    case PropRef(v, p) =>
      varSchema(v).fields.find(_.name == p).exists(f => isIntegralType(f.dataType))
    case ColRef(n)     =>
      schema.fields.find(_.name == n).exists(f => isIntegralType(f.dataType))
    case ScalarFn("size" | "sign" | "toInteger", _) => true // Cypher integers
    case ScalarFn("abs", args) => isIntegralExpr(args.head, schema)
    case BinOp(_, l, r)  => isIntegralExpr(l, schema) && isIntegralExpr(r, schema)
    case CoalesceE(args) => args.forall(isIntegralExpr(_, schema))
    case CaseExpr(bs, d) =>
      bs.forall { case (_, x) => isIntegralExpr(x, schema) } &&
        d.forall(isIntegralExpr(_, schema))
    case _ => false
  }

  private def condCol(c: Cond,
      schema: org.apache.spark.sql.types.StructType): Column = c match {
    case NullCond(e, neg) =>
      if (neg) exprCol(e, schema).isNotNull else exprCol(e, schema).isNull
    case CmpCond(l, op, r) =>
      val lc = exprCol(l, schema); val rc = exprCol(r, schema)
      op match {
        case "="  => lc === rc
        case "<>" => lc =!= rc
        case "<"  => lc < rc
        case "<=" => lc <= rc
        case ">"  => lc > rc
        case ">=" => lc >= rc
        case o    => throw new IllegalArgumentException(s"unknown operator $o")
      }
  }

  private def exprCol(e: Expr,
      schema: org.apache.spark.sql.types.StructType): Column = e match {
    case PropRef(v, p)  => propCol(v, p)
    case ColRef(n) =>
      if (carriedScalars.contains(n)) col(n)
      else throw new IllegalArgumentException(
        s"bare '$n' in RETURN must be a WITH-projected column")
    case LabelsOf(v)    => propCol(v, "labels")
    case TypeOf(r)      =>
      if (optRelVars.contains(r)) col(s"__o_${r}_relType") else col(s"$r.relType")
    case Cosine(v, p, q) =>
      graft.functions.cosineSim(propCol(v, p).cast("array<double>"), lit(doubles(q).toArray))
    case PathLength(pv) =>
      if (spVar.contains(pv)) col("__splen")
      else throw new IllegalArgumentException(
        s"length($pv) does not name this query's shortestPath")
    case LongLitE(v) => lit(v)
    case StrLitE(s)  => lit(s)
    case ScalarFn(fn, args) =>
      val a = args.map(exprCol(_, schema))
      fn match {
        case "toLower" => lower(a.head)
        case "toUpper" => upper(a.head)
        case "trim"    => trim(a.head)
        case "replace" => replace(a.head, a(1), a(2))
        case "abs"     => abs(a.head)
        // Cypher sign() is an INTEGER −1/0/1 (Spark signum is double)
        case "sign"    => signum(a.head).cast("long")
        case "toString"  => a.head.cast("string")
        // Neo4j toInteger truncates toward zero — exactly Spark's
        // double→long cast (≡ DuckDB CAST(trunc(x) AS BIGINT))
        case "toInteger" => a.head.cast("long")
        case "toFloat"   => a.head.cast("double")
        case "size" =>
          // Neo4j size: string length, or element count on a list value
          // (e.g. a collected alias) — BIGINT on both engines
          if (staticType(args.head, schema)
                .exists(_.isInstanceOf[org.apache.spark.sql.types.ArrayType]))
            size(a.head).cast("long")
          else length(a.head).cast("long")
        case "substring" =>
          // Neo4j is 0-indexed, Spark/DuckDB substr 1-indexed; the no-len
          // form takes the rest of the string (total length is always an
          // upper bound on the remainder)
          val start = args(1) match {
            case LongLitE(v) => v
            case other => throw new IllegalArgumentException(
              s"substring start must be an integer literal, not $other")
          }
          val len = args.drop(2).headOption.map {
            case LongLitE(v) => v
            case other => throw new IllegalArgumentException(
              s"substring length must be an integer literal, not $other")
          }
          len match {
            case Some(l) => a.head.substr(lit((start + 1).toInt), lit(l.toInt))
            case None    => a.head.substr(lit((start + 1).toInt), length(a.head))
          }
        case o => throw new IllegalArgumentException(s"unknown string function $o")
      }
    case CoalesceE(args) => coalesce(args.map(exprCol(_, schema)): _*)
    case CaseExpr(branches, default) =>
      val chain = branches.tail.foldLeft(
        when(condCol(branches.head._1, schema), exprCol(branches.head._2, schema))) {
        case (w, (c, x)) => w.when(condCol(c, schema), exprCol(x, schema))
      }
      default.fold(chain)(d => chain.otherwise(exprCol(d, schema)))
    case BinOp(op, l, r) =>
      val lc = exprCol(l, schema); val rc = exprCol(r, schema)
      def isStr(e: Expr) = staticType(e, schema)
        .contains(org.apache.spark.sql.types.StringType)
      op match {
        // Cypher `+` CONCATENATES when either operand is a string (a
        // numeric co-operand stringifies, like Neo4j's "a" + 1); Spark's
        // numeric `+` would instead cast the string side and null out
        case "+" if isStr(l) || isStr(r) =>
          concat(lc.cast("string"), rc.cast("string"))
        case "+" => lc + rc
        case "-" => lc - rc
        case "*" => lc * rc
        case "%" => lc % rc
        case "/" =>
          // Cypher/Neo4j: integral ÷ integral truncates toward zero
          // (DuckDB `//`); any fractional operand → double division
          if (isIntegralExpr(l, schema) && isIntegralExpr(r, schema))
            graft.functions.longDiv(lc.cast("long"), rc.cast("long"))
          else lc.cast("double") / rc.cast("double")
        case o => throw new IllegalArgumentException(s"unknown operator $o")
      }
    case other => throw new IllegalArgumentException(s"$other is aggregate-only")
  }

  /** Aggregate over the canonical tuple column `src` (see [[tupleFrame]]). */
  private def aggCol(e: Expr, src: String): Column = e match {
    case CountDistinct(_) => count_distinct(col(src))
    case CountDistinctInParam(_, param) =>
      val ids = longs(param)
      count_distinct(when(col(src).isin(ids: _*), col(src)))
    // canonical sorted distinct list (collect_set drops nulls, matching
    // Cypher's null-skipping collect)
    case CollectDistinct(_, _) => sort_array(collect_set(col(src)))
    // plain collect keeps the bag's duplicates; canonicalized sorted
    // (collect_list also skips nulls, like Neo4j)
    case CollectAll(_, _) => sort_array(collect_list(col(src)))
    case MinMaxProp("min", _, _) => min(col(src))
    case MinMaxProp("max", _, _) => max(col(src))
    case CountStar => count(lit(1))
    case CountVar(_) => count(col(src)) // null-skipping, like Neo4j count(v)
    // count over a property EXPRESSION (null-skipping, like Neo4j's
    // count(v.prop)); the DISTINCT form counts the distinct value set
    case AggFn("count", _, false) => count(col(src))
    case AggFn("count", _, true)  => count_distinct(col(src))
    case AggFn("sum", _, false) => sum(col(src)) // null-skipping, like Neo4j
    case AggFn("avg", _, false) => avg(col(src))
    case AggFn("sum", _, true) => sum_distinct(col(src))
    case AggFn("avg", _, true) => expr(s"avg(DISTINCT `$src`)")
    // Neo4j stDev = sample, stDevP = population; both double, both
    // null-skipping, both run as Spark's native moment aggregates
    case AggFn("stDev", _, false)  => stddev_samp(col(src))
    case AggFn("stDev", _, true)   => expr(s"stddev_samp(DISTINCT `$src`)")
    case AggFn("stDevP", _, false) => stddev_pop(col(src))
    case AggFn("stDevP", _, true)  => expr(s"stddev_pop(DISTINCT `$src`)")
    // exact interpolated percentile (Spark `percentile` ≡ DuckDB
    // quantile_cont ≡ Neo4j percentileCont) — a native sort-based
    // aggregate, never a collected list
    case PercentileFn("percentileCont", _, p) => expr(s"percentile(`$src`, $p)")
    // SQL-standard inverse distribution: first value whose cumulative
    // fraction reaches p — an ACTUAL group value (returned as double,
    // Spark's percentile_disc result type)
    case PercentileFn("percentileDisc", _, p) =>
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY `$src`)")
    case other => throw new IllegalArgumentException(s"$other is not an aggregate")
  }

  private def longs(param: String): Seq[Long] = params(param) match {
    case s: Seq[_] => s.map(x => x.asInstanceOf[Number].longValue())
    case other => throw new IllegalArgumentException(s"param $param: expected id list, got $other")
  }

  private def doubles(param: String): Seq[Double] = params(param) match {
    case s: Seq[_] => s.map(x => x.asInstanceOf[Number].doubleValue())
    case other => throw new IllegalArgumentException(s"param $param: expected vector, got $other")
  }
}

object Planner {
  /** Parse + plan in one step. Accepts UNION-chained queries (a
    * single-part input plans exactly as before). */
  def run(g: PropertyGraph, cypher: String,
          params: Map[String, Any] = Map.empty): DataFrame =
    planUnion(g, Parser.parseUnion(cypher), params)

  /** Plan a UNION query: each part planned independently (fresh binding
    * state), then one `unionByName` chain — Catalyst sees an ordinary
    * Union node, so partial aggregation and pushdown still apply per
    * branch — with a single DISTINCT on top for the non-ALL form (Cypher
    * dedups ACROSS parts, which also absorbs any per-part DISTINCT).
    * Column names must line up in order, like Neo4j. */
  def planUnion(g: PropertyGraph, uq: UnionQuery,
                params: Map[String, Any] = Map.empty): DataFrame = {
    val frames = uq.parts.map(p => new Planner(g, params).plan(p))
    if (frames.length == 1) return frames.head
    // names AND types must line up (like Neo4j): a name-only check lets two
    // same-named columns of different types fall through to unionByName's
    // raw analysis error instead of this dialect-level message
    val sig = frames.head.schema.fields.map(f => (f.name, f.dataType)).toSeq
    frames.tail.foreach { f =>
      val fsig = f.schema.fields.map(x => (x.name, x.dataType)).toSeq
      require(fsig == sig,
        s"all UNION parts must return the same columns (names and types): " +
          s"$sig vs $fsig")
    }
    val unioned = frames.reduce(_.unionByName(_))
    if (uq.all) unioned else unioned.distinct()
  }
}
