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

  def plan(q: CypherQuery): DataFrame = {
    require(q.paths.nonEmpty, "at least one MATCH path")
    // multiple comma-separated paths are cross-joined then filtered (the
    // emitted grammar never uses >1, but the join shape is the same)
    val joined = q.paths.map(planPath(q, _)).reduce(_.crossJoin(_))
    val filtered = q.preds.foldLeft(joined)((df, p) => df.where(predCol(p)))

    val projected =
      if (q.isAggregating) {
        val (aggs, keys) = q.items.partition(i => i.expr match {
          case _: CountDistinct | _: CountDistinctInParam => true
          case _ => false
        })
        val keyCols = keys.map(i => exprCol(i.expr).as(i.name))
        val aggCols = aggs.map(i => aggCol(i.expr).as(i.name))
        if (keyCols.isEmpty) filtered.agg(aggCols.head, aggCols.tail: _*)
        else filtered.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else {
        val p = filtered.select(q.items.map(i => exprCol(i.expr).as(i.name)): _*)
        if (q.distinct) p.distinct() else p
      }

    val ordered = q.orderBy match {
      case Some((ref, desc)) =>
        val c = if (desc) col(ref).desc else col(ref).asc
        projected.orderBy(c)
      case None => projected
    }
    q.limit.fold(ordered)(ordered.limit)
  }

  /** One MATCH path = anchor/label-filtered node frames chained through the
    * bidirected edge view; every node var and rel var becomes a plan alias
    * so RETURN items can reference them. */
  private def planPath(q: CypherQuery, path: MatchPath): DataFrame = {
    val first = nodeFrame(q, path.nodes.head)
    // broadcast the head only when it is genuinely anchored (tiny)
    val head = if (isAnchored(q, path.nodes.head)) broadcast(first) else first

    var df = head
    path.rels.zipWithIndex.foreach { case (r, i) =>
      val rv = r.varName.getOrElse(s"__r$i")
      val e = r.relType.fold(g.bidir)(t => g.bidir.where(col("relType") === t)).as(rv)
      val prev = path.nodes(i).varName
      val next = path.nodes(i + 1)
      val nextFrame = nodeFrame(q, next)
      df =
        if (isAnchored(q, next)) {
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

  private def isAnchored(q: CypherQuery, n: NodePat): Boolean =
    n.anchorValue.isDefined || q.unwinds.exists(u => n.anchorValue.contains(VarRef(u.varName)))

  private def nodeFrame(q: CypherQuery, n: NodePat): DataFrame = {
    val labeled = n.label match {
      case Some("_Entity_") | None => g.nodes
      case Some(l)                 => g.nodes.where(col("label") === l)
    }
    val anchored = (n.anchorProp, n.anchorValue) match {
      case (Some(p), Some(StrLit(v)))  => labeled.where(col(p) === lit(v))
      case (Some(p), Some(LongLit(v))) => labeled.where(col(p) === lit(v))
      case (Some(p), Some(VarRef(u))) =>
        // UNWIND $param AS u MATCH (x {p: u}) — anchor against the param list
        params.get(paramOf(q, u)) match {
          case Some(vs: Seq[_]) => labeled.where(col(p).isin(vs: _*))
          case _ => throw new IllegalArgumentException(s"missing parameter for UNWIND var $u")
        }
      case _ => labeled
    }
    anchored.as(n.varName)
  }

  private def paramOf(q: CypherQuery, unwindVar: String): String =
    q.unwinds.find(_.varName == unwindVar)
      .map(_.param)
      .getOrElse(throw new IllegalArgumentException(s"unbound variable $unwindVar"))

  private def predCol(p: Pred): Column = p match {
    case VarNeq(a, b) => col(s"$a.nodeId") =!= col(s"$b.nodeId")
    case NotIdIn(v, param) =>
      val ids = longs(param)
      !col(s"$v.nodeId").isin(ids: _*)
  }

  private def exprCol(e: Expr): Column = e match {
    case PropRef(v, p)  => col(s"$v.$p")
    case LabelsOf(v)    => col(s"$v.labels")
    case TypeOf(r)      => col(s"$r.relType")
    case Cosine(v, p, q) =>
      graft.functions.cosineSim(col(s"$v.$p").cast("array<double>"), lit(doubles(q).toArray))
    case other => throw new IllegalArgumentException(s"$other is aggregate-only")
  }

  private def aggCol(e: Expr): Column = e match {
    case CountDistinct(v) => count_distinct(col(s"$v.nodeId"))
    case CountDistinctInParam(v, param) =>
      val ids = longs(param)
      count_distinct(when(col(s"$v.nodeId").isin(ids: _*), col(s"$v.nodeId")))
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
  /** Parse + plan in one step. */
  def run(g: PropertyGraph, cypher: String,
          params: Map[String, Any] = Map.empty): DataFrame =
    new Planner(g, params).plan(Parser.parse(cypher))
}
