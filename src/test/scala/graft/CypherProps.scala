package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.cypher.{Ast, Parser}
import Ast._

/** Property: any AST within the emitted grammar survives render → parse
  * intact — the renderer and the hand-rolled recursive-descent parser are
  * exact inverses over the whole dialect (ScalaCheck, SURVEY §5).
  */
object CypherProps extends Properties("cypher") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val label: Gen[Option[String]] =
    Gen.option(Gen.oneOf("Paper", "Author", "_Entity_", "FieldOfStudy"))

  private val anchorStr: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.const(' '), Gen.const('"'), Gen.const('\\'),
    Gen.const('\''), Gen.const('é'))).map(_.mkString)

  private val anchorVal: Gen[(Option[String], Option[AnchorValue])] = Gen.oneOf(
    Gen.const((None, None)),
    anchorStr.map(s => (Some("name"), Some(StrLit(s)))),
    Gen.choose(0L, 999999L).map(v => (Some("nodeId"), Some(LongLit(v)))),
    ident.map(v => (Some("nodeId"), Some(VarRef(v)))))

  private def node(v: String): Gen[NodePat] = for {
    l <- label
    (p, av) <- anchorVal
  } yield NodePat(v, l, p, av)

  private val relTypes: Gen[Seq[String]] = Gen.oneOf(
    Nil, Seq("WRITES"), Seq("CITES"), Seq("WRITES", "CITES"),
    Seq("HAS_TOPIC", "WRITES", "CITES"))

  private def rel(i: Int): Gen[RelPat] = for {
    named <- Gen.oneOf(true, false)
    t <- relTypes
    range <- Gen.option(for {
      lo <- Gen.choose(1, 3); hi <- Gen.choose(lo, 3)
    } yield (lo, hi))
    // var-length rels cannot bind a variable (parser enforces)
  } yield RelPat(if (named && range.isEmpty) Some(s"r$i") else None, t, range)

  private val path: Gen[MatchPath] = for {
    n <- Gen.choose(1, 3)
    nodes <- Gen.sequence[Seq[NodePat], NodePat]((1 to n).map(i => node(s"x$i")))
    rels <- Gen.sequence[Seq[RelPat], RelPat]((1 until n).map(rel))
  } yield MatchPath(nodes, rels)

  private val item: Gen[RetItem] = for {
    e <- Gen.oneOf[Expr](
      PropRef("x1", "name"), LabelsOf("x1"), TypeOf("r1"),
      CountDistinct("x1"), CountDistinctInParam("x1", "ids"),
      CollectDistinct("x1", "name"),
      MinMaxProp("min", "x1", "name"), MinMaxProp("max", "x1", "name"),
      CountStar, CountVar("x1"),
      Cosine("x1", "nameEmbedding", "qEmb"))
    a <- Gen.option(ident)
  } yield RetItem(e, a)

  private val optionalClause: Gen[OptionalMatch] = for {
    p <- path
    preds <- Gen.someOf(Seq(VarNeq("x1", "x2"), NotIdIn("x1", "found")))
  } yield OptionalMatch(p, preds.toSeq)

  private val existsPred: Gen[Pred] = for {
    p <- path
    neg <- Gen.oneOf(true, false)
  } yield ExistsPat(p, neg)

  private val query: Gen[CypherQuery] = for {
    nUnwind <- Gen.choose(0, 2)
    unwinds <- Gen.sequence[Seq[Unwind], Unwind](
      (1 to nUnwind).map(i => ident.map(p => Unwind(p, s"u$i"))))
    p <- path
    scalarPreds <- Gen.someOf(Seq(VarNeq("x1", "x2"), NotIdIn("x1", "found")))
    exPreds <- Gen.frequency((2, Gen.const(Nil)),
      (1, existsPred.map(Seq(_))))
    preds = scalarPreds.toSeq ++ exPreds
    distinct <- Gen.oneOf(true, false)
    nItems <- Gen.choose(1, 3)
    items <- Gen.listOfN(nItems, item)
    order <- Gen.frequency(
      (2, Gen.const(Seq.empty[(String, Boolean)])),
      (1, Gen.const(Seq(("similarity", true)))),
      (1, Gen.const(Seq(("similarity", true), ("name", false)))))
    limit <- Gen.option(Gen.choose(1, 100))
    nOpt <- Gen.frequency((2, Gen.const(0)), (1, Gen.choose(1, 2)))
    optionals <- Gen.listOfN(nOpt, optionalClause)
  } yield CypherQuery(unwinds, Seq(p), preds, distinct, items, order,
    limit, Nil, optionals)

  property("render/parse round-trip") = forAll(query) { q =>
    val rendered = q.render
    val reparsed = Parser.parse(rendered)
    Prop(reparsed == q) :| s"rendered: $rendered\nreparsed: $reparsed"
  }

  // UNION chains render with the uniform separator, so the round trip
  // must preserve part count, part contents, and ALL-ness. A single-part
  // union renders with no separator, so it reparses with all = false —
  // the generator pins all = false there (the canonical form).
  private val unionQuery: Gen[UnionQuery] = for {
    n <- Gen.choose(1, 3)
    parts <- Gen.listOfN(n, query)
    all <- if (n == 1) Gen.const(false) else Gen.oneOf(true, false)
  } yield UnionQuery(parts, all)

  property("UNION render/parse round-trip") = forAll(unionQuery) { uq =>
    val rendered = uq.render
    val reparsed = Parser.parseUnion(rendered)
    Prop(reparsed == uq) :| s"rendered: $rendered\nreparsed: $reparsed"
  }

  // shortestPath queries render with an always-explicit *lo..hi, so any
  // in-grammar clause must survive the round trip too
  private val shortestQuery: Gen[CypherQuery] = for {
    a <- node("x1")
    b <- node("x2")
    t <- relTypes
    lo <- Gen.choose(0, 1)
    hi <- Gen.choose(math.max(lo, 1), 8)
    preds <- Gen.someOf(Seq(VarNeq("x1", "x2"), NotIdIn("x2", "found")))
    distinct <- Gen.oneOf(true, false)
    nItems <- Gen.choose(0, 2)
    extra <- Gen.listOfN(nItems, item)
    alias <- Gen.option(ident)
    limit <- Gen.option(Gen.choose(1, 100))
  } yield CypherQuery(Nil, Nil, preds.toSeq, distinct,
    RetItem(PathLength("p"), alias) +: extra, Nil, limit, Nil, Nil,
    Some(ShortestPathClause("p",
      MatchPath(Seq(a, b), Seq(RelPat(None, t, Some((lo, hi))))))))

  property("shortestPath render/parse round-trip") = forAll(shortestQuery) { q =>
    val rendered = q.render
    val reparsed = Parser.parse(rendered)
    Prop(reparsed == q) :| s"rendered: $rendered\nreparsed: $reparsed"
  }
}
