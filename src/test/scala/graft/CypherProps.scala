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
    ident.map(v => (Some("nodeId"), Some(VarRef(v)))),
    // map-parameter anchors: {name: $param}
    ident.map(n => (Some("name"), Some(ParamRef(n)))))

  private def node(v: String): Gen[NodePat] = for {
    l <- label
    (p, av) <- anchorVal
    // multi-property map anchors (extras only exist under a primary pair)
    extras <- if (p.isEmpty) Gen.const(Seq.empty[(String, AnchorValue)])
              else Gen.frequency(
                (3, Gen.const(Seq.empty[(String, AnchorValue)])),
                (1, Gen.oneOf(
                  anchorStr.map(s => Seq("abstract" -> (StrLit(s): AnchorValue))),
                  Gen.choose(0L, 99L).map(x => Seq("nodeId" -> (LongLit(x): AnchorValue))),
                  ident.map(nm => Seq("name" -> (ParamRef(nm): AnchorValue))))))
  } yield NodePat(v, l, p, av, extras)

  private val relTypes: Gen[Seq[String]] = Gen.oneOf(
    Nil, Seq("WRITES"), Seq("CITES"), Seq("WRITES", "CITES"),
    Seq("HAS_TOPIC", "WRITES", "CITES"))

  private def rel(i: Int): Gen[RelPat] = for {
    named <- Gen.oneOf(true, false)
    t <- relTypes
    range <- Gen.option(for {
      lo <- Gen.choose(1, 3); hi <- Gen.choose(lo, 3)
    } yield (lo, hi))
    dir <- Gen.frequency((2, Gen.const(0)), (1, Gen.const(1)), (1, Gen.const(-1)))
    // var-length rels cannot bind a variable (parser enforces)
  } yield RelPat(if (named && range.isEmpty) Some(s"r$i") else None, t, range, dir)

  private val path: Gen[MatchPath] = for {
    n <- Gen.choose(1, 3)
    nodes <- Gen.sequence[Seq[NodePat], NodePat]((1 to n).map(i => node(s"x$i")))
    rels <- Gen.sequence[Seq[RelPat], RelPat]((1 until n).map(rel))
  } yield MatchPath(nodes, rels)

  // arithmetic expression tree of bounded depth (numeric leaves only —
  // aggregates may not nest inside arithmetic, per the grammar)
  private val numLeaf: Gen[Expr] = Gen.oneOf(
    Gen.const(PropRef("x1", "nodeId")),
    Gen.choose(-99L, 99L).map(LongLitE(_)))
  private def arith(depth: Int): Gen[Expr] =
    if (depth <= 0) numLeaf
    else Gen.frequency(
      (2, numLeaf),
      (3, for {
        op <- Gen.oneOf("+", "-", "*", "/", "%")
        l <- arith(depth - 1)
        r <- arith(depth - 1)
      } yield BinOp(op, l, r)))

  private val strLeaf: Gen[Expr] = anchorStr.map(StrLitE(_))

  private val condGen: Gen[Cond] = Gen.oneOf(
    for {
      l <- arith(1)
      op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
      r <- arith(1)
    } yield CmpCond(l, op, r),
    Gen.oneOf(true, false).map(neg => NullCond(PropRef("x1", "name"), neg)))

  private val caseGen: Gen[Expr] = for {
    n <- Gen.choose(1, 2)
    bs <- Gen.listOfN(n, for {
      c <- condGen
      e <- Gen.oneOf(arith(1), strLeaf)
    } yield (c, e))
    d <- Gen.option(Gen.oneOf(arith(1), strLeaf))
  } yield CaseExpr(bs, d)

  private val coalesceGen: Gen[Expr] = for {
    n <- Gen.choose(2, 3)
    args <- Gen.listOfN(n, Gen.oneOf(Gen.const(PropRef("x1", "name")), strLeaf))
  } yield CoalesceE(args)

  private val aggFnGen: Gen[Expr] = for {
    fn <- Gen.oneOf("sum", "avg", "stDev", "stDevP")
    d <- Gen.oneOf(true, false)
    a <- arith(1)
  } yield AggFn(fn, a, d)

  private val percentileGen: Gen[Expr] = for {
    fn <- Gen.oneOf("percentileCont", "percentileDisc")
    p <- Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)
  } yield PercentileFn(fn, PropRef("x1", "nodeId"), p)

  // string-function expressions whose RENDERED form re-enters the parser
  // through the function-headed atom branch
  private val strFnGen: Gen[Expr] = Gen.oneOf(
    Gen.oneOf("toLower", "toUpper", "trim")
      .map(fn => ScalarFn(fn, Seq(PropRef("x1", "name")))),
    Gen.const(ScalarFn("size", Seq(PropRef("x1", "name")))),
    for {
      start <- Gen.choose(0L, 5L)
      len <- Gen.option(Gen.choose(0L, 9L))
    } yield ScalarFn("substring",
      PropRef("x1", "name") +: LongLitE(start) +: len.map(LongLitE(_)).toSeq),
    anchorStr.map(f => ScalarFn("replace",
      Seq(PropRef("x1", "name"), StrLitE(f), StrLitE("_")))))

  // string predicates: the LEFT side must re-parse through either the
  // ref-headed or function-headed pred branch (a literal-headed left
  // side is out of grammar)
  private val strPredGen: Gen[Pred] = for {
    l <- Gen.oneOf(Gen.const[Expr](PropRef("x1", "name")),
      Gen.const[Expr](ColRef("x1")),
      Gen.oneOf("toLower", "toUpper").map(fn => ScalarFn(fn, Seq(PropRef("x1", "name")))))
    op <- Gen.oneOf("CONTAINS", "STARTS WITH", "ENDS WITH", "=~")
    r <- Gen.oneOf(anchorStr.map(StrLitE(_)), Gen.const(PropRef("x2", "name")))
  } yield StrPred(l, op, r)

  private val exprCmpGen: Gen[Pred] = for {
    fn <- Gen.oneOf("size", "toLower")
    op <- Gen.oneOf("=", "<>", "<", "<=", ">", ">=")
    r <- if (fn == "size") arith(1) else anchorStr.map(StrLitE(_): Expr)
  } yield ExprCmp(ScalarFn(fn, Seq(PropRef("x1", "name"))), op, r)

  private val degreeGen: Gen[Expr] = for {
    t <- relTypes
    dir <- Gen.frequency((2, Gen.const(0)), (1, Gen.const(1)), (1, Gen.const(-1)))
    fl <- Gen.option(Gen.oneOf("Paper", "Author", "_Entity_"))
  } yield DegreeOf("x1", t, dir, fl)

  // round-13 list-expression surface: every rendered form must re-enter
  // the parser through the bracket / postfix / function branches it came
  // from (collect/count over a BARE v.prop are owned by the historical
  // nodes, so the general-AggFn generators always wrap in a function)
  private val listBase: Gen[Expr] = Gen.oneOf(
    Gen.const(ColRef("xs")),
    Gen.const(ScalarFn("split", Seq(PropRef("x1", "name"), StrLitE("|")))),
    Gen.listOfN(3, Gen.choose(-9L, 9L).map(LongLitE(_): Expr)).map(ListLit(_)))
  private val listExprGen: Gen[Expr] = Gen.oneOf(
    listBase.flatMap(b => Gen.choose(-3L, 3L).map(i => ListIndex(b, i))),
    for {
      b <- listBase
      fr <- Gen.option(Gen.choose(-3L, 3L))
      to <- Gen.option(Gen.choose(-3L, 3L))
    } yield ListSlice(b, fr, to),
    Gen.oneOf("head", "last", "tail", "reverse")
      .flatMap(fn => listBase.map(b => ScalarFn(fn, Seq(b)))),
    for {
      lo <- Gen.choose(0L, 5L); hi <- Gen.choose(5L, 9L)
      st <- Gen.oneOf(1L, 2L)
    } yield ScalarFn("range", Seq(LongLitE(lo), LongLitE(hi), LongLitE(st))),
    listBase.map(b => ReduceExpr("acc", LongLitE(0L), "el", b,
      BinOp("+", ColRef("acc"), ScalarFn("size", Seq(ColRef("el")))))),
    for {
      b <- listBase
      c <- Gen.option(Gen.oneOf[Cond](
        StrCond(ColRef("el"), "CONTAINS", StrLitE("a")),
        CmpCond(ScalarFn("size", Seq(ColRef("el"))), ">", LongLitE(2L))))
      pj <- Gen.option(Gen.const[Expr](ScalarFn("toUpper", Seq(ColRef("el")))))
      if c.nonEmpty || pj.nonEmpty
    } yield ListComp("el", b, c, pj),
    Gen.const(KeysOf("x1")),
    // round-14 entity-projection surface: properties(), map projection,
    // dynamic [key] access (string keys only — numeric spellings are
    // owned by the list index)
    Gen.const(PropsOf("x1")),
    Gen.someOf(Seq("name", "abstract", "nodeId")).suchThat(_.nonEmpty)
      .map(fs => MapProj("x1", fs.toSeq)),
    Gen.oneOf[Expr](StrLitE("name"), ColRef("k"),
      ScalarFn("toLower", Seq(StrLitE("NAME"))))
      .map(k => DynProp("x1", k)),
    ident.map(nm => BinOp("+", PropRef("x1", "name"), ParamE(nm))),
    // round-15 surface: map literals (nesting), double literals, round()
    for {
      k1 <- ident; k2 <- ident.suchThat(_ != k1)
      v1 <- Gen.oneOf[Expr](PropRef("x1", "name"), LongLitE(7L))
    } yield MapLitE(Seq(k1 -> v1,
      k2 -> MapLitE(Seq("z" -> (StrLitE("s"): Expr))))),
    // 1.0E-5 / 1.0E7: Double.toString spells these scientifically, which
    // numLit cannot read — the plain-decimal render must round-trip them
    Gen.oneOf(0.5, 2.0, -3.25, 99.9, 1.0e-5, 1.0e7).map(DblLitE(_)),
    Gen.const(ScalarFn("round",
      Seq(BinOp("*", PropRef("x1", "nodeId"), DblLitE(0.5))))),
    for { // ^ chains: right-assoc render/parse
      a <- Gen.choose(1L, 5L); b <- Gen.choose(1L, 3L); c <- Gen.choose(1L, 3L)
      e <- Gen.oneOf[Expr](
        BinOp("^", LongLitE(a), BinOp("^", LongLitE(b), LongLitE(c))),
        BinOp("^", BinOp("^", LongLitE(a), LongLitE(b)), LongLitE(c)),
        BinOp("*", BinOp("^", LongLitE(a), LongLitE(b)), LongLitE(c)))
    } yield e,
    Gen.const(CoalesceE(Seq(PropRef("x1", "name"), NullLitE, StrLitE("?")))),
    // round-16 surface: the transcendental/trig family across its three
    // arities (0: pi()/e(); 1: sin/ln/haversin; 2: atan2) and isEmpty
    Gen.oneOf("ln", "exp", "log10", "sin", "cos", "tan", "cot", "asin",
        "acos", "atan", "degrees", "radians", "haversin")
      .map(f => ScalarFn(f,
        Seq(BinOp("*", PropRef("x1", "nodeId"), DblLitE(0.25))))),
    Gen.const(ScalarFn("atan2",
      Seq(PropRef("x1", "nodeId"), DblLitE(2.0)))),
    Gen.oneOf("pi", "e").map(f => ScalarFn(f, Seq.empty)),
    Gen.const(ScalarFn("isEmpty", Seq(PropRef("x1", "name")))))

  private val patternCompGen: Gen[Expr] = for {
    p <- path.suchThat(_.rels.nonEmpty).map(_.copy(name = None))
    preds <- Gen.someOf(Seq[Pred](
      PropCmp("x2", "nodeId", ">", LongLit(3L)),
      StrPred(PropRef("x2", "name"), "CONTAINS", StrLitE("a"))))
    proj <- Gen.oneOf[Expr](PropRef("x2", "name"),
      ScalarFn("toUpper", Seq(PropRef("x2", "name"))))
  } yield PatternComp(p, preds.toSeq, proj)

  private val generalAggGen: Gen[Expr] = for {
    fn <- Gen.oneOf("count", "collect")
    d <- Gen.oneOf(true, false)
    a <- Gen.oneOf[Expr](ScalarFn("toUpper", Seq(PropRef("x1", "name"))),
      ScalarFn("size", Seq(PropRef("x1", "name"))))
  } yield AggFn(fn, a, d)

  private val item: Gen[RetItem] = for {
    e <- Gen.frequency(
      (8, Gen.oneOf[Expr](
        PropRef("x1", "name"), LabelsOf("x1"), TypeOf("r1"),
        CountDistinct("x1"), CountDistinctInParam("x1", "ids"),
        CollectDistinct("x1", "name"),
        MinMaxProp("min", "x1", "name"), MinMaxProp("max", "x1", "name"),
        CountStar, CountVar("x1"),
        Cosine("x1", "nameEmbedding", "qEmb"))),
      (3, arith(2)),
      (1, caseGen),
      (1, coalesceGen),
      (1, aggFnGen),
      (1, percentileGen),
      (1, Gen.const[Expr](CollectAll("x1", "name"))),
      (1, strFnGen),
      (1, degreeGen),
      (2, listExprGen),
      (1, patternCompGen),
      (1, generalAggGen),
      // string concatenation: + with a string side (render must reparse
      // through the same left-associative + chain)
      (1, anchorStr.map(s =>
        BinOp("+", BinOp("+", PropRef("x1", "name"), StrLitE(s)),
          PropRef("x1", "nodeId")): Expr)))
    a <- Gen.option(ident)
  } yield RetItem(e, a)

  private val optionalClause: Gen[OptionalMatch] = for {
    p <- path
    preds <- Gen.someOf(Seq(VarNeq("x1", "x2"), NotIdIn("x1", "found")))
  } yield OptionalMatch(p, preds.toSeq)

  private val existsPred: Gen[Pred] = for {
    p <- path
    neg <- Gen.oneOf(true, false)
    inner <- Gen.someOf(Seq[Pred](
      PropCmp("x1", "nodeId", ">", LongLit(3L)),
      StrPred(PropRef("x1", "name"), "CONTAINS", StrLitE("a")),
      IsNullPred(PropRef("x1", "name"), negated = false)))
  } yield ExistsPat(p, neg, inner.toSeq)

  // EXISTS nested under OR/NOT — the marker-join form must round-trip
  // through the parenthesized boolean render
  private val nestedExistsPred: Gen[Pred] = for {
    ep <- existsPred
    other <- Gen.oneOf[Pred](PropCmp("x1", "nodeId", "<", LongLit(9L)),
      LabelPred("x1", "Paper", negated = false))
    shape <- Gen.oneOf(
      OrPred(ep, other), OrPred(other, ep), NotPred(OrPred(ep, other)))
  } yield shape

  // restricted CALL subquery: aliased scalar items, optional per-key
  // top-k trim (parse-only here — binding checks are the planner's)
  private val callGen: Gen[CallSubquery] = for {
    p <- path.suchThat(_.nodes.length >= 2).map(_.copy(name = None))
    agg <- Gen.oneOf(true, false)
    its <- if (agg) Gen.const(Seq(RetItem(CountVar("x2"), Some("np"))))
           else Gen.const(Seq(RetItem(PropRef("x2", "name"), Some("top"))))
    ord <- if (agg) Gen.const(Seq.empty[(String, Boolean)])
           else Gen.oneOf(Seq.empty[(String, Boolean)],
             Seq(("x2.name", true)), Seq(("top", false)))
    lim <- Gen.option(Gen.oneOf(
      Gen.choose(1, 5).map(CountLit(_): CountVal),
      ident.map(CountParam(_): CountVal)))
    preds <- Gen.someOf(Seq[Pred](PropCmp("x2", "nodeId", ">", LongLit(2L))))
  } yield CallSubquery(Seq("x1"), Seq(p), preds.toSeq, its, ord, lim)

  private val query: Gen[CypherQuery] = for {
    nUnwind <- Gen.choose(0, 2)
    unwinds <- Gen.sequence[Seq[Unwind], Unwind](
      (1 to nUnwind).map(i => Gen.oneOf(
        ident.map(p => Unwind(p, s"u$i")),
        // carried-list form: UNWIND xs AS u<i>
        ident.map(src => Unwind(src, s"u$i", None, carried = true)),
        // literal-list form (homogeneous, like the parser's litList)
        Gen.oneOf(
          Gen.nonEmptyListOf(anchorStr.map(StrLit(_): AnchorValue)),
          Gen.nonEmptyListOf(Gen.choose(0L, 99L).map(LongLit(_): AnchorValue)))
          .map(ls => Unwind("", s"u$i", Some(ls.take(3)))))))
    p <- path
    scalarPreds <- Gen.someOf(Seq[Pred](
      VarNeq("x1", "x2"), NotIdIn("x1", "found"),
      PropCmp("x1", "nodeId", ">=", LongLit(5L)),
      PropCmp("x1", "name", "=", ParamRef("who")),
      ColCmp("x1", ">=", ParamRef("minId")),
      InParam(PropRef("x1", "name"), "names", negated = false),
      InParam(ColRef("x1"), "ids", negated = true),
      IsNullPred(PropRef("x1", "name"), negated = true),
      InList(PropRef("x1", "name"), Seq(StrLit("a\"b"), StrLit("c")),
        negated = false),
      OrPred(PropCmp("x1", "nodeId", "<", LongLit(9L)),
        NotPred(IsNullPred(ColRef("x1"), negated = false))),
      NotPred(AndPred(PropCmp("x1", "nodeId", "=", LongLit(1L)),
        InList(PropRef("x1", "nodeId"), Seq(LongLit(1L), LongLit(-2L)),
          negated = true))),
      LabelPred("x1", "Paper", negated = false),
      LabelPred("x2", "Author", negated = true),
      // round 13: carried-list membership, pair-dedup comparison,
      // exists() sugar renders as IS NOT NULL (IsNullPred owns the text)
      InCarried(PropRef("x1", "name"), "mitNames", negated = false),
      InCarried(ColRef("x1"), "ids", negated = true),
      ExprCmp(PropRef("x1", "nodeId"), "<", PropRef("x2", "nodeId")),
      ExprCmp(BinOp("%", PropRef("x1", "nodeId"), LongLitE(2L)), "=",
        LongLitE(0L)),
      // round 14: list quantifiers (incl. NOT composition)
      ListQuantPred("any", "t", KeysOf("x1"),
        StrCond(ColRef("t"), "CONTAINS", StrLitE("a"))),
      ListQuantPred("all", "t", LabelsOf("x1"),
        CmpCond(ScalarFn("size", Seq(ColRef("t"))), ">", LongLitE(2L))),
      NotPred(ListQuantPred("none", "t", KeysOf("x2"),
        StrCond(ColRef("t"), "STARTS WITH", StrLitE("n")))),
      ListQuantPred("single", "t", LabelsOf("x2"),
        CmpCond(ColRef("t"), "=", StrLitE("_Entity_")))))
    strPreds <- Gen.frequency((2, Gen.const(Seq.empty[Pred])),
      (1, strPredGen.map(Seq(_))), (1, exprCmpGen.map(Seq(_))))
    exPreds <- Gen.frequency((2, Gen.const(Nil)),
      (1, existsPred.map(Seq(_))),
      (1, nestedExistsPred.map(Seq(_))))
    preds = scalarPreds.toSeq ++ strPreds ++ exPreds
    distinct <- Gen.oneOf(true, false)
    nItems <- Gen.choose(1, 3)
    items <- Gen.listOfN(nItems, item)
    order <- Gen.frequency(
      (2, Gen.const(Seq.empty[(String, Boolean)])),
      (1, Gen.const(Seq(("similarity", true)))),
      (1, Gen.const(Seq(("similarity", true), ("name", false)))))
    limit <- Gen.option(Gen.oneOf(
      Gen.choose(1, 100).map(CountLit(_): CountVal),
      ident.map(CountParam(_): CountVal)))
    nOpt <- Gen.frequency((2, Gen.const(0)), (1, Gen.choose(1, 2)))
    optionals <- Gen.listOfN(nOpt, optionalClause)
    calls <- Gen.frequency((3, Gen.const(Seq.empty[CallSubquery])),
      (1, callGen.map(Seq(_))))
  } yield CypherQuery(unwinds, Seq(p), preds, distinct, items, order,
    limit, Nil, optionals, calls = calls)

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
    limit <- Gen.option(Gen.oneOf(
      Gen.choose(1, 100).map(CountLit(_): CountVal),
      ident.map(CountParam(_): CountVal)))
  } yield CypherQuery(Nil, Nil, preds.toSeq, distinct,
    RetItem(PathLength("p"), alias) +: extra, Nil, limit, Nil, Nil,
    Some(ShortestPathClause("p",
      MatchPath(Seq(a, b), Seq(RelPat(None, t, Some((lo, hi))))))))

  property("shortestPath render/parse round-trip") = forAll(shortestQuery) { q =>
    val rendered = q.render
    val reparsed = Parser.parse(rendered)
    Prop(reparsed == q) :| s"rendered: $rendered\nreparsed: $reparsed"
  }

  // named paths render as `MATCH p = (…)`; nodes(p)/relationships(p)
  // project them — the provenance surface must survive the round trip
  private val namedPathQuery: Gen[CypherQuery] = for {
    p <- path
    nm <- Gen.oneOf("p", "walk0")
    distinct <- Gen.oneOf(true, false)
    extra <- Gen.listOfN(1, item)
    items = Seq(RetItem(PathNodes(nm), Some("ns")),
      RetItem(PathRels(nm), Some("rs"))) ++ extra
    limit <- Gen.option(Gen.oneOf(
      Gen.choose(1, 100).map(CountLit(_): CountVal),
      ident.map(CountParam(_): CountVal)))
  } yield CypherQuery(Nil, Seq(p.copy(name = Some(nm))), Nil, distinct,
    items, Nil, limit)

  property("named-path render/parse round-trip") = forAll(namedPathQuery) { q =>
    val rendered = q.render
    val reparsed = Parser.parse(rendered)
    Prop(reparsed == q) :| s"rendered: $rendered\nreparsed: $reparsed"
  }

  // the restricted MERGE clause is its own top-level form; values are
  // full scalar expressions since round 14 — literals, $params, the
  // node's own properties, and arithmetic over them
  private def setItemGen(pr: String): Gen[SetItem] = Gen.oneOf(
    anchorStr.map(s => SetItem("n", pr, StrLitE(s))),
    Gen.choose(-99L, 99L).map(v => SetItem("n", pr, LongLitE(v))),
    Gen.identifier.map(nm => SetItem("n", pr, ParamE(nm.take(8)))),
    Gen.oneOf("name", "abstract").map(p2 =>
      SetItem("n", pr, PropRef("n", p2))),
    Gen.choose(1L, 9L).map(k =>
      SetItem("n", pr, BinOp("+", PropRef("n", "nodeId"), LongLitE(k)))))

  private def setItems(props: Seq[String]): Gen[Seq[SetItem]] =
    Gen.choose(0, props.length).flatMap(n =>
      Gen.sequence[Seq[SetItem], SetItem](props.take(n).map(setItemGen)))

  private val mergeGen: Gen[MergeQuery] = for {
    l <- Gen.oneOf("Paper", "Author")
    id <- Gen.choose(0L, 999999L)
    oc <- setItems(Seq("name", "abstract"))
    om <- setItems(Seq("name", "abstract"))
    st <- setItems(Seq("abstract"))
  } yield MergeQuery(NodePat("n", Some(l), Some("nodeId"), Some(LongLit(id))),
    oc, om, st)

  property("MERGE render/parseMerge round-trip") = forAll(mergeGen) { mq =>
    val rendered = mq.render
    val reparsed = Parser.parseMerge(rendered)
    Prop(reparsed == mq) :| s"rendered: $rendered\nreparsed: $reparsed"
  }

  // round-14 bulk mutation forms (the loader's two statements + FOREACH)
  private def bulkRowSetItems(rowVar: String): Gen[Seq[SetItem]] =
    Gen.choose(1, 2).flatMap(n =>
      Gen.sequence[Seq[SetItem], SetItem](
        Seq("name", "abstract").take(n).map(pr => Gen.oneOf(
          Gen.oneOf("nm", "ab").map(f => SetItem("n", pr, PropRef(rowVar, f))),
          anchorStr.map(s => SetItem("n", pr, StrLitE(s))),
          Gen.const(SetItem("n", pr,
            BinOp("+", PropRef(rowVar, "nm"), StrLitE("!"))))))))

  private val bulkUpsertGen: Gen[BulkUpsertQuery] = for {
    l <- Gen.oneOf("Paper", "Author")
    create <- Gen.oneOf(true, false)
    fe <- Gen.oneOf(true, false)
    st <- bulkRowSetItems("r")
    oc <- if (create) Gen.const(Seq.empty[SetItem]) else bulkRowSetItems("r")
    om <- if (create) Gen.const(Seq.empty[SetItem]) else bulkRowSetItems("r")
  } yield BulkUpsertQuery("rows", "r",
    NodePat("n", Some(l), Some("nodeId"), None), "id", oc, om, st, create, fe)

  property("bulk upsert render/parseBulkUpsert round-trip") =
    forAll(bulkUpsertGen) { bq =>
      val rendered = bq.render
      val reparsed = Parser.parseBulkUpsert(rendered)
      Prop(reparsed == bq) :| s"rendered: $rendered\nreparsed: $reparsed"
    }

  private val bulkRelGen: Gen[BulkRelQuery] = for {
    l1 <- Gen.oneOf(Some("Author"), Some("_Entity_"), None)
    l2 <- Gen.oneOf(Some("Paper"), None)
    t <- Gen.oneOf("WRITES", "CITES")
    merge <- Gen.oneOf(true, false)
    dir <- if (merge) Gen.oneOf(0, 1, -1) else Gen.oneOf(1, -1)
  } yield BulkRelQuery("pairs", "pr",
    NodePat("src", l1, Some("nodeId"), None),
    NodePat("tgt", l2, Some("nodeId"), None), t, dir, merge)

  property("bulk rel render/parseBulkRel round-trip") =
    forAll(bulkRelGen) { bq =>
      val rendered = bq.render
      val reparsed = Parser.parseBulkRel(rendered)
      Prop(reparsed == bq) :| s"rendered: $rendered\nreparsed: $reparsed"
    }

  // round-15 standalone SET/REMOVE incl. label mutation and += map-merge
  private val updateGen: Gen[UpdateQuery] = for {
    l <- Gen.oneOf("Paper", "Author")
    isSet <- Gen.oneOf(true, false)
    plus <- if (isSet) Gen.option(Gen.const("props"))
            else Gen.const(None)
    labels <- Gen.someOf(Seq("Flagged", "Hot")).map(_.toSeq)
    sets <- if (isSet) Gen.someOf(Seq(
      UpdateSet("n", "name", StrLitE("x")),
      UpdateSet("n", "abstract",
        BinOp("+", PropRef("n", "name"), StrLitE("!"))))).map(_.toSeq)
      else Gen.const(Seq.empty[UpdateSet])
    removes <- if (isSet) Gen.const(Seq.empty[(String, String)])
      else Gen.someOf(Seq("n" -> "abstract", "n" -> "name")).map(_.toSeq)
    if (isSet && (plus.nonEmpty || labels.nonEmpty || sets.nonEmpty)) ||
      (!isSet && (labels.nonEmpty || removes.nonEmpty))
  } yield
    if (isSet)
      UpdateQuery(NodePat("n", Some(l), None, None), Nil, sets, Nil,
        plus, labels)
    else
      UpdateQuery(NodePat("n", Some(l), None, None), Nil, Nil, removes,
        None, Nil, labels)

  property("SET/REMOVE render/parseMutation round-trip") =
    forAll(updateGen) { uq =>
      val rendered = uq.render
      val reparsed = Parser.parseMutation(rendered)
      Prop(reparsed == Left(uq)) :| s"rendered: $rendered\nreparsed: $reparsed"
    }
}
