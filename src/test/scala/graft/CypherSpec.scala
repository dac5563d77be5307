package graft

import graft.cypher.{Ast, Parser, Planner}
import org.apache.spark.sql.functions.col

/** Mini-Cypher parser + planner over the micro graph, fed the reference's
  * actual emitted query shapes (retrieval/path_retriever.py:4-40,
  * retrieval/retriever.py:19-21,49-60). Expected values hand-derived — they
  * agree with PatternsSpec where the queries overlap.
  */
class CypherSpec extends SparkSpec {
  private lazy val g = MicroGraph(spark)

  test("parser: concrete 2-hop template round-trips structurally") {
    val q = Parser.parse(
      """MATCH (x1:Institution {name: "MIT"})-[r1:AFFILIATED_WITH]-(x2:Author)-[r2:WRITES]-(x3:Paper) RETURN DISTINCT x3.name AS name""")
    assert(q.paths.head.nodes.map(_.varName) === Seq("x1", "x2", "x3"))
    assert(q.paths.head.rels.flatMap(_.relTypes) === Seq("AFFILIATED_WITH", "WRITES"))
    assert(q.distinct)
    assert(q.items.head.name === "name")
  }

  test("parser rejects out-of-grammar input") {
    // a relationship cannot point both ways (directed forms ARE supported)
    intercept[Parser.ParseError](Parser.parse("MATCH (a)<-[r]->(b) RETURN a.name"))
    intercept[Parser.ParseError](Parser.parse("MATCH (a)-[r]-(b)-[s]-(c)-[t]-(d) RETURN a.name"))
    intercept[Parser.ParseError](Parser.parse("MATCH (a) RETURN a.name WHERE"))
  }

  test("J5 template: concrete typed 2-hop via parser+planner") {
    val names = Planner.run(g,
      """MATCH (x1:Institution {name: "MIT"})-[r1:AFFILIATED_WITH]-(x2:Author)-[r2:WRITES]-(x3:Paper) RETURN DISTINCT x3.name AS name""")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("P-alpha", "P-beta"))
  }

  test("A1 path-schema query: UNWIND + labels()/type() + count(DISTINCT)") {
    val rows = Planner.run(g,
      """UNWIND $src_names AS srcName
        |MATCH (src {name: srcName})-[r]-(tgt)
        |RETURN labels(src) AS labels1, src.name AS name1, type(r) AS type1,
        |       labels(tgt) AS labels2, count(DISTINCT tgt) AS totalCnt""".stripMargin,
      Map("src_names" -> Seq("P-gamma")))
      .collect()
      .map(r => (r.getString(2), r.getSeq[String](3).head, r.getLong(4)))
      .toSet
    assert(rows === Set(
      ("WRITES", "Author", 1L),
      ("HAS_TOPIC", "FieldOfStudy", 1L),
      ("CITES", "Paper", 2L)))
  }

  test("2-hop schema query with WHERE tgt <> src1 and trail semantics") {
    val cnt = Planner.run(g,
      """UNWIND $src_names AS srcName1
        |MATCH (src1 {name: srcName1})-[r1]-(var)-[r2]-(tgt)
        |WHERE tgt <> src1
        |RETURN count(DISTINCT tgt) AS totalCnt""".stripMargin,
      Map("src_names" -> Seq("Alice")))
      .collect().head.getLong(0)
    // distinct two-hop targets from Alice (PatternsSpec J3): {Bob, 30, 22}
    assert(cnt === 3L)
  }

  test("A2 supervision: size([t IN collect(DISTINCT tgt) WHERE ... | t])") {
    val row = Planner.run(g,
      """UNWIND $src_names AS srcName
        |MATCH (src:Institution {name: srcName})-[r]-(tgt)
        |RETURN type(r) AS type1, count(DISTINCT tgt) AS totalCnt,
        |       size([t IN collect(DISTINCT tgt) WHERE t.nodeId IN $tgt_ids | t]) AS correctCnt"""
        .stripMargin,
      Map("src_names" -> Seq("MIT"), "tgt_ids" -> Seq(10L, 99L)))
      .collect().head
    assert((row.getString(0), row.getLong(1), row.getLong(2)) === (("AFFILIATED_WITH", 2L, 1L)))
  }

  test("J7 id lookup with anti-membership (NOT ... IN)") {
    val names = Planner.run(g,
      """UNWIND $answerIds AS nodeId
        |MATCH (x:_Entity_ {nodeId: nodeId})-[r]-(y)
        |WHERE NOT y.nodeId IN $found
        |RETURN DISTINCT y.name AS name""".stripMargin,
      Map("answerIds" -> Seq(30L), "found" -> Seq(20L)))
      .collect().map(_.getString(0)).toSet
    // papers on topic 30 are {20,21,22}; 20 excluded
    assert(names === Set("P-beta", "P-gamma"))
  }

  test("2-path template: both endpoints anchored, middle discovered") {
    // the third create_query template (path_retriever.py:38): x1 and x3
    // anchored by name, RETURN the middle x2
    val names = Planner.run(g,
      """MATCH (x1:Author {name: "Alice"})-[r1:WRITES]-(x2:Paper)-[r2:CITES]-(x3:Paper {name: "P-gamma"}) RETURN DISTINCT x2.name AS name""")
      .collect().map(_.getString(0)).toSet
    // Alice-W-(P-alpha)-CITES-(P-gamma) via e11; P-beta has no CITES edge
    assert(names === Set("P-alpha"))
  }

  test("retrieval rewrite: widenForRetrieval adds props + cosine + order") {
    val cand = Parser.parse(
      """MATCH (x1:Author {name: "Alice"})-[r1:WRITES]-(x2:Paper) RETURN DISTINCT x2.name AS name""")
    val widened = cand.widenForRetrieval("x2", Seq("name", "abstract"),
      "nameEmbedding", "qEmb")
    // query embedding = basis vector 0 → sim 1.0 for nodeId 20 (20%4=0),
    // 0.0 for 21 (21%4=1)
    val rows = new Planner(g, Map("qEmb" -> Seq(1.0, 0.0, 0.0, 0.0)))
      .plan(widened).collect()
      .map(r => (r.getAs[Long]("nodeId"), r.getAs[String]("name"),
        r.getAs[String]("abstract"), r.getAs[Double]("similarity")))
    assert(rows.map(_._1).toSeq === Seq(20L, 21L))  // ordered by similarity desc
    assert(rows.head._4 === 1.0)
    assert(rows.head._3 === "about dbs")
    assert(rows.last._3 === null)                   // null prop tolerated
    assert(rows.last._4 === 0.0)
  }

  test("variable-length path: union of hop counts with trail semantics") {
    // Alice(10) within 1..2 hops. The parallel-edge pair e4/e12 (10-20
    // WRITES/REVIEWS) makes 10 its OWN 2-hop neighbor — out e4, back e12
    // is a legal trail — which pins the per-expansion trail filter.
    val ids = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[*1..2]-(x) RETURN DISTINCT x.nodeId AS id""")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 10L, 11L, 20L, 21L, 22L, 30L))
  }

  test("variable-length path with a type constraint on every hop") {
    // CITES edges only: e11 (22-20) and the self-loop e13 (22-22);
    // from P-alpha(20): 1 hop -> 22; 2 hops -> 22 again via the self-loop
    // (e11 then e13 — distinct rels, legal trail); never back to 20 (e11
    // would repeat)
    val ids = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})-[:CITES*1..2]-(x) RETURN DISTINCT x.nodeId AS id""")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(22L))
  }

  test("aggregation over a variable-length match spans all expansions") {
    val cnt = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[*1..2]-(x) RETURN count(DISTINCT x) AS cnt""")
      .collect().head.getLong(0)
    assert(cnt === 7L)
  }

  test("var-length parse forms: bare *, *n, *min..max; bad forms rejected") {
    import graft.cypher.{Parser, Ast}
    def range(s: String) =
      Parser.parse(s"MATCH (a)-[$s]-(b) RETURN a.name").paths.head.rels.head.range
    assert(range("*") === Some((1, 3)))
    assert(range("*2") === Some((2, 2)))
    assert(range(":CITES*1..2") === Some((1, 2)))
    intercept[Parser.ParseError](range("*0..2"))   // min >= 1
    intercept[Parser.ParseError](range("*2..9"))   // capped at 3
    intercept[Parser.ParseError](range("r*1..2"))  // no var binding
  }

  test("ORDER BY + LIMIT") {
    val first = Planner.run(g,
      """MATCH (x:Author)-[r:WRITES]-(p:Paper) RETURN DISTINCT x.name AS name ORDER BY name ASC LIMIT 2""")
      .collect().map(_.getString(0)).toSeq
    assert(first === Seq("Alice", "Bob"))
  }

  // ---- WITH chaining (MATCH … WITH … MATCH/RETURN) ----

  test("WITH parse: prefixes captured, render∘parse = id on chained query") {
    val s = """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper) """ +
      """WITH p MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy) """ +
      """RETURN DISTINCT f.name AS fos"""
    val q = Parser.parse(s)
    assert(q.prefixes.length === 1)
    assert(q.prefixes.head.withItems.map(_.expr) === Seq(Ast.ColRef("p")))
    assert(q.paths.head.nodes.map(_.varName) === Seq("p", "f"))
    assert(Parser.parse(q.render) === q)
  }

  test("WITH carries a node variable into the next MATCH (re-bind by id)") {
    // Alice writes P-alpha and P-beta; both HAS_TOPIC Databases
    val fos = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper)
        |WITH p MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy)
        |RETURN DISTINCT f.name AS fos""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(fos === Set("Databases"))
    // aggregate over the chained frame
    val cnt = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper)
        |WITH p MATCH (p)-[h:HAS_TOPIC]-(f)
        |RETURN count(DISTINCT f) AS cnt""".stripMargin)
      .collect().head.getLong(0)
    assert(cnt === 1L)
  }

  test("WITH DISTINCT is a real barrier: parallel edges collapse") {
    // Alice—P-alpha twice (WRITES e4 + REVIEWS e12): without DISTINCT the
    // carried multiplicity doubles downstream rows; with DISTINCT it doesn't
    def topicRows(withClause: String): Long = Planner.run(g,
      s"""MATCH (a:Author {name: "Alice"})-[r]-(p:Paper {name: "P-alpha"})
         |$withClause MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy)
         |RETURN f.name AS fos""".stripMargin).count()
    assert(topicRows("WITH p") === 2L)
    assert(topicRows("WITH DISTINCT p") === 1L)
  }

  test("carried var props stay addressable without a re-match") {
    // Carol writes P-gamma; P-gamma CITES P-alpha and itself (self-loop)
    val rows = Planner.run(g,
      """MATCH (a:Author {name: "Carol"})-[r:WRITES]-(p:Paper)
        |WITH p, a MATCH (p)-[c:CITES]-(q2:Paper)
        |RETURN a.name AS author, q2.name AS cited""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("Carol", "P-alpha"), ("Carol", "P-gamma")))
  }

  test("WITH scalar projection + WHERE col = literal + bare RETURN") {
    val out = Planner.run(g,
      """MATCH (a:Author)-[r:AFFILIATED_WITH]-(i:Institution {name: "MIT"})
        |WITH a.name AS author WHERE author = "Bob"
        |RETURN author""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("Bob"))
  }

  test("FULL_TEXT_QUERY shape: WITH … WHERE normalize(lower(…)) = " +
    "normalize(lower($param)) RETURN (ner.py:111-114)") {
    // composed Café (40) and decomposed Cafe+combining-acute (41) both
    // NFC-lower-normalize to the same key; the query string arrives in
    // DECOMPOSED uppercase form — still matches both
    val names = Planner.run(g,
      """MATCH (e:Entity)
        |WITH e.name AS name WHERE normalize(lower(name)) = normalize(lower($string))
        |RETURN name""".stripMargin,
      Map("string" -> "CAFÉ"))
      .collect().map(_.getString(0)).toSeq
    assert(names.length === 2, s"both NFC forms must match: $names")
    // unaliased WITH expressions are rejected, like Cypher
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (e:Entity) WITH e.name RETURN name"))
  }

  test("WITH aggregation + HAVING-shaped WHERE: implicit grouping at " +
    "the barrier, aggregate alias filters and carries forward") {
    // papers per author: Alice 2 (P-alpha, P-beta), Bob 1, Carol 1
    val all = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a, count(DISTINCT p) AS np
        |RETURN a.name AS author, np ORDER BY author""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(all === Seq(("Alice", 2L), ("Bob", 1L), ("Carol", 1L)))
    // HAVING shape: only the 2-paper author survives, binding carries on
    val chained = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a, count(DISTINCT p) AS np WHERE np >= 2
        |MATCH (a)-[r2:AFFILIATED_WITH]-(i:Institution)
        |RETURN a.name AS author, i.name AS inst, np""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(chained === Seq(("Alice", "MIT", 2L)))
    // comparison operator family parses and filters
    val lt = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author, count(DISTINCT p) AS np WHERE np < 2
        |RETURN author ORDER BY author""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(lt === Seq("Bob", "Carol"))
  }

  test("WITH ORDER BY/SKIP/LIMIT: per-stage trim, tie-break, sub-clause " +
    "order, render∘parse = id") {
    // top-1 author by distinct papers (Alice, 2), carried into the next hop
    val top = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a, count(DISTINCT p) AS np ORDER BY np DESC LIMIT 1
        |MATCH (a)-[r2:AFFILIATED_WITH]-(i:Institution)
        |RETURN a.name AS author, i.name AS inst, np""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(top === Seq(("Alice", "MIT", 2L)))
    // SKIP past Alice: the np=1 tie breaks by the documented convention
    // (remaining atomic barrier columns, name-sorted asc) — Bob before Carol
    val second = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a, count(DISTINCT p) AS np ORDER BY np DESC SKIP 1 LIMIT 1
        |RETURN a.name AS author, np""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(second === Seq(("Bob", 1L)))
    // WHERE applies AFTER the trim (openCypher sub-clause order): the
    // LIMIT-2 slice is {Alice, Bob}; np < 2 keeps only Bob
    val after = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author, count(DISTINCT p) AS np
        |ORDER BY np DESC LIMIT 2 WHERE np < 2
        |RETURN author""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(after === Seq("Bob"))
    val s = """MATCH (a:Author)-[r:WRITES]-(p:Paper) """ +
      """WITH a, count(DISTINCT p) AS np ORDER BY np DESC SKIP 1 LIMIT 5 WHERE np < 2 """ +
      """RETURN a.name AS author, np"""
    val q = Parser.parse(s)
    assert(q.prefixes.head.orderBy === Seq(("np", true)))
    assert(q.prefixes.head.skip === Some(Ast.CountLit(1)))
    assert(q.prefixes.head.limit === Some(Ast.CountLit(5)))
    assert(Parser.parse(q.render) === q)
    // an ORDER BY ref outside the projected items errors clearly
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author ORDER BY nope
        |RETURN author""".stripMargin).collect())
    // `col = identifier` is rejected AT PARSE with position info (only <>
    // compares two variables) — not a generic plan-time error
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author)-[r:WRITES]-(p:Paper) WITH a.name AS author " +
        "WHERE author = bob RETURN author"))
  }

  test("OPTIONAL MATCH: left-outer rows with nulls for unmatched papers") {
    // CITES edges: 22-20 and the 22-22 self-loop. Per paper p, its CITES
    // neighbors q: 20->{22}, 21->{} (NULL row preserved), 22->{20, 22}.
    val rows = Planner.run(g,
      """MATCH (p:Paper) OPTIONAL MATCH (p)-[c:CITES]-(q:Paper)
        |RETURN DISTINCT p.name AS pname, q.name AS qname""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows === Set(
      ("P-alpha", Some("P-gamma")),
      ("P-beta", None),
      ("P-gamma", Some("P-alpha")),
      ("P-gamma", Some("P-gamma"))))
  }

  test("OPTIONAL MATCH WHERE scopes to the pattern, not the preserved row") {
    // Carol writes only P-gamma; the WHERE belongs to the optional pattern,
    // so her row survives with NULL instead of being filtered out.
    val rows = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[r:WRITES]-(p:Paper)
        |WHERE p <> a AND NOT p.nodeId IN $skip
        |RETURN DISTINCT a.name AS author, p.name AS paper""".stripMargin,
      Map("skip" -> Seq(21L, 22L)))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows === Set(
      ("Alice", Some("P-alpha")),
      ("Bob", Some("P-alpha")),
      ("Carol", None)))
  }

  test("OPTIONAL MATCH aggregates: count skips the null-extended rows") {
    val rows = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[c:CITES]-(x)
        |RETURN a.name AS author, count(DISTINCT x) AS n""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows === Set(("Alice", 0L), ("Bob", 0L), ("Carol", 0L)))
  }

  test("chained OPTIONAL MATCH: a null binding nulls everything downstream") {
    // Institutions write nothing, so w is NULL and the second optional
    // clause (keyed on w) must stay NULL too — null join keys match nothing.
    val rows = Planner.run(g,
      """MATCH (i:Institution) OPTIONAL MATCH (i)-[r1:WRITES]-(w)
        |OPTIONAL MATCH (w)-[r2:HAS_TOPIC]-(t)
        |RETURN DISTINCT i.name AS inst, w.name AS wn, t.name AS tn""".stripMargin)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows === Set(("MIT", None, None), ("Stanford", None, None)))
    // and the matched chain resolves through both clauses
    val chained = Planner.run(g,
      """MATCH (i:Institution {name: "Stanford"})
        |OPTIONAL MATCH (i)-[r1:AFFILIATED_WITH]-(a:Author)
        |OPTIONAL MATCH (a)-[r2:WRITES]-(p:Paper)
        |RETURN DISTINCT a.name AS author, p.name AS paper""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(chained === Set(("Carol", "P-gamma")))
  }

  test("OPTIONAL MATCH: type() of an unmatched rel is null; var-length unions") {
    val t = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"}) OPTIONAL MATCH (p)-[r:CITES]-(q)
        |RETURN type(r) AS t""".stripMargin).collect()
    assert(t.length === 1 && t.head.isNullAt(0))
    // var-length optional: MIT's 1..2-hop neighborhood (trail semantics)
    val hood = Planner.run(g,
      """MATCH (i:Institution {name: "MIT"}) OPTIONAL MATCH (i)-[*1..2]-(x)
        |RETURN DISTINCT x.nodeId AS nid""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(hood === Set(10L, 11L, 20L, 21L))
  }

  test("shortestPath: min hop distance per endpoint pair (BFS, not enumeration)") {
    // BFS from MIT (1): d1 {Alice 10, Bob 11}, d2 {P-alpha 20, P-beta 21},
    // d3 {Databases 30, P-gamma 22}; Carol/Stanford are 4-5 hops out.
    val rows = Planner.run(g,
      """MATCH p = shortestPath((i:Institution {name: "MIT"})-[*1..3]-(x))
        |RETURN x.nodeId AS nid, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((10L, 1L), (11L, 1L), (20L, 2L), (21L, 2L),
      (30L, 3L), (22L, 3L)))
  }

  test("shortestPath: *0.. admits the zero-length pair; *1.. drops it even with a self-loop") {
    val withZero = Planner.run(g,
      """MATCH p = shortestPath((i:Institution {name: "MIT"})-[*0..2]-(x))
        |RETURN x.nodeId AS nid, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withZero === Set((1L, 0L), (10L, 1L), (11L, 1L), (20L, 2L), (21L, 2L)))
    // P-gamma has a CITES self-loop (e13) — a shortest path from a node to
    // itself is still length 0 only; the loop edge must not surface (22,1)
    val self = Planner.run(g,
      """MATCH p = shortestPath((a:Paper {name: "P-gamma"})-[*1..2]-(x))
        |RETURN x.nodeId AS nid, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!self.exists(_._1 == 22L) && self.contains((30L, 1L)) && self.contains((20L, 1L)))
  }

  test("shortestPath: relationship-type constraint restricts the traversal") {
    // WRITES edges only: 10-20, 10-21, 11-20, 12-22. From Alice (10):
    // d1 {20, 21}, d2 {11}; Carol's component is unreachable over WRITES.
    val rows = Planner.run(g,
      """MATCH p = shortestPath((a:Author {name: "Alice"})-[:WRITES*1..3]-(x))
        |RETURN x.nodeId AS nid, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((20L, 1L), (21L, 1L), (11L, 2L)))
  }

  test("shortestPath: implicit grouping aggregates over the distance rows") {
    val rows = Planner.run(g,
      """MATCH p = shortestPath((i:Institution {name: "MIT"})-[*1..3]-(x))
        |WHERE NOT x.nodeId IN $skip
        |RETURN length(p) AS len, count(DISTINCT x) AS n""".stripMargin,
      Map("skip" -> Seq(21L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === Set((1L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("shortestPath composes with WITH stages: carried endpoints seed the BFS") {
    // anchor from a prior top-k stage: the two first authors by name
    // seed the BFS (2 sources, not V); carried columns stay referencable
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH DISTINCT a ORDER BY a.name LIMIT 2
        |MATCH q = shortestPath((a)-[*1..3]-(f:FieldOfStudy))
        |RETURN a.name AS author, f.name AS field, length(q) AS len
        |ORDER BY author""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("Alice", "Databases", 2L),
      ("Bob", "Databases", 2L)))
    // far endpoint carried instead (the BFS still seeds from the anchor)
    val far = Planner.run(g,
      """MATCH (f:FieldOfStudy)
        |WITH f
        |MATCH p = shortestPath((a:Author {name: "Carol"})-[*1..3]-(f))
        |RETURN f.name AS field, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(far.toSeq === Seq(("Databases", 2L)))
    // BOTH endpoints carried: the pairwise distances of the carried product
    val both = Planner.run(g,
      """MATCH (x:Author {name: "Alice"}), (y:FieldOfStudy)
        |WITH x, y
        |MATCH p = shortestPath((x)-[*1..3]-(y))
        |RETURN x.name AS a, y.name AS b, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(both.toSeq === Seq(("Alice", "Databases", 2L)))
    // a carried endpoint re-binds by nodeId — a label/anchor on it is
    // rejected (spell it bare)
    val lab = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author) WITH DISTINCT a
        |MATCH p = shortestPath((a:Author)-[*1..2]-(b:Paper))
        |RETURN length(p) AS len""".stripMargin))
    assert(lab.getMessage.contains("spell it bare"))
  }

  test("EXISTS pattern predicate: semi/anti join semantics") {
    // papers on either side of a CITES edge: P-alpha (cited by P-gamma)
    // and P-gamma (cites + self-loop); P-beta has none
    val cited = Planner.run(g,
      """MATCH (p:Paper) WHERE EXISTS { (p)-[c:CITES]-(q:Paper) }
        |RETURN DISTINCT p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(cited === Set("P-alpha", "P-gamma"))
    val uncited = Planner.run(g,
      """MATCH (p:Paper) WHERE NOT EXISTS { (p)-[c:CITES]-(q:Paper) }
        |RETURN DISTINCT p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(uncited === Set("P-beta"))
    // anchored far node inside the pattern + conjunction with a scalar
    // predicate: authors of P-alpha other than Alice herself
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |WHERE EXISTS { (a)-[w:WRITES]-(p:Paper {name: "P-alpha"}) }
        |  AND NOT a.nodeId IN $skip
        |RETURN DISTINCT a.name AS name""".stripMargin,
      Map("skip" -> Seq(10L)))
      .collect().map(_.getString(0)).toSet
    assert(rows === Set("Bob"))
    // var-length pattern inside EXISTS: institutions within 2 hops of a
    // Paper (both are — MIT via its authors, Stanford via Carol)
    val insts = Planner.run(g,
      """MATCH (i:Institution) WHERE EXISTS { (i)-[*1..2]-(x:Paper) }
        |RETURN DISTINCT i.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(insts === Set("MIT", "Stanford"))
    // EXISTS survives aggregation queries (filter before the group)
    val n = Planner.run(g,
      """MATCH (a:Author) WHERE EXISTS { (a)-[w:WRITES]-(p:Paper) }
        |RETURN count(DISTINCT a) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 3L)
  }

  test("EXISTS grammar: round-trip and out-of-scope shapes fail") {
    val s = """MATCH (a:Author) WHERE NOT EXISTS { (a)-[c:CITES]-(q) } """ +
      """AND a <> a RETURN a.name AS name"""
    val q = Parser.parse(s)
    assert(q.preds.head ===
      Ast.ExistsPat(q.preds.head.asInstanceOf[Ast.ExistsPat].path, true))
    assert(Parser.parse(q.render) === q)
    // the pattern must share a bound variable
    intercept[IllegalArgumentException](Planner.run(g,
      "MATCH (a:Author) WHERE EXISTS { (z)-[c:CITES]-(q) } RETURN a.name AS n")
      .collect())
    // inside an OPTIONAL MATCH's pattern-scoped WHERE, EXISTS decides
    // whether the optional side MATCHES (Cypher's scoping): only papers
    // carrying a citation edge survive the optional pattern — P-beta
    // drops, so Alice keeps one paper, Bob one, Carol one (round 13;
    // previously a parse-time rejection)
    val optRows = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[w:WRITES]-(p:Paper)
        |WHERE EXISTS { (p)-[c:CITES]-(q:Paper) }
        |RETURN a.name AS name, p.name AS pn ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(optRows.toSeq === Seq(
      ("Alice", "P-alpha"), ("Bob", "P-alpha"), ("Carol", "P-gamma")))
    // and in a WITH barrier's post-projection WHERE, the shared variable
    // resolves against the flattened carry columns: only MIT authors pass
    val withRows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) WITH a, count(p) AS n
        |WHERE EXISTS { (a)-[f:AFFILIATED_WITH]-(i:Institution {name: "MIT"}) }
        |RETURN a.name AS name, n ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(withRows.toSeq === Seq(("Alice", 2L), ("Bob", 1L)))
    // braces required
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a) WHERE EXISTS (a)-[r]-(b) RETURN a.name"))
  }

  test("arithmetic in RETURN: precedence, parens, truncating integer division") {
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name, a.nodeId * 2 + 1 AS x, (a.nodeId + 2) * 3 AS y,
        |       a.nodeId / 4 AS d, a.nodeId % 4 AS m
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("Alice", 21L, 36L, 2L, 2L),
      ("Bob", 23L, 39L, 2L, 3L),
      ("Carol", 25L, 42L, 3L, 0L)))
    // integer division truncates TOWARD ZERO (Java/Neo4j/DuckDB-`//`)
    val neg = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN (0 - 7) / 2 AS q, (0 - 7) % 2 AS r""".stripMargin)
      .collect().head
    assert((neg.getLong(0), neg.getLong(1)) === ((-3L, -1L)))
    // render ∘ parse = id through precedence-sensitive parenthesization
    val q = Parser.parse(
      "MATCH (a:Author) RETURN a.nodeId - (1 + 2) * 3 AS v, 10 - (3 - 1) AS w")
    assert(Parser.parse(q.render) === q)
    // arithmetic over WITH-projected aliases (ColRef operands)
    val over = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a.name AS name, count(DISTINCT p) AS np
        |RETURN name, np * 10 AS scaled ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(over.toSeq === Seq(("Alice", 20L), ("Bob", 10L), ("Carol", 10L)))
  }

  test("sum()/avg() aggregates: implicit grouping, arithmetic args, WITH form") {
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |RETURN a.name AS name, sum(p.nodeId) AS s, avg(p.nodeId) AS m,
        |       sum(p.nodeId * 2 + 1) AS s2, count(DISTINCT p) AS n
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      ("Alice", 41L, 20.5, 84L, 2L), // papers 20, 21
      ("Bob", 20L, 20.0, 41L, 1L),
      ("Carol", 22L, 22.0, 45L, 1L)))
    // sum at a WITH barrier, alias carried through a second hop, then
    // arithmetic over the alias in the final RETURN
    val withForm = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a, sum(p.nodeId) AS s
        |MATCH (a)-[f:AFFILIATED_WITH]-(i:Institution)
        |RETURN i.name AS inst, a.name AS name, s, s / 2 AS half
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(withForm.toSeq === Seq(
      ("MIT", "Alice", 41L, 20L), ("MIT", "Bob", 20L, 10L),
      ("Stanford", "Carol", 22L, 11L)))
    // grand total (no grouping keys)
    val total = Planner.run(g,
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN sum(p.nodeId) AS t")
      .collect().head.getLong(0)
    assert(total === 83L)
    // DISTINCT aggregates over a duplicated argument: Alice writes papers
    // 20 and 21 → nodeId/2 buckets {10, 10} → sum(DISTINCT)=10, avg=10.0
    val dis = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |RETURN a.name AS name, sum(DISTINCT p.nodeId / 2) AS s,
        |       avg(DISTINCT p.nodeId / 2) AS m
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(dis.toSeq === Seq(
      ("Alice", 10L, 10.0), ("Bob", 10L, 10.0), ("Carol", 11L, 11.0)))
    // WITH-barrier DISTINCT form + render round-trip
    val disWith = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a, sum(DISTINCT p.nodeId / 2) AS s
        |RETURN a.name AS name, s ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(disWith.toSeq === Seq(("Alice", 10L), ("Bob", 10L), ("Carol", 11L)))
    val qd = Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN sum(DISTINCT p.nodeId) AS s, avg(p.nodeId) AS m")
    assert(Parser.parse(qd.render) === qd)
    // aggregates cannot nest inside arithmetic — parse-time rejection
    val err = intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p) RETURN sum(p.nodeId) + 1 AS bad"))
    assert(err.getMessage.contains("WITH barrier"))
    // count over a relationship variable (round 15: in-dialect)
    val relCnt = Planner.run(g,
      "MATCH (a:Author)-[w:WRITES]-(p) RETURN count(w) AS n")
      .collect().head.getLong(0)
    assert(relCnt === 4L) // e4, e5, e6, e7
    // render round-trip
    val q = Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN a.name AS name, " +
        "sum(p.nodeId * 2) AS s, avg(p.nodeId) AS m")
    assert(Parser.parse(q.render) === q)
  }

  test("CASE / coalesce / IS NULL: null branching incl. the OPTIONAL side") {
    val rows = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS name, coalesce(p.abstract, "none") AS ab,
        |       CASE WHEN p.abstract IS NULL THEN 0 ELSE 1 END AS has_ab
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("P-alpha", "about dbs", 1L), ("P-beta", "none", 0L),
      ("P-gamma", "graphs", 1L)))
    // IS [NOT] NULL as a WHERE predicate on a node property
    val noAb = Planner.run(g,
      "MATCH (p:Paper) WHERE p.abstract IS NULL RETURN p.name AS name")
      .collect().map(_.getString(0)).toSet
    assert(noAb === Set("P-beta"))
    val withAb = Planner.run(g,
      "MATCH (p:Paper) WHERE p.abstract IS NOT NULL RETURN p.name AS name")
      .collect().map(_.getString(0)).toSet
    assert(withAb === Set("P-alpha", "P-gamma"))
    // property comparison directly in WHERE (PropCmp)
    val big = Planner.run(g,
      "MATCH (p:Paper) WHERE p.nodeId >= 21 RETURN p.name AS name")
      .collect().map(_.getString(0)).toSet
    assert(big === Set("P-beta", "P-gamma"))
    // CASE over an OPTIONAL MATCH variable: unmatched side is null
    val opt = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[r:AFFILIATED_WITH]-(a:Author {name: "Alice"})
        |RETURN i.name AS inst,
        |       CASE WHEN a.name IS NULL THEN "no" ELSE "yes" END AS has_alice
        |ORDER BY inst""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(opt.toSeq === Seq(("MIT", "yes"), ("Stanford", "no")))
    // multi-branch CASE with comparisons + render round-trip
    val buckets = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS name,
        |       CASE WHEN p.nodeId < 21 THEN "low" WHEN p.nodeId = 21 THEN "mid"
        |            ELSE "high" END AS bucket
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(buckets.toSeq === Seq(
      ("P-alpha", "low"), ("P-beta", "mid"), ("P-gamma", "high")))
    val q = Parser.parse(
      """MATCH (p:Paper) WHERE p.abstract IS NOT NULL RETURN coalesce(p.abstract, "x", p.name) AS a, """ +
        """CASE WHEN p.nodeId <> 21 THEN p.name ELSE "mid" END AS b""")
    assert(Parser.parse(q.render) === q)
  }

  test("IN list literals: membership and negation, strings and integers") {
    val in = Planner.run(g,
      """MATCH (p:Paper) WHERE p.name IN ["P-alpha", "P-gamma", "missing"]
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(in === Seq("P-alpha", "P-gamma"))
    val notIn = Planner.run(g,
      """MATCH (p:Paper) WHERE NOT p.nodeId IN [20, 22]
        |RETURN p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(notIn === Seq("P-beta"))
    // composes with boolean groups
    val mixed = Planner.run(g,
      """MATCH (p:Paper)
        |WHERE p.name IN ["P-beta"] OR (p.nodeId IN [22] AND p.abstract IS NOT NULL)
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(mixed === Seq("P-beta", "P-gamma"))
    // round-trip; the $param form now parses on ANY property (round 13 —
    // InParam; nodeId keeps the historical NotIdIn node)
    val q = Parser.parse(
      """MATCH (p:Paper) WHERE p.name IN ["a\"b", "c"] AND NOT p.nodeId IN [1, -2] RETURN p.name AS n""")
    assert(Parser.parse(q.render) === q)
    assert(Parser.parse(
      "MATCH (p:Paper) WHERE NOT p.name IN $names RETURN p.name AS n")
      .preds.head ===
      Ast.InParam(Ast.PropRef("p", "name"), "names", negated = true))
    // mixed-type lists would hit Spark's string coercion, not Cypher's
    // typed comparison — grammar-level rejection
    val mixErr = intercept[Parser.ParseError](Parser.parse(
      """MATCH (p:Paper) WHERE p.nodeId IN [20, "x"] RETURN p.name AS n"""))
    assert(mixErr.getMessage.contains("all strings or all integers"))
    // a bare '-' in an expression is a ParseError with position, never a
    // raw NumberFormatException
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (p:Paper) RETURN p.nodeId * - 2 AS v"))
  }

  test("boolean WHERE: OR / NOT / parens with Cypher precedence") {
    // AND binds tighter than OR: matches P-beta (nodeId 21, null abstract)
    // plus P-gamma (nodeId 22) — NOT (a AND b) De-Morgan side checked too
    val or = Planner.run(g,
      """MATCH (p:Paper)
        |WHERE p.nodeId = 22 OR p.nodeId >= 21 AND p.abstract IS NULL
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(or === Seq("P-beta", "P-gamma"))
    // explicit grouping flips the result: (22 OR >=21) AND null-abstract
    val grouped = Planner.run(g,
      """MATCH (p:Paper)
        |WHERE (p.nodeId = 22 OR p.nodeId >= 21) AND p.abstract IS NULL
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(grouped === Seq("P-beta"))
    // NOT over a group
    val notted = Planner.run(g,
      """MATCH (p:Paper)
        |WHERE NOT (p.nodeId = 22 OR p.abstract IS NULL)
        |RETURN p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(notted === Seq("P-alpha"))
    // top-level AND chain still flattens to the legacy conjunct list
    val q = Parser.parse(
      "MATCH (p:Paper) WHERE p.nodeId >= 21 AND p.abstract IS NULL " +
        "RETURN p.name AS name")
    assert(q.preds.length === 2)
    // round-trip through the parenthesized render
    val q2 = Parser.parse(
      """MATCH (p:Paper) WHERE p.nodeId = 22 OR NOT (p.nodeId < 21 AND p.abstract IS NULL) RETURN p.name AS name""")
    assert(Parser.parse(q2.render) === q2)
    // EXISTS nested under OR plans as a MARKER left join folded into the
    // boolean tree (the disjunction-composable form a semi-join lacks):
    // Carol by id, Alice/Bob by having written P-alpha
    val orExists = Planner.run(g,
      """MATCH (a:Author)
        |WHERE a.nodeId = 12 OR EXISTS { (a)-[w:WRITES]-(p:Paper {name: "P-alpha"}) }
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(orExists === Seq("Alice", "Bob", "Carol"))
    // NOT over a parenthesized EXISTS inside the disjunction: Alice by
    // id, Carol by NOT having written P-alpha
    val notExists = Planner.run(g,
      """MATCH (a:Author)
        |WHERE a.nodeId = 10 OR NOT (EXISTS { (a)-[w:WRITES]-(p:Paper {name: "P-alpha"}) })
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(notExists === Seq("Alice", "Carol"))
    // the marker columns never leak into the result schema
    assert(Planner.run(g,
      """MATCH (a:Author)
        |WHERE a.nodeId = 12 OR EXISTS { (a)-[w:WRITES]-(p:Paper) }
        |RETURN a.name AS name""".stripMargin).columns.toSeq === Seq("name"))
    // EXISTS stays legal as a top-level conjunct next to boolean groups
    val mixed = Planner.run(g,
      """MATCH (a:Author)
        |WHERE (a.nodeId = 10 OR a.nodeId = 12) AND EXISTS { (a)-[w:WRITES]-(p:Paper) }
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(mixed === Seq("Alice", "Carol"))
  }

  test("directed patterns: arrows traverse one stored orientation only") {
    // stored WRITES edges run author→paper: forward matches, reverse is empty
    val fwd = Planner.run(g,
      "MATCH (a:Author)-[w:WRITES]->(p:Paper) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(fwd === 4L) // e4, e5, e6, e7 — once each, never the bidir double
    val wrongWay = Planner.run(g,
      "MATCH (p:Paper)-[w:WRITES]->(a:Author) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(wrongWay === 0L)
    // reverse arrow ≡ forward arrow read the other way
    val rev = Planner.run(g,
      "MATCH (p:Paper)<-[w:WRITES]-(a:Author) RETURN count(*) AS n")
      .collect().head.getLong(0)
    assert(rev === 4L)
    // self-loop e13 (22→22) appears once in each direction; from P-gamma:
    // outgoing CITES = {P-alpha, P-gamma}, incoming = {P-gamma} only
    val out = Planner.run(g,
      """MATCH (s:Paper {name: "P-gamma"})-[c:CITES]->(q:Paper)
        |RETURN q.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("P-alpha", "P-gamma"))
    val in = Planner.run(g,
      """MATCH (s:Paper {name: "P-gamma"})<-[c:CITES]-(q:Paper)
        |RETURN q.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(in === Seq("P-gamma"))
    // directed var-length with trail semantics: CITES*1..2 from P-gamma =
    // 1 hop {20, 22} ∪ 2 hops {22→22→20} = {20, 22} distinct
    val vl = Planner.run(g,
      """MATCH (s:Paper {name: "P-gamma"})-[:CITES*1..2]->(q)
        |RETURN DISTINCT q.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(vl === Seq("P-alpha", "P-gamma"))
    // mixed directions in one path: who wrote a paper that P-gamma cites?
    val mixed = Planner.run(g,
      """MATCH (s:Paper {name: "P-gamma"})-[c:CITES]->(q:Paper)<-[w:WRITES]-(a:Author)
        |RETURN DISTINCT a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(mixed === Seq("Alice", "Bob", "Carol")) // P-alpha: Alice+Bob; P-gamma: Carol
    // grammar: double arrow rejected; round-trip preserves arrows
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a)<-[r:WRITES]->(b) RETURN a.name AS n"))
    val q = Parser.parse(
      "MATCH (a:Author)-[w:WRITES]->(p:Paper)<-[c:CITES]-(s:Paper) " +
        "RETURN a.name AS name, s.name AS citer")
    assert(q.paths.head.rels.map(_.dir) === Seq(1, -1))
    assert(Parser.parse(q.render) === q)
  }

  test("UNION parts must match in type, not just name") {
    val err = intercept[IllegalArgumentException](Planner.planUnion(g,
      Parser.parseUnion(
        """MATCH (a:Author) RETURN a.name AS x
          |UNION
          |MATCH (a:Author) RETURN count(DISTINCT a) AS x""".stripMargin)))
    assert(err.getMessage.contains("names and types"))
  }

  test("relationship-type alternation [:A|B] traverses either type") {
    // Alice—P-alpha is a parallel pair (WRITES e4 + REVIEWS e12);
    // Alice—P-beta is WRITES only. The alternation admits both types.
    val rows = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES|REVIEWS]-(p:Paper)
        |RETURN DISTINCT p.name AS name, type(r) AS t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(
      ("P-alpha", "WRITES"), ("P-alpha", "REVIEWS"), ("P-beta", "WRITES")))
    // shortestPath over an alternation-restricted edge set: WRITES and
    // HAS_TOPIC only. From Carol (12): d1 {P-gamma 22}, d2 {Databases 30},
    // d3 {P-alpha 20, P-beta 21} — CITES/AFFILIATED_WITH must not be used.
    val sp = Planner.run(g,
      """MATCH p = shortestPath((a:Author {name: "Carol"})-[:WRITES|HAS_TOPIC*1..3]-(x))
        |RETURN x.nodeId AS nid, length(p) AS len""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp === Set((22L, 1L), (30L, 2L), (20L, 3L), (21L, 3L)))
    // grammar: round-trip preserves the type list and its order
    val q = Parser.parse(
      "MATCH (a)-[r:WRITES|CITES|HAS_TOPIC]-(b) RETURN a.name AS n")
    assert(q.paths.head.rels.head.relTypes === Seq("WRITES", "CITES", "HAS_TOPIC"))
    assert(Parser.parse(q.render) === q)
  }

  test("shortestPath grammar: round-trip, bounds, and out-of-scope shapes fail") {
    val s = """MATCH p = shortestPath((i:Institution {name: "MIT"})-[:WRITES*1..3]-(x)) """ +
      """WHERE NOT x.nodeId IN $skip RETURN x.name AS name, length(p) AS len"""
    val q = Parser.parse(s)
    assert(q.shortest.map(_.pathVar) === Some("p"))
    assert(q.shortest.get.path.rels.head.range === Some((1, 3)))
    assert(Parser.parse(q.render) === q)
    // defaulted bounds: bare * = 1..3, *..5 = 1..5
    assert(Parser.parse("MATCH p = shortestPath((a)-[*]-(b)) RETURN length(p) AS l")
      .shortest.get.path.rels.head.range === Some((1, 3)))
    assert(Parser.parse("MATCH p = shortestPath((a)-[*..5]-(b)) RETURN length(p) AS l")
      .shortest.get.path.rels.head.range === Some((1, 5)))
    // minimum bound must be 0 or 1; cap at 8; rel must be var-length
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[*2..4]-(b)) RETURN length(p) AS l"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[*1..9]-(b)) RETURN length(p) AS l"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[r:CITES]-(b)) RETURN length(p) AS l"))
    // the clause stands alone: no chaining, no second path, no rel binding
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[*1..2]-(b)) WITH a RETURN a.name AS n"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[r*1..2]-(b)) RETURN length(p) AS l"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH p = shortestPath((a)-[*1..2]-(a)) RETURN length(p) AS l"))
    // length() must name the query's path variable
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH p = shortestPath((i:Institution {name: "MIT"})-[*1..2]-(x))
        |RETURN length(q) AS len""".stripMargin).collect())
  }

  test("OPTIONAL MATCH grammar: round-trip, and out-of-scope shapes fail") {
    val s = """MATCH (a:Author) OPTIONAL MATCH (a)-[r:WRITES]-(p:Paper) """ +
      """WHERE p <> a RETURN a.name AS author, p.name AS paper"""
    val q = Parser.parse(s)
    assert(q.optionals.length === 1 &&
      q.optionals.head.preds === Seq(Ast.VarNeq("p", "a")))
    assert(Parser.parse(q.render) === q)
    // one path per clause
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a) OPTIONAL MATCH (a)-[r]-(b), (c) RETURN a.name"))
    // final clause only: WITH after OPTIONAL MATCH is out of dialect
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a) OPTIONAL MATCH (a)-[r]-(b) WITH a RETURN a.name"))
    // the optional pattern must share a bound variable
    intercept[IllegalArgumentException](Planner.run(g,
      "MATCH (a:Author) OPTIONAL MATCH (z:Paper)-[r:CITES]-(y) RETURN a.name AS n")
      .collect())
  }

  test("collect(DISTINCT x.prop): sorted list aggregate, skips nulls, WITH-stage form") {
    // per-author papers, implicit grouping on the author name
    val rows = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |RETURN a.name AS author, collect(DISTINCT p.name) AS papers""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(rows("Alice") === Seq("P-alpha", "P-beta"), "sorted distinct")
    // null-skipping: an unmatched OPTIONAL MATCH contributes nothing
    val withNulls = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[r:REVIEWS]-(p:Paper)
        |RETURN collect(DISTINCT p.name) AS reviewed""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(withNulls === Seq("P-alpha"), "only Alice reviews; nulls skipped")
    // the WITH-stage barrier form feeds downstream clauses
    val staged = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author, collect(DISTINCT p.name) AS papers
        |RETURN author, papers""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(staged("Alice") === Seq("P-alpha", "P-beta"))
    // grammar round-trip
    val q = Parser.parse(
      "MATCH (a:Author)-[r:WRITES]-(p:Paper) RETURN collect(DISTINCT p.name) AS names")
    assert(q.isAggregating)
    assert(Parser.parse(q.render) === q)
  }

  test("min/max property aggregates: extremum per group, null-skipping, WITH form") {
    val rows = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |RETURN a.name AS author, min(p.name) AS first_p, max(p.name) AS last_p""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows("Alice") === (("P-alpha", "P-beta")))
    // nulls from an unmatched OPTIONAL MATCH are skipped (Bob reviews nothing)
    val m = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[r:REVIEWS]-(p:Paper)
        |RETURN max(p.name) AS top""".stripMargin).collect().head.getString(0)
    assert(m === "P-alpha")
    // WITH-stage barrier form
    val staged = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author, max(p.name) AS last_p
        |RETURN author, last_p""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(staged("Alice") === "P-beta")
    // grammar round-trip
    val q = Parser.parse(
      "MATCH (a:Author)-[r:WRITES]-(p:Paper) RETURN min(p.name) AS lo, max(p.name) AS hi")
    assert(q.isAggregating && Parser.parse(q.render) === q)
  }

  test("multi-key ORDER BY: secondary keys break ties, ASC/DESC mix, round-trip") {
    val rows = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |RETURN a.name AS author, p.name AS paper
        |ORDER BY author DESC, paper LIMIT 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = rows.sortWith { case ((a1, p1), (a2, p2)) =>
      a1 > a2 || (a1 == a2 && p1 < p2) }.toSeq
    assert(rows.toSeq === expected)
    assert(rows.map(_._1).distinct.length > 1 ||
      rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
    val q = Parser.parse(
      "MATCH (a)-[r]-(b) RETURN a.name AS x, b.name AS y ORDER BY x DESC, y LIMIT 2")
    assert(q.orderBy === Seq(("x", true), ("y", false)))
    assert(Parser.parse(q.render) === q)
  }

  test("RETURN-level SKIP: offset before LIMIT, render round-trip") {
    val all = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |RETURN p.name AS paper ORDER BY paper""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    val page = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |RETURN p.name AS paper ORDER BY paper SKIP 1 LIMIT 2""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(page === all.slice(1, 3))
    val q = Parser.parse(
      "MATCH (a)-[r]-(b) RETURN a.name AS x ORDER BY x SKIP 2 LIMIT 3")
    assert(q.skip === Some(Ast.CountLit(2)) && q.limit === Some(Ast.CountLit(3)))
    assert(Parser.parse(q.render) === q)
  }

  test("parameterized paging SKIP $off LIMIT $k (round 15)") {
    val all = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN p.name AS paper ORDER BY paper""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    // RETURN-level: params resolve exactly like the literal spelling
    val page = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN p.name AS paper ORDER BY paper SKIP $off LIMIT $k""".stripMargin,
      Map("off" -> 1L, "k" -> 1L)).collect().map(_.getString(0)).toSeq
    assert(page === all.slice(1, 2))
    // WITH-stage form
    val staged = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH DISTINCT a.name AS author ORDER BY author LIMIT $k
        |RETURN author""".stripMargin, Map("k" -> 2))
      .collect().map(_.getString(0)).toSeq
    assert(staged === Seq("Alice", "Bob"))
    // CALL top-k form (also satisfies the uncorrelated-CALL bound)
    val called = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper)
        |  RETURN p.name AS pn ORDER BY p.name LIMIT $k }
        |RETURN pn ORDER BY pn""".stripMargin, Map("k" -> 1L))
      .collect().map(_.getString(0)).toSeq
    assert(called === Seq("P-alpha"))
    // typed rejections name the parameter
    val frac = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n LIMIT $k""",
      Map("k" -> 2.5)).collect())
    assert(frac.getMessage.contains("$k") &&
      frac.getMessage.contains("non-negative integer") &&
      frac.getMessage.contains("floating-point"))
    // a WHOLE-valued float is still rejected (Neo4j: counts take integer
    // parameters) but the message names the type, not a phantom
    // fraction (ADVICE r16); a fractional BigDecimal stays "fractional"
    val whole = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n LIMIT $k""",
      Map("k" -> 5.0)).collect())
    assert(whole.getMessage.contains("floating-point") &&
      !whole.getMessage.contains("fractional"))
    val bigFrac = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n LIMIT $k""",
      Map("k" -> new java.math.BigDecimal("2.5"))).collect())
    assert(bigFrac.getMessage.contains("fractional"))
    val neg = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n LIMIT $k""",
      Map("k" -> -1L)).collect())
    assert(neg.getMessage.contains("non-negative"))
    val missing = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n SKIP $off""").collect())
    assert(missing.getMessage.contains("missing parameter $off"))
    // render∘parse identity for the param spellings
    val q = Parser.parse(
      "MATCH (a)-[r]-(b) RETURN a.name AS x ORDER BY x SKIP $off LIMIT $k")
    assert(q.skip === Some(Ast.CountParam("off")) &&
      q.limit === Some(Ast.CountParam("k")))
    assert(Parser.parse(q.render) === q)
  }

  test("count(*) vs count(x): row count keeps OPTIONAL nulls, count(x) skips them") {
    // every author row survives the OPTIONAL MATCH; only Alice reviews
    val r = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[r:REVIEWS]-(p:Paper)
        |RETURN count(*) AS n_rows, count(p) AS n_reviewing""".stripMargin)
      .collect().head
    assert(r.getLong(0) > r.getLong(1), "null-extended rows counted by * only")
    assert(r.getLong(1) === 1L)
    // bag semantics: count(*) counts duplicate paths, DISTINCT does not
    val dup = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES|REVIEWS]-(p:Paper {name: "P-alpha"})
        |RETURN count(*) AS n_paths, count(DISTINCT p) AS n_nodes""".stripMargin)
      .collect().head
    assert(dup.getLong(0) === 2L && dup.getLong(1) === 1L)
    // WITH-stage form + grammar round-trip
    val staged = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a.name AS author, count(*) AS n
        |RETURN author, n""".stripMargin)
      .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toMap
    assert(staged("Alice") === 2L)
    val q = Parser.parse(
      "MATCH (a:Author)-[r:WRITES]-(p:Paper) RETURN count(*) AS n, count(p) AS np")
    assert(q.isAggregating && Parser.parse(q.render) === q)
  }

  test("UNION dedups across parts; UNION ALL concatenates") {
    // Alice WRITES {P-alpha, P-beta}; Alice REVIEWS {P-alpha} — the
    // overlap is what distinguishes the two forms
    val cypher = (sep: String) =>
      s"""MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper) RETURN p.name AS name
         |$sep
         |MATCH (a:Author {name: "Alice"})-[r:REVIEWS]-(p:Paper) RETURN p.name AS name""".stripMargin
    val u = Planner.run(g, cypher("UNION")).collect().map(_.getString(0))
    assert(u.toSet === Set("P-alpha", "P-beta") && u.length === 2,
      "cross-part dedup")
    val ua = Planner.run(g, cypher("UNION ALL")).collect().map(_.getString(0))
    assert(ua.sorted.toSeq === Seq("P-alpha", "P-alpha", "P-beta"))
    // per-part aggregation: each part groups before the union
    val agg = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper) RETURN count(DISTINCT p) AS n
        |UNION ALL
        |MATCH (a:Author {name: "Carol"})-[r:WRITES]-(p:Paper) RETURN count(DISTINCT p) AS n""".stripMargin)
      .collect().map(_.getLong(0))
    assert(agg.sorted.toSeq === Seq(1L, 2L))
  }

  test("UNION grammar: uniform ALL-ness, matching columns, strict single-query API") {
    // Neo4j: "Invalid combination of UNION and UNION ALL"
    intercept[Parser.ParseError](Parser.parseUnion(
      "MATCH (a)-[r]-(b) RETURN a.name AS n UNION MATCH (a)-[r]-(b) RETURN a.name AS n " +
        "UNION ALL MATCH (a)-[r]-(b) RETURN a.name AS n"))
    // the single-query entry point refuses a union chain
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a)-[r]-(b) RETURN a.name AS n UNION MATCH (a)-[r]-(b) RETURN a.name AS n"))
    // parts must return identical column names in order
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper) RETURN p.name AS name
        |UNION
        |MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper) RETURN p.name AS other""".stripMargin))
    // render∘parse = id, ALL preserved
    val uq = Parser.parseUnion(
      "MATCH (a)-[r]-(b) RETURN a.name AS n UNION ALL MATCH (c)-[s]-(d) RETURN c.name AS n")
    assert(uq.all && uq.parts.length === 2)
    assert(Parser.parseUnion(uq.render) === uq)
  }

  test("string predicates: CONTAINS / STARTS WITH / ENDS WITH / =~") {
    def names(cy: String): Set[String] =
      Planner.run(g, cy).collect().map(_.getString(0)).toSet
    assert(names("""MATCH (p:Paper) WHERE p.name CONTAINS "alph" RETURN p.name AS name""")
      === Set("P-alpha"))
    assert(names("""MATCH (p:Paper) WHERE p.name STARTS WITH "P-" RETURN p.name AS name""")
      === Set("P-alpha", "P-beta", "P-gamma"))
    assert(names("""MATCH (p:Paper) WHERE p.name ENDS WITH "ta" RETURN p.name AS name""")
      === Set("P-beta"))
    // =~ anchors the WHOLE string, like Neo4j (a bare substring match
    // would also admit P-alpha via "a")
    assert(names("""MATCH (p:Paper) WHERE p.name =~ "P-(alpha|beta)" RETURN p.name AS name""")
      === Set("P-alpha", "P-beta"))
    assert(names("""MATCH (p:Paper) WHERE p.name =~ "alpha" RETURN p.name AS name""")
      === Set.empty[String])
    // null property: predicate is null → row dropped (Neo4j semantics)
    assert(names("""MATCH (p:Paper) WHERE p.abstract CONTAINS "a" RETURN p.name AS name""")
      === Set("P-alpha", "P-gamma"))
    // composition inside boolean WHERE, and the negated form via NOT (…)
    assert(names(
      """MATCH (p:Paper) WHERE (p.name ENDS WITH "ta" OR p.name CONTAINS "gam") AND NOT (p.name STARTS WITH "Q") RETURN p.name AS name""")
      === Set("P-beta", "P-gamma"))
    // round-trip
    val q = Parser.parse(
      """MATCH (p:Paper) WHERE p.name CONTAINS "al" AND toLower(p.name) STARTS WITH "p-" RETURN p.name AS name""")
    assert(Parser.parse(q.render) === q)
  }

  test("scalar string functions: toLower/toUpper/size/substring/replace/trim") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN toLower(a.name) AS lo, toUpper(a.name) AS up,
        |       size(a.name) AS len, substring(a.name, 1, 3) AS mid,
        |       substring(a.name, 2) AS tail0,
        |       replace(a.name, "li", "LI") AS rep,
        |       trim(a.name) AS tr""".stripMargin).collect().head
    assert(row.getString(0) === "alice")
    assert(row.getString(1) === "ALICE")
    assert(row.getLong(2) === 5L)
    assert(row.getString(3) === "lic") // Neo4j substring is 0-indexed
    assert(row.getString(4) === "ice")
    assert(row.getString(5) === "ALIce")
    assert(row.getString(6) === "Alice")
    // function-wrapped refs in WHERE: the poor man's fulltext
    val names = Planner.run(g,
      """MATCH (p:Paper) WHERE toLower(p.name) CONTAINS "-b" RETURN p.name AS name""")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("P-beta"))
    // size() comparison predicate
    val n = Planner.run(g,
      """MATCH (a:Author) WHERE size(a.name) > 3 RETURN count(a) AS n""")
      .collect().head.getLong(0)
    assert(n === 2L) // Alice, Carol (Bob is 3)
    // size() is a Cypher integer: `/` stays integral division
    val d = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) RETURN size(a.name) / 2 AS half""")
      .collect().head.getLong(0)
    assert(d === 2L)
  }

  test("plain collect(x.prop): bag keeps duplicates, skips nulls, WITH form") {
    // parallel edges e4 (WRITES) + e12 (REVIEWS) both bind Alice—P-alpha:
    // the bag must duplicate where DISTINCT would collapse
    val bag = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r]-(p:Paper {name: "P-alpha"})
        |RETURN a.name AS name, collect(p.name) AS papers""".stripMargin)
      .collect().head.getSeq[String](1)
    assert(bag === Seq("P-alpha", "P-alpha"), "parallel edges must duplicate")
    val distinct = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r]-(p:Paper {name: "P-alpha"})
        |RETURN a.name AS name, collect(DISTINCT p.name) AS papers""".stripMargin)
      .collect().head.getSeq[String](1)
    assert(distinct === Seq("P-alpha"))
    // null-skipping: Alice's papers' abstracts — P-beta's is null
    val abs = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper)
        |RETURN collect(p.abstract) AS abstracts""".stripMargin)
      .collect().head.getSeq[String](0)
    assert(abs === Seq("about dbs"))
    // WITH-stage form
    val viaWith = Planner.run(g,
      """MATCH (a:Author)-[r:WRITES]-(p:Paper)
        |WITH a, collect(p.name) AS papers
        |RETURN a.name AS name, papers ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(viaWith.toSeq === Seq(
      ("Alice", Seq("P-alpha", "P-beta")),
      ("Bob", Seq("P-alpha")),
      ("Carol", Seq("P-gamma"))))
    // size() of a collected list alias counts elements
    val sz = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper)
        |WITH a, collect(p.name) AS papers
        |RETURN size(papers) AS n""".stripMargin).collect().head.getLong(0)
    assert(sz === 2L)
  }

  test("UNWIND literal lists: self-contained anchor, no parameter map") {
    val rows = Planner.run(g,
      """UNWIND ["Alice", "Carol"] AS nm
        |MATCH (a:Author {name: nm})-[r:WRITES]-(p:Paper)
        |RETURN a.name AS name, count(p) AS n ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("Alice", 2L), ("Carol", 1L)))
    // integer literal list against nodeId
    val byId = Planner.run(g,
      """UNWIND [1, 2] AS nid
        |MATCH (i:Institution {nodeId: nid})
        |RETURN count(i) AS n""".stripMargin).collect().head.getLong(0)
    assert(byId === 2L)
    // round-trip (string escaping included)
    val q = Parser.parse(
      """UNWIND ["a\"b", "c"] AS nm MATCH (x {name: nm}) RETURN x.name AS name""")
    assert(Parser.parse(q.render) === q)
    // mixed-type literal lists are rejected like IN lists
    intercept[Parser.ParseError](Parser.parse(
      """UNWIND ["a", 1] AS nm MATCH (x {name: nm}) RETURN x.name AS name"""))
  }

  test("stDev / stDevP / percentileCont / percentileDisc aggregates") {
    // Authors' nodeIds: 10, 11, 12 — hand-derived moments
    val row = Planner.run(g,
      """MATCH (a:Author)
        |RETURN stDev(a.nodeId) AS sd, stDevP(a.nodeId) AS sdp,
        |       percentileCont(a.nodeId, 0.5) AS p50,
        |       percentileCont(a.nodeId, 0.25) AS p25,
        |       percentileDisc(a.nodeId, 0.5) AS d50,
        |       percentileDisc(a.nodeId, 1.0) AS d100""".stripMargin)
      .collect().head
    assert(row.getDouble(0) === 1.0) // sample stdev of {10,11,12}
    assert(math.abs(row.getDouble(1) - math.sqrt(2.0 / 3.0)) < 1e-12)
    assert(row.getDouble(2) === 11.0)
    assert(row.getDouble(3) === 10.5) // interpolated
    assert(row.getDouble(4) === 11.0) // an actual group value (as double)
    assert(row.getDouble(5) === 12.0)
    // implicit grouping + WITH-stage form
    val perInst = Planner.run(g,
      """MATCH (i:Institution)-[r:AFFILIATED_WITH]-(a:Author)
        |WITH i, percentileCont(a.nodeId, 0.5) AS med
        |RETURN i.name AS name, med ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(perInst.toSeq === Seq(("MIT", 10.5), ("Stanford", 12.0)))
    // round-trip
    val q = Parser.parse(
      "MATCH (a:Author) RETURN stDev(a.nodeId) AS sd, percentileDisc(a.nodeId, 0.9) AS p")
    assert(Parser.parse(q.render) === q)
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) RETURN percentileCont(a.nodeId, 1.5) AS p"))
  }

  test("IN list type check: Cypher comparison is typed, no implicit casts") {
    // string property against an integer list → plan-time rejection
    intercept[IllegalArgumentException](Planner.run(g,
      "MATCH (a:Author) WHERE a.name IN [1, 2] RETURN a.name AS name").collect())
    // integer property against a string list → plan-time rejection
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author) WHERE a.nodeId IN ["x"] RETURN a.name AS name""").collect())
    // matching types pass
    assert(Planner.run(g,
      "MATCH (a:Author) WHERE a.nodeId IN [10, 12] RETURN count(a) AS n")
      .collect().head.getLong(0) === 2L)
  }

  test("scalar numeric functions: abs/sign/toString/toInteger/toFloat") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN abs(a.nodeId - 13) AS d, sign(a.nodeId - 13) AS s,
        |       sign(a.nodeId - 10) AS z, toString(a.nodeId) AS str,
        |       toInteger(a.nodeId / 3) AS i3,
        |       toFloat(a.nodeId) / 4 AS f4""".stripMargin).collect().head
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === -1L) // Cypher sign() is an integer
    assert(row.getLong(2) === 0L)
    assert(row.getString(3) === "10")
    assert(row.getLong(4) === 3L)
    assert(row.getDouble(5) === 2.5) // toFloat flips / to double division
    // abs/sign/toInteger stay integral for `/` typing
    val d = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) RETURN abs(a.nodeId) / 3 AS t""")
      .collect().head.getLong(0)
    assert(d === 3L)
    // aggregate over a function argument: sum(abs(...)) per label group
    val sums = Planner.run(g,
      """MATCH (p:Paper)-[r:CITES]-(q:Paper)
        |RETURN sum(abs(p.nodeId - q.nodeId)) AS total""".stripMargin)
      .collect().head.getLong(0)
    // CITES pairs (bidir): 22-20 twice (|2|+|2|) + self-loop 22-22 once
    assert(sums === 4L)
    val q0 = Parser.parse(
      "MATCH (a:Author) RETURN abs(a.nodeId) AS x, toFloat(a.nodeId) AS f")
    assert(Parser.parse(q0.render) === q0)
  }

  test("pattern-as-predicate: WHERE [NOT] (a)-[:T]-(b) is EXISTS sugar") {
    // papers with at least one citation edge: P-alpha (cited), P-gamma
    // (cites + self-loop); P-beta has none
    val cited = Planner.run(g,
      """MATCH (p:Paper) WHERE (p)-[:CITES]-(q:Paper)
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(cited === Seq("P-alpha", "P-gamma"))
    // negated form: papers never cited/citing
    val uncited = Planner.run(g,
      """MATCH (p:Paper) WHERE NOT (p)-[:CITES]-(q:Paper)
        |RETURN p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(uncited === Seq("P-beta"))
    // the sugar is EXACTLY the EXISTS AST (canonical render included)
    val sugar = Parser.parse(
      "MATCH (p:Paper) WHERE NOT (p)-[:CITES]-(q:Paper) RETURN p.name AS name")
    val explicit = Parser.parse(
      "MATCH (p:Paper) WHERE NOT EXISTS { (p)-[:CITES]-(q:Paper) } RETURN p.name AS name")
    assert(sugar === explicit)
    assert(Parser.parse(sugar.render) === sugar)
    // composes as a top-level conjunct beside scalar predicates
    val both = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WHERE (p)-[:HAS_TOPIC]-(f:FieldOfStudy) AND a.name <> "Bob"
        |RETURN count(DISTINCT a) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(both === 2L) // Alice, Carol
    // a parenthesized BOOLEAN group still parses as a group, not a pattern
    val grouped = Planner.run(g,
      """MATCH (p:Paper) WHERE (p.name = "P-beta" OR p.name = "P-gamma")
        |RETURN count(p) AS n""".stripMargin).collect().head.getLong(0)
    assert(grouped === 2L)
    // the sugar follows the EXISTS keyword everywhere it goes — including
    // OPTIONAL MATCH WHERE (round 13): same rows as the explicit spelling
    val sugarOpt = Planner.run(g,
      """MATCH (a:Author) OPTIONAL MATCH (a)-[w:WRITES]-(p:Paper)
        |WHERE (p)-[:CITES]-(q:Paper)
        |RETURN a.name AS name, p.name AS pn ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(sugarOpt.toSeq === Seq(
      ("Alice", "P-alpha"), ("Bob", "P-alpha"), ("Carol", "P-gamma")))
  }

  test("consecutive MATCH / shared-var comma patterns re-bind by nodeId") {
    // shared var p across two MATCH clauses: each author's papers joined
    // to their topic edges (every paper has exactly one HAS_TOPIC edge)
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy)
        |RETURN a.name AS name, count(f) AS n ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("Alice", 2L), ("Bob", 1L), ("Carol", 1L)))
    // the comma form is the same AST (canonical render) and same result
    val comma = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper), (p)-[h:HAS_TOPIC]-(f:FieldOfStudy)
        |RETURN a.name AS name, count(f) AS n ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(comma.toSeq === rows.toSeq)
    assert(Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy) RETURN a.name AS name""")
      === Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(p:Paper), (p)-[h:HAS_TOPIC]-(f:FieldOfStudy) RETURN a.name AS name"""))
    // an anchored REPEAT occurrence filters the shared binding
    val anchored = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |MATCH (p:Paper {name: "P-alpha"})
        |RETURN count(DISTINCT a) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(anchored === 2L) // Alice, Bob
    // disjoint clauses stay a cartesian product
    val cross = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) MATCH (i:Institution)
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    assert(cross === 2L)
    // each clause's WHERE conjuncts survive the merge
    val filtered = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) WHERE a.name <> "Bob"
        |MATCH (p)-[h:HAS_TOPIC]-(f:FieldOfStudy) WHERE p.name ENDS WITH "beta"
        |RETURN a.name AS name, p.name AS paper""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(filtered.toSeq === Seq(("Alice", "P-beta")))
  }

  test("count([DISTINCT] v.prop): null-skipping property counts") {
    // Alice WRITES P-alpha (abstract set) and P-beta (abstract null):
    // count(p.abstract) skips the null where count(p) does not
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN count(p) AS n, count(p.abstract) AS n_abs,
        |       count(DISTINCT p.abstract) AS n_dabs""".stripMargin)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((2L, 1L, 1L)))
    // DISTINCT over a property with duplicates across rows: the three
    // authors' institutions collapse to the distinct names
    val inst = Planner.run(g,
      """MATCH (a:Author)-[f:AFFILIATED_WITH]-(i:Institution)
        |RETURN count(i.name) AS n, count(DISTINCT i.name) AS nd""".stripMargin)
      .collect().head
    assert((inst.getLong(0), inst.getLong(1)) === ((3L, 2L)))
    val q = Parser.parse(
      "MATCH (a:Author) RETURN count(DISTINCT a.name) AS n, count(a.name) AS m")
    assert(Parser.parse(q.render) === q)
  }

  test("string + concatenates (numeric co-operand stringifies, null propagates)") {
    val tag = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) RETURN a.name + "#" + a.nodeId AS tag""")
      .collect().head.getString(0)
    assert(tag === "Alice#10")
    // Cypher null semantics: null + "x" = null (P-beta's abstract is null)
    val rows = Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS name, p.abstract + "!" AS excl
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq === Seq(("P-alpha", Some("about dbs!")),
      ("P-beta", None), ("P-gamma", Some("graphs!"))))
    // numeric + still adds (no string side)
    val add = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) RETURN a.nodeId + 5 AS x""")
      .collect().head.getLong(0)
    assert(add === 15L)
    // nested concats on both sides of the middle +
    val nested = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})
        |RETURN ("[" + a.name) + ("]" + a.nodeId) AS t""".stripMargin)
      .collect().head.getString(0)
    assert(nested === "[Bob]11")
  }

  test("label predicate in WHERE: [NOT] v:Label") {
    // untyped bind, filtered post-hoc — MIT's AFFILIATED_WITH neighbors
    // are exactly the two authors
    val n = Planner.run(g,
      """MATCH (x)-[r:AFFILIATED_WITH]-(y:Institution {name: "MIT"})
        |WHERE x:Author RETURN count(x) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 2L)
    // negated: everything touching the FieldOfStudy hub IS a Paper
    val notPaper = Planner.run(g,
      """MATCH (x)-[r]-(y:FieldOfStudy) WHERE NOT x:Paper
        |RETURN count(x) AS n""".stripMargin).collect().head.getLong(0)
    assert(notPaper === 0L)
    // _Entity_ matches every node
    val all = Planner.run(g,
      "MATCH (x) WHERE x:_Entity_ RETURN count(x) AS n")
      .collect().head.getLong(0)
    assert(all === MicroGraph.nodeRows.length.toLong)
    // round-trip, both polarities, beside other predicates
    val q = Parser.parse(
      """MATCH (x)-[r]-(y) WHERE x:Author AND NOT y:Paper AND x.nodeId >= 10 RETURN x.name AS name""")
    assert(Parser.parse(q.render) === q)
  }

  test("`/` typing resolves against the variable's own schema (rel vars)") {
    // r.src is a LONG on the relationship frame; the node schema has no
    // such column — integral ÷ integral must truncate (10 / 3 = 3)
    val d = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[r:WRITES]-(p:Paper {name: "P-beta"})
        |RETURN r.src / 3 AS third""".stripMargin).collect().head
    assert(d.getLong(0) === 3L)
    // the SAME typing inside an OPTIONAL MATCH's pattern-scoped WHERE
    // (its predicates plan in the optional pattern's own alias space;
    // abs() keeps the integral-ness of the rel prop it wraps)
    val rows = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |OPTIONAL MATCH (a)-[r:WRITES]-(p:Paper)
        |WHERE abs(r.src) / 3 = 3
        |RETURN a.name AS name, count(p) AS n""".stripMargin)
      .collect().head
    assert((rows.getString(0), rows.getLong(1)) === (("Alice", 2L)),
      "integer division must hold for rel props in OPTIONAL WHERE " +
        "(double division would null-extend every row)")
  }

  test("function names are not reserved words; WHERE rejects aggregates on both sides") {
    // a projected alias named after a function still references fine
    val r = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a, count(p) AS size WHERE size >= 2
        |RETURN a.name AS name, size""".stripMargin).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq === Seq(("Alice", 2L)))
    val m = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a, count(p) AS min
        |RETURN a.name AS name, min ORDER BY name LIMIT 1""".stripMargin)
      .collect().head
    assert((m.getString(0), m.getLong(1)) === (("Alice", 2L)))
    // aggregates in WHERE are rejected at parse time — LEFT and RIGHT
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) WHERE size(a.name) > count(a) RETURN a.name AS n"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) WHERE toLower(a.name) CONTAINS collect(a.name) RETURN a.name AS n"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) WHERE sum(a.nodeId) > 3 RETURN a.name AS n"))
  }

  test("coalesce/CASE are string-typed through + (concat, not numeric null-out)") {
    val rows = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS name,
        |       coalesce(p.abstract, "?") + "/" + p.name AS tagged
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(
      ("P-alpha", "about dbs/P-alpha"),
      ("P-beta", "?/P-beta"),
      ("P-gamma", "graphs/P-gamma")))
    val cased = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"})
        |RETURN CASE WHEN p.abstract IS NULL THEN "none" ELSE p.abstract END + "!" AS t""".stripMargin)
      .collect().head.getString(0)
    assert(cased === "none!")
  }

  // ---- round 13: EXISTS inner WHERE, MERGE, path projections, degree
  // sugar, map-parameter anchors, rel-var reuse rejection ----

  test("EXISTS { pattern WHERE … }: inner predicates filter the pattern") {
    // writers of the paper whose abstract is "about dbs" (P-alpha)
    val semis = Planner.run(g,
      """MATCH (a:Author)
        |WHERE EXISTS { (a)-[w:WRITES]-(p:Paper) WHERE p.abstract = "about dbs" }
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(semis === Seq("Alice", "Bob"))
    // negated: the anti join over the same filtered pattern
    val anti = Planner.run(g,
      """MATCH (a:Author)
        |WHERE NOT EXISTS { (a)-[w:WRITES]-(p:Paper) WHERE p.abstract = "about dbs" }
        |RETURN a.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(anti === Seq("Carol"))
    // inner WHERE + disjunctive composition in one predicate (marker join)
    val composed = Planner.run(g,
      """MATCH (a:Author)
        |WHERE a.nodeId = 11 OR EXISTS { (a)-[w:WRITES]-(p:Paper) WHERE p.abstract = "graphs" }
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(composed === Seq("Bob", "Carol"))
    // round-trip: inner WHERE renders inside the braces
    val q = Parser.parse(
      """MATCH (a:Author) WHERE NOT EXISTS { (a)-[w:WRITES]-(p:Paper) WHERE p.abstract = "x" AND p.nodeId > 3 } RETURN a.name AS name""")
    val ep = q.preds.head.asInstanceOf[Ast.ExistsPat]
    assert(ep.negated && ep.preds.length === 2)
    assert(Parser.parse(q.render) === q)
    // nesting another EXISTS inside the inner WHERE is out of dialect
    val nested = intercept[Parser.ParseError](Parser.parse(
      """MATCH (a:Author) WHERE EXISTS { (a)-[w:WRITES]-(p:Paper) WHERE EXISTS { (p)-[c:CITES]-(q) } } RETURN a.name AS n"""))
    assert(nested.getMessage.contains("EXISTS inner"))
  }

  test("MERGE: ON MATCH updates in place, ON CREATE inserts, idempotent") {
    import graft.graph.PropertyGraph
    // update path: Alice exists → ON MATCH SET applies, count unchanged
    val updated = Planner.run(g,
      """MERGE (n:Author {nodeId: 10})
        |ON CREATE SET n.name = "nope"
        |ON MATCH SET n.name = "Alice2"""".stripMargin)
    assert(updated.count() === MicroGraph.nodeRows.length.toLong)
    val alice = updated.where("nodeId = 10").collect().head
    assert(alice.getAs[String]("name") === "Alice2")
    // create path: 99 absent → row appears with SET props, nulls elsewhere,
    // both labels (the loader's MERGE(n:{label}:_Entity_) shape)
    val created = Planner.run(g,
      """MERGE (n:Author {nodeId: 99})
        |ON CREATE SET n.name = "a", n.abstract = "fresh"
        |SET n.name = "Dave"""".stripMargin)
    assert(created.count() === MicroGraph.nodeRows.length + 1L)
    val dave = created.where("nodeId = 99").collect().head
    assert(dave.getAs[String]("name") === "Dave") // SET overwrites ON CREATE
    assert(dave.getAs[String]("abstract") === "fresh")
    assert(dave.getAs[String]("label") === "Author")
    assert(dave.getSeq[String](dave.fieldIndex("labels")) ===
      Seq("Author", "_Entity_"))
    assert(dave.isNullAt(dave.fieldIndex("nameEmbedding")))
    // idempotence: the same MERGE against the merged snapshot is a no-op
    val twice = Planner.run(PropertyGraph(created, g.rels),
      """MERGE (n:Author {nodeId: 99})
        |ON CREATE SET n.name = "a", n.abstract = "fresh"
        |SET n.name = "Dave"""".stripMargin)
    assert(twice.collect().map(_.toSeq).toSet ===
      created.collect().map(_.toSeq).toSet)
    // render ∘ parseMerge = id
    val mq = Parser.parseMerge(
      """MERGE (n:Author {nodeId: 7}) ON CREATE SET n.name = "x" ON MATCH SET n.abstract = "y" SET n.name = "z"""")
    assert(Parser.parseMerge(mq.render) === mq)
    // grammar-level rejections: label required, nodeId anchors, identity
    // columns and foreign variables un-SET-able
    intercept[Parser.ParseError](Parser.parseMerge(
      """MERGE (n {nodeId: 7}) SET n.name = "x""""))
    intercept[Parser.ParseError](Parser.parseMerge(
      """MERGE (n:Author {name: "Dave"}) SET n.abstract = "x""""))
    intercept[Parser.ParseError](Parser.parseMerge(
      """MERGE (n:Author {nodeId: 7}) SET n.nodeId = 9"""))
    intercept[Parser.ParseError](Parser.parseMerge(
      """MERGE (n:Author {nodeId: 7}) SET m.name = "x""""))
    // unknown property → plan-time error naming the union-of-keys schema
    intercept[IllegalArgumentException](Planner.run(g,
      """MERGE (n:Author {nodeId: 7}) SET n.missing = "x""""))
  }

  test("MERGE: parameter key and expression SET values (round 14)") {
    // the driver-API upsert: key from $id, values from $params and the
    // node's own pre-merge properties
    val updated = Planner.run(g,
      """MERGE (n:Author {nodeId: $id})
        |ON CREATE SET n.name = $nm
        |ON MATCH SET n.name = $nm + "#updated", n.abstract = n.name""".stripMargin,
      Map("id" -> 10, "nm" -> "Alice"))
    val alice = updated.where("nodeId = 10").collect().head
    assert(alice.getAs[String]("name") === "Alice#updated")
    // snapshot semantics: n.name read the PRE-merge value
    assert(alice.getAs[String]("abstract") === "Alice")
    // create path evaluates over the fresh (null except key) row
    val created = Planner.run(g,
      """MERGE (n:Author {nodeId: $id})
        |ON CREATE SET n.name = coalesce(n.name, $nm) + "!"""".stripMargin,
      Map("id" -> 77, "nm" -> "Grace"))
    assert(created.where("nodeId = 77").collect().head
      .getAs[String]("name") === "Grace!")
    // missing key parameter and foreign-variable reads fail clearly
    val miss = intercept[IllegalArgumentException](Planner.run(g,
      """MERGE (n:Author {nodeId: $id}) SET n.name = "x"""", Map.empty))
    assert(miss.getMessage.contains("missing parameter"))
    val foreign = intercept[IllegalArgumentException](Planner.run(g,
      """MERGE (n:Author {nodeId: 10}) SET n.name = m.name"""))
    assert(foreign.getMessage.contains("own"))
    // numeric→string stringifies losslessly (Neo4j's dynamically typed
    // property rendered into the union-of-keys string column)…
    val num = Planner.run(g,
      """MERGE (n:Author {nodeId: 10}) SET n.name = n.nodeId + 1""")
    assert(num.where("nodeId = 10").collect().head
      .getAs[String]("name") === "11")
    // …but a string value into a numeric column would silently null
    // under Spark's cast — rejected with a clear message instead
    val spark2 = g.nodes.sparkSession
    import spark2.implicits._
    val g2 = graft.graph.PropertyGraph(
      Seq((1L, "X", "a", 5L)).toDF("nodeId", "label", "name", "score"),
      Seq.empty[(String, Long, Long)].toDF("relType", "src", "dst"))
    val mism = intercept[IllegalArgumentException](Planner.run(g2,
      """MERGE (n:X {nodeId: 1}) SET n.score = "high""""))
    assert(mism.getMessage.contains("cannot be stored"))
    // render∘parse identity with a parameter key + expression values
    val mq = Parser.parseMerge(
      """MERGE (n:Author {nodeId: $id}) ON MATCH SET n.name = n.name + "!", n.abstract = $v""")
    assert(Parser.parseMerge(mq.render) === mq)
  }

  test("SET n += $props: map-merge update") {
    // listed keys overwrite, unlisted keep their values
    val out = Planner.runMutation(g,
      """MATCH (p:Paper {name: "P-alpha"}) SET p += $props""",
      Map("props" -> Map[String, Any]("abstract" -> "merged"))).nodes
    val r = out.where("nodeId = 20").collect().head
    assert(r.getAs[String]("abstract") === "merged")
    assert(r.getAs[String]("name") === "P-alpha") // unlisted key kept
    // explicit items AFTER the map win on the same key (left-to-right)
    val both = Planner.runMutation(g,
      """MATCH (p:Paper {name: "P-alpha"}) SET p += $props, p.abstract = "explicit"""",
      Map("props" -> Map[String, Any]("abstract" -> "fromMap"))).nodes
    assert(both.where("nodeId = 20").collect().head
      .getAs[String]("abstract") === "explicit")
    // identity keys in the map are rejected; so are unknown properties
    intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (p:Paper) SET p += $props""",
      Map("props" -> Map[String, Any]("nodeId" -> 9L))))
    intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (p:Paper) SET p += $props""",
      Map("props" -> Map[String, Any]("missing" -> "x"))))
    // a non-map parameter fails naming the parameter
    val bad = intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (p:Paper) SET p += $props""", Map("props" -> 5)))
    assert(bad.getMessage.contains("must be a map"))
    // render∘parse identity (the += item renders first)
    val u = Parser.parseMutation(
      """MATCH (p:Paper) WHERE p.abstract IS NULL SET p += $props, p.name = p.name + "!"""")
      .swap.getOrElse(fail("expected UpdateQuery"))
    assert(u.plusParam === Some("props") && u.sets.length === 1)
    assert(Parser.parseMutation(u.render) === Left(u))
    // a fractional map value keeps its double — the old Number arm
    // silently truncated 99.9 to 99 via longValue (advisor r14); storing
    // it into an INTEGRAL column is rejected, not truncated
    val dg = {
      import org.apache.spark.sql.SparkSession
      val s = SparkSession.active
      import s.implicits._
      graft.graph.PropertyGraph(
        Seq((1L, "Thing", "t1", 0.0, 7L))
          .toDF("nodeId", "label", "name", "score", "cnt"),
        Seq.empty[(String, Long, Long)].toDF("relType", "src", "dst"))
    }
    val dOut = Planner.runMutation(dg,
      """MATCH (p:Thing) SET p += $props""",
      Map("props" -> Map[String, Any]("score" -> 99.9))).nodes
    assert(dOut.collect().head.getAs[Double]("score") === 99.9)
    val trunc = intercept[IllegalArgumentException](Planner.runMutation(dg,
      """MATCH (p:Thing) SET p += $props""",
      Map("props" -> Map[String, Any]("cnt" -> 1.5))))
    assert(trunc.getMessage.contains("cannot be stored"))
    // a fractional BigDecimal (the default numeric of many JSON
    // deserializers) keeps its value too — the whole-valued check, not
    // a type check (review r15)
    val bdOut = Planner.runMutation(dg,
      """MATCH (p:Thing) SET p += $props""",
      Map("props" -> Map[String, Any]("score" -> new java.math.BigDecimal("42.5")))).nodes
    assert(bdOut.collect().head.getAs[Double]("score") === 42.5)
    // and a fractional BigDecimal LIMIT parameter is rejected, never
    // silently truncated
    val bdLim = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS n LIMIT $k""",
      Map("k" -> new java.math.BigDecimal("2.5"))).collect())
    assert(bdLim.getMessage.contains("fractional"))
  }

  test("SET n:Label / REMOVE n:Label: labels-array mutation (round 15)") {
    // SET appends absent labels in listed order; the primary `label`
    // column (the storage/merge key) stays fixed
    val g1 = Planner.runMutation(g,
      """MATCH (a:Author) WHERE a.name STARTS WITH "A" SET a:Flagged:Hot""")
    val alice = g1.nodes.where("nodeId = 10").collect().head
    assert(alice.getSeq[String](alice.fieldIndex("labels")) ===
      Seq("Author", "_Entity_", "Flagged", "Hot"))
    assert(alice.getAs[String]("label") === "Author")
    val bob = g1.nodes.where("nodeId = 11").collect().head
    assert(bob.getSeq[String](bob.fieldIndex("labels")) ===
      Seq("Author", "_Entity_"))
    // idempotent replay: byte-identical table
    val g2 = Planner.runMutation(g1,
      """MATCH (a:Author) WHERE a.name STARTS WITH "A" SET a:Flagged:Hot""")
    assert(g2.nodes.collect().toSet === g1.nodes.collect().toSet)
    // the added label is MATCHABLE: anchors and WHERE tests consult the
    // full labels set — but ONLY on a graph a label mutation touched
    // (review r15): the untouched graph keeps the PUSHABLE primary-label
    // equality as its anchor fast path
    assert(g1.labelsMutated && !g.labelsMutated)
    val mutatedPlan = Planner.run(g1,
      """MATCH (n:Author) RETURN n.name AS nm""")
      .queryExecution.optimizedPlan.toString
    val cleanPlan = Planner.run(g,
      """MATCH (n:Author) RETURN n.name AS nm""")
      .queryExecution.optimizedPlan.toString
    assert(mutatedPlan.contains("array_contains") &&
      !cleanPlan.contains("array_contains"))
    assert(Planner.run(g1,
      """MATCH (n:Flagged) RETURN n.name AS nm""").collect()
      .map(_.getString(0)).toSeq === Seq("Alice"))
    assert(Planner.run(g1,
      """MATCH (n:Author) WHERE n:Hot RETURN n.name AS nm""").collect()
      .map(_.getString(0)).toSeq === Seq("Alice"))
    // and the added label expands like any anchor (1-hop from it)
    assert(Planner.run(g1,
      """MATCH (n:Flagged)-[w:WRITES]-(p:Paper)
        |RETURN p.name AS nm ORDER BY nm""".stripMargin).collect()
      .map(_.getString(0)).toSeq === Seq("P-alpha", "P-beta"))
    // REMOVE drops a secondary label (absent label: no-op)
    val g3 = Planner.runMutation(g1,
      """MATCH (a:Author {name: "Alice"}) REMOVE a:Hot, a:Nope""")
    val alice3 = g3.nodes.where("nodeId = 10").collect().head
    assert(alice3.getSeq[String](alice3.fieldIndex("labels")) ===
      Seq("Author", "_Entity_", "Flagged"))
    // the primary label and the catch-all are NOT removable
    val prim = intercept[IllegalArgumentException](Planner.runMutation(g1,
      """MATCH (a:Author {name: "Alice"}) REMOVE a:Author"""))
    assert(prim.getMessage.contains("PRIMARY label"))
    intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (a:Author) SET a:_Entity_"""))
    // mixed SET: label item + property item in one statement
    val mixed = Planner.runMutation(g,
      """MATCH (a:Author {name: "Carol"}) SET a:Star, a.abstract = "x"""")
      .nodes.where("nodeId = 12").collect().head
    assert(mixed.getSeq[String](mixed.fieldIndex("labels")) ===
      Seq("Author", "_Entity_", "Star"))
    assert(mixed.getAs[String]("abstract") === "x")
    // render∘parse identity for both spellings
    val su = Parser.parseMutation(
      """MATCH (a:Author) SET a:Flagged, a:Hot, a.abstract = "y"""")
      .swap.getOrElse(fail("expected UpdateQuery"))
    assert(su.setLabels === Seq("Flagged", "Hot") && su.sets.length === 1)
    assert(Parser.parseMutation(su.render) === Left(su))
    val ru = Parser.parseMutation(
      """MATCH (a:Author) REMOVE a:Hot, a.abstract""")
      .swap.getOrElse(fail("expected UpdateQuery"))
    assert(ru.removeLabels === Seq("Hot") && ru.removes.length === 1)
    assert(Parser.parseMutation(ru.render) === Left(ru))
    // SET and REMOVE CHAIN in one statement (review r15): add one
    // label, drop another, write a property — one lakehouse merge
    val chained = Planner.runMutation(g1,
      """MATCH (a:Author {name: "Alice"})
        |SET a:Star, a.abstract = "chained" REMOVE a:Hot""".stripMargin)
      .nodes.where("nodeId = 10").collect().head
    assert(chained.getSeq[String](chained.fieldIndex("labels")) ===
      Seq("Author", "_Entity_", "Flagged", "Star"))
    assert(chained.getAs[String]("abstract") === "chained")
    // REMOVE outranks SET on the same property (clause order)
    val srem = Planner.runMutation(g,
      """MATCH (a:Author {name: "Bob"})
        |SET a.abstract = "x" REMOVE a.abstract""".stripMargin)
      .nodes.where("nodeId = 11").collect().head
    assert(srem.isNullAt(srem.fieldIndex("abstract")))
    // the mixed AST renders BOTH tails and round-trips
    val mix = Parser.parseMutation(
      """MATCH (a:Author) SET a:Star REMOVE a:Hot, a.abstract""")
      .swap.getOrElse(fail("expected UpdateQuery"))
    assert(mix.setLabels === Seq("Star") && mix.removeLabels === Seq("Hot"))
    assert(Parser.parseMutation(mix.render) === Left(mix))
  }

  test("bulk UNWIND MERGE: one changelog frame, both paths") {
    // the loader idiom: two updates + one insert in ONE statement —
    // matched keys re-project, absent keys create, one lakehouse merge
    val rows = Seq(
      Map[String, Any]("id" -> 10L, "nm" -> "Alice*"),
      Map[String, Any]("id" -> 11L, "nm" -> "Bob*"),
      Map[String, Any]("id" -> 55L, "nm" -> "Heidi"))
    val out = Planner.run(g,
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id})
        |ON CREATE SET n.name = r.nm, n.abstract = "fresh"
        |ON MATCH SET n.name = r.nm + "!"""".stripMargin,
      Map("rows" -> rows))
    assert(out.count() === MicroGraph.nodeRows.length + 1L)
    val byId = out.where(col("nodeId").isin(10L, 11L, 55L))
      .collect().map(x => x.getAs[Long]("nodeId") ->
        (x.getAs[String]("name"), x.getAs[String]("abstract"))).toMap
    assert(byId(10L) === (("Alice*!", null)))
    assert(byId(11L) === (("Bob*!", null)))
    assert(byId(55L) === (("Heidi", "fresh")))
    val heidi = out.where("nodeId = 55").collect().head
    assert(heidi.getAs[String]("label") === "Author")
    assert(heidi.getSeq[String](heidi.fieldIndex("labels")) ===
      Seq("Author", "_Entity_"))
    // idempotence of a pure-create replay: re-running against the merged
    // snapshot updates in place (55 now matches), no second insert
    val twice = Planner.run(graft.graph.PropertyGraph(out, g.rels),
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id})
        |ON CREATE SET n.name = r.nm, n.abstract = "fresh"
        |ON MATCH SET n.name = r.nm + "!"""".stripMargin,
      Map("rows" -> rows))
    assert(twice.count() === out.count())
    assert(twice.where("nodeId = 55").collect().head
      .getAs[String]("name") === "Heidi!")
    // duplicate keys within one batch are ambiguous → clear error
    val dup = intercept[IllegalArgumentException](Planner.run(g,
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id}) SET n.name = r.nm""",
      Map("rows" -> Seq(Map[String, Any]("id" -> 1L, "nm" -> "a"),
        Map[String, Any]("id" -> 1L, "nm" -> "b")))))
    assert(dup.getMessage.contains("duplicate"))
    // a SET reading a field absent from every row fails clearly
    val absent = intercept[IllegalArgumentException](Planner.run(g,
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id}) SET n.name = r.nope""",
      Map("rows" -> rows)))
    assert(absent.getMessage.contains("absent from every row"))
  }

  test("bulk MERGE: a 5000-row batch is one changelog merge") {
    // the 100 TB contract made concrete: a 5000-key batch (mixed
    // updates + inserts) runs through the SAME single-merge plan as one
    // row — no per-row loop, no per-row jobs
    val rows = (0 until 5000).map { i =>
      Map[String, Any]("id" -> (1000L + i), "nm" -> s"N$i")
    } ++ Seq(Map[String, Any]("id" -> 10L, "nm" -> "AliceB"))
    val out = Planner.run(g,
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id})
        |ON CREATE SET n.name = r.nm
        |ON MATCH SET n.name = r.nm + "#u"""".stripMargin,
      Map("rows" -> rows))
    assert(out.count() === MicroGraph.nodeRows.length + 5000L)
    assert(out.where("nodeId = 10").collect().head
      .getAs[String]("name") === "AliceB#u")
    assert(out.where("nodeId = 5999").collect().head
      .getAs[String]("name") === "N4999")
    assert(out.where(col("label") === "Author").count() === 5003L)
  }

  test("bulk UNWIND CREATE and the FOREACH sugar") {
    val rows = Seq(
      Map[String, Any]("id" -> 70L, "nm" -> "N70"),
      Map[String, Any]("id" -> 71L, "nm" -> "N71"))
    val out = Planner.run(g,
      """UNWIND $rows AS r CREATE (n:Author {nodeId: r.id}) SET n.name = r.nm""",
      Map("rows" -> rows))
    assert(out.count() === MicroGraph.nodeRows.length + 2L)
    assert(out.where("nodeId = 71").collect().head
      .getAs[String]("name") === "N71")
    // the S2 constraint: an existing key fails the whole batch
    val clash = intercept[IllegalArgumentException](Planner.run(g,
      """UNWIND $rows AS r CREATE (n:Author {nodeId: r.id})""",
      Map("rows" -> Seq(Map[String, Any]("id" -> 10L)))))
    assert(clash.getMessage.contains("unique-key"))
    // FOREACH is parse-level sugar onto the same lowering
    val fe = Planner.run(g,
      """FOREACH (r IN $rows | MERGE (n:Author {nodeId: r.id}) SET n.name = r.nm)""",
      Map("rows" -> rows))
    assert(fe.count() === MicroGraph.nodeRows.length + 2L)
    assert(fe.where("nodeId = 70").collect().head
      .getAs[String]("name") === "N70")
    // render∘parse identity for both spellings
    val bu = Parser.parseBulkUpsert(
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id}) ON CREATE SET n.name = r.nm SET n.abstract = r.nm + "?"""")
    assert(Parser.parseBulkUpsert(bu.render) === bu)
    val ff = Parser.parseBulkUpsert(
      """FOREACH (r IN $rows | CREATE (n:Author {nodeId: r.id}) SET n.name = r.nm)""")
    assert(ff.foreach && ff.create)
    assert(Parser.parseBulkUpsert(ff.render) === ff)
    // CREATE takes plain SET only
    intercept[Parser.ParseError](Parser.parseBulkUpsert(
      """UNWIND $rows AS r CREATE (n:Author {nodeId: r.id}) ON MATCH SET n.name = "x""""))
  }

  test("bulk UNWIND over an EMPTY batch is a zero-row no-op (advisor r14)") {
    // a loader that slices batches hits an empty final slice — Neo4j's
    // UNWIND over [] produces zero rows and the statement no-ops; the
    // graph comes back byte-identical, never an error
    val nodesOut = Planner.run(g,
      """UNWIND $rows AS r MERGE (n:Author {nodeId: r.id})
        |SET n.name = r.nm""".stripMargin,
      Map("rows" -> Seq.empty[Map[String, Any]]))
    assert(nodesOut.collect().toSet === g.nodes.collect().toSet)
    val createOut = Planner.run(g,
      """UNWIND $rows AS r CREATE (n:Author {nodeId: r.id})""",
      Map("rows" -> Seq.empty[Map[String, Any]]))
    assert(createOut.count() === g.nodes.count())
    val relsOut = Planner.run(g,
      """UNWIND $pairs AS pr
        |MATCH (src:Author {nodeId: pr[0]})
        |MATCH (tgt:Paper {nodeId: pr[1]})
        |MERGE (src)-[:WRITES]->(tgt)""".stripMargin,
      Map("pairs" -> Seq.empty[Seq[Long]]))
    assert(relsOut.collect().toSet === g.rels.collect().toSet)
  }

  test("bulk UNWIND relationship MERGE: the loader's edge statement") {
    // existing edge → no-op; new pair → one insert; missing endpoint →
    // silently dropped (MATCH-then-MERGE, like the reference's per-row
    // statement); duplicate batch pairs collapse to one insert
    val out = Planner.run(g,
      """UNWIND $pairs AS pr
        |MATCH (src:Author {nodeId: pr[0]})
        |MATCH (tgt:Paper {nodeId: pr[1]})
        |MERGE (src)-[:WRITES]->(tgt)""".stripMargin,
      Map("pairs" -> Seq(Seq(10L, 20L), Seq(11L, 22L), Seq(11L, 22L),
        Seq(99L, 21L))))
    assert(out.count() === g.rels.count() + 1)
    assert(out.where(col("relType") === "WRITES" && col("src") === 11L &&
      col("dst") === 22L).count() === 1L)
    // idempotent replay against the merged graph
    val g2 = graft.graph.PropertyGraph(g.nodes, out)
    val twice = Planner.run(g2,
      """UNWIND $pairs AS pr
        |MATCH (src:Author {nodeId: pr[0]})
        |MATCH (tgt:Paper {nodeId: pr[1]})
        |MERGE (src)-[:WRITES]->(tgt)""".stripMargin,
      Map("pairs" -> Seq(Seq(11L, 22L))))
    assert(twice.count() === out.count())
    // CREATE appends unconditionally (parallel edges) and needs an arrow
    val created = Planner.run(g,
      """UNWIND $pairs AS pr
        |MATCH (src:Author {nodeId: pr[0]})
        |MATCH (tgt:Paper {nodeId: pr[1]})
        |CREATE (src)-[:WRITES]->(tgt)""".stripMargin,
      Map("pairs" -> Seq(Seq(10L, 20L))))
    assert(created.count() === g.rels.count() + 1) // parallel to e4
    intercept[Parser.ParseError](Parser.parseBulkRel(
      """UNWIND $pairs AS pr MATCH (src:Author {nodeId: pr[0]}) MATCH (tgt:Paper {nodeId: pr[1]}) CREATE (src)-[:WRITES]-(tgt)"""))
    // render∘parse identity; the swapped spelling canonicalizes
    val b = Parser.parseBulkRel(
      """UNWIND $pairs AS pr MATCH (src:_Entity_ {nodeId: pr[0]}) MATCH (tgt:_Entity_ {nodeId: pr[1]}) MERGE (src)-[:CITES]->(tgt)""")
    assert(Parser.parseBulkRel(b.render) === b)
    val swapped = Parser.parseBulkRel(
      """UNWIND $pairs AS pr MATCH (src:_Entity_ {nodeId: pr[0]}) MATCH (tgt:_Entity_ {nodeId: pr[1]}) MERGE (tgt)<-[:CITES]-(src)""")
    assert(swapped === b) // same edge, canonical orientation
    // a malformed pair list fails clearly
    val bad = intercept[IllegalArgumentException](Planner.run(g,
      """UNWIND $pairs AS pr MATCH (src:Author {nodeId: pr[0]}) MATCH (tgt:Paper {nodeId: pr[1]}) MERGE (src)-[:WRITES]->(tgt)""",
      Map("pairs" -> Seq(Seq(1L)))))
    assert(bad.getMessage.contains("2-integer pair"))
  }

  test("bulk rel MERGE: a 10000-pair batch is one frame") {
    // grow the graph with 200 authors + 50 papers, then wire 10000
    // (author, paper) pairs in ONE statement — same plan as one pair
    val spark2 = g.nodes.sparkSession
    import spark2.implicits._
    val extraAuthors = (0 until 200).map(i =>
      (2000L + i, "Author", s"A$i", None: Option[String]))
    val extraPapers = (0 until 50).map(i =>
      (3000L + i, "Paper", s"PP$i", None: Option[String]))
    import org.apache.spark.sql.functions.{array, lit}
    val nodes2 = (MicroGraph.nodeRows ++ extraAuthors ++ extraPapers)
      .toDF("nodeId", "label", "name", "abstract")
      .withColumn("labels", array(col("label"), lit("_Entity_")))
      .withColumn("nameEmbedding", lit(null).cast("array<double>"))
    val g2 = graft.graph.PropertyGraph(nodes2, g.rels)
    val pairs = (0 until 10000).map(i =>
      Seq(2000L + i % 200, 3000L + i % 50))
    // 10000 pairs but only lcm-bounded DISTINCT (a,b) combos: i%200 and
    // i%50 repeat together every 200 → 200 distinct pairs
    val out = Planner.run(g2,
      """UNWIND $pairs AS pr
        |MATCH (src:Author {nodeId: pr[0]})
        |MATCH (tgt:Paper {nodeId: pr[1]})
        |MERGE (src)-[:WROTE]->(tgt)""".stripMargin,
      Map("pairs" -> pairs))
    assert(out.where(col("relType") === "WROTE").count() === 200L)
    assert(out.count() === g.rels.count() + 200L)
  }

  test("DETACH DELETE removes the node and every incident relationship") {
    val pg = Planner.runDelete(g,
      """MATCH (a:Author {name: "Alice"}) DETACH DELETE a""")
    assert(pg.nodes.count() === MicroGraph.nodeRows.length - 1L)
    assert(pg.nodes.where("nodeId = 10").isEmpty)
    // e1, e4, e5, e12 all touch Alice — 13 rels drop to 9
    assert(pg.rels.count() === MicroGraph.relRows.length - 4L)
    assert(pg.rels.where("src = 10 OR dst = 10").isEmpty)
    // WHERE takes the full grammar — EXISTS included
    val viaExists = Planner.runDelete(g,
      """MATCH (p:Paper)
        |WHERE EXISTS { (p)-[c:CITES]-(q:Paper) }
        |DETACH DELETE p""".stripMargin)
    // P-alpha and P-gamma go (citation edges); P-beta survives
    assert(viaExists.nodes.where("label = 'Paper'").collect()
      .map(_.getAs[String]("name")).toSeq === Seq("P-beta"))
    // plain DELETE refuses a node that still has relationships …
    val err = intercept[IllegalArgumentException](Planner.runDelete(g,
      """MATCH (a:Author {name: "Alice"}) DELETE a"""))
    assert(err.getMessage.contains("DETACH DELETE"))
    // … but deletes an isolated node (the Café pair has no edges)
    val iso = Planner.runDelete(g,
      """MATCH (x:Entity {nodeId: 40}) DELETE x""")
    assert(iso.nodes.count() === MicroGraph.nodeRows.length - 1L)
    assert(iso.rels.count() === MicroGraph.relRows.length.toLong)
    // Planner.run on the same text returns the post-delete NODES table
    assert(Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) DETACH DELETE a""").count() ===
      MicroGraph.nodeRows.length - 1L)
    // render ∘ parseDelete = id
    val dq = Parser.parseDelete(
      """MATCH (s:Author) WHERE s.nodeId >= 11 AND EXISTS { (s)-[w:WRITES]-(p:Paper) } DETACH DELETE s""")
    assert(Parser.parseDelete(dq.render) === dq)
    // grammar: single-node pattern only, DELETE names the matched var
    intercept[Parser.ParseError](Parser.parseDelete(
      "MATCH (a:Author)-[w:WRITES]-(p) DETACH DELETE p"))
    intercept[Parser.ParseError](Parser.parseDelete(
      "MATCH (a:Author) DETACH DELETE b"))
  }

  test("nodes(p)/relationships(p): traversal-ordered path projections") {
    // fixed 1-hop: every typed walk out of Alice
    val rows = Planner.run(g,
      """MATCH p = (a:Author {name: "Alice"})-[w:WRITES]-(x:Paper)
        |RETURN nodes(p) AS ns, relationships(p) AS rs""".stripMargin)
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[String](1))).toSet
    assert(rows === Set(
      (Seq(10L, 20L), Seq("WRITES")),
      (Seq(10L, 21L), Seq("WRITES"))))
    // var-length: the lists grow with the expansion, anon hops included
    val vl = Planner.run(g,
      """MATCH p = (i:Institution {name: "MIT"})-[*1..2]-(x)
        |RETURN DISTINCT nodes(p) AS ns""".stripMargin)
      .collect().map(_.getSeq[Long](0)).toSet
    assert(vl === Set(
      Seq(1L, 10L), Seq(1L, 11L),
      Seq(1L, 10L, 20L), Seq(1L, 10L, 21L), Seq(1L, 11L, 20L)))
    // multi-path: each named path projects its own lists
    val two = Planner.run(g,
      """MATCH p1 = (a:Author {name: "Carol"})-[w:WRITES]-(x:Paper), p2 = (x)-[h:HAS_TOPIC]-(f:FieldOfStudy)
        |RETURN nodes(p1) AS n1, nodes(p2) AS n2, relationships(p2) AS r2""".stripMargin)
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1), r.getSeq[String](2)))
    assert(two.toSeq === Seq((Seq(12L, 22L), Seq(22L, 30L), Seq("HAS_TOPIC"))))
    // unknown path variable → grammar-level error
    val unknown = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH p = (a:Author)-[w:WRITES]-(x:Paper) RETURN nodes(q) AS ns"""))
    assert(unknown.getMessage.contains("does not name a path"))
    // round-trip: the path name renders back in front of its pattern
    val q = Parser.parse(
      """MATCH p = (a:Author)-[w:WRITES]-(x:Paper) RETURN nodes(p) AS ns, relationships(p) AS rs""")
    assert(q.paths.head.name === Some("p"))
    assert(Parser.parse(q.render) === q)
  }

  test("shortestPath nodes(p): deterministic min-predecessor walk") {
    // MIT → Databases: min distance 3; at every backward level the
    // smallest-nodeId predecessor wins → [1, 10, 20, 30]
    val row = Planner.run(g,
      """MATCH pp = shortestPath((i:Institution {name: "MIT"})-[*1..4]-(f:FieldOfStudy))
        |RETURN nodes(pp) AS ns, length(pp) AS len""".stripMargin)
      .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
    assert(row.toSeq === Seq((Seq(1L, 10L, 20L, 30L), 3L)))
    // relationships(pp) (round 16): the per-hop relType list derives
    // from the SAME min-predecessor walk — each hop carries the MINIMUM
    // relType among the pair's eligible edges, so the 10–20 parallel
    // pair (WRITES e4 / REVIEWS e12) deterministically picks REVIEWS
    val rels = Planner.run(g,
      """MATCH pp = shortestPath((i:Institution {name: "MIT"})-[*1..4]-(f:FieldOfStudy))
        |RETURN nodes(pp) AS ns, relationships(pp) AS rs""".stripMargin)
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[String](1)))
    assert(rels.toSeq === Seq((Seq(1L, 10L, 20L, 30L),
      Seq("AFFILIATED_WITH", "REVIEWS", "HAS_TOPIC"))))
    // a TYPE-constrained traversal restricts the witness to eligible
    // edges: over WRITES|HAS_TOPIC the 10–20 hop must report WRITES
    // (REVIEWS is not walkable), and the path re-routes from MIT's
    // authors only through papers
    val typed = Planner.run(g,
      """MATCH pp = shortestPath((a:Author {name: "Alice"})-[:WRITES|HAS_TOPIC*1..3]-(f:FieldOfStudy))
        |RETURN relationships(pp) AS rs, length(pp) AS len""".stripMargin)
      .collect().map(r => (r.getSeq[String](0), r.getLong(1)))
    assert(typed.toSeq === Seq((Seq("WRITES", "HAS_TOPIC"), 2L)))
    // lo = 0: the zero-length path has an empty relationship list
    val zero = Planner.run(g,
      """MATCH pp = shortestPath((i:Institution {name: "MIT"})-[*0..1]-(x:Institution))
        |RETURN x.name AS n, relationships(pp) AS rs""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(zero.toSeq === Seq(("MIT", Seq.empty[String])))
    // allShortestPaths: every forked walk carries its own hop list
    val allr = Planner.run(g,
      """MATCH pp = allShortestPaths((i:Institution {name: "MIT"})-[*1..2]-(p:Paper))
        |RETURN nodes(pp) AS ns, relationships(pp) AS rs""".stripMargin)
      .collect().map(r => (r.getSeq[Long](0), r.getSeq[String](1))).toSet
    // MIT—Alice—{P-alpha,P-beta}, MIT—Bob—P-alpha: the parallel
    // Alice—P-alpha edge pair (e4 WRITES / e12 REVIEWS) forks TWO paths
    // over the same node walk — four relationship sequences in all
    assert(allr === Set(
      (Seq(1L, 10L, 20L), Seq("AFFILIATED_WITH", "WRITES")),
      (Seq(1L, 10L, 20L), Seq("AFFILIATED_WITH", "REVIEWS")),
      (Seq(1L, 10L, 21L), Seq("AFFILIATED_WITH", "WRITES")),
      (Seq(1L, 11L, 20L), Seq("AFFILIATED_WITH", "WRITES"))))
  }

  test("degree sugar: count { (n)-[:T]-(:L) } / size((n)--())") {
    // per-author WRITES degree and total degree (self-loops once; Alice
    // carries the parallel e4/e12 pair → total 4)
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name, count { (a)-[:WRITES]-() } AS w,
        |       size((a)-[]-()) AS deg
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq(
      ("Alice", 2L, 4L), ("Bob", 1L, 2L), ("Carol", 1L, 2L)))
    // far-label filter: P-alpha touches authors via e4, e6, e12
    val far = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |RETURN count { (p)-[]-(:Author) } AS n_auth""".stripMargin)
      .collect().head.getLong(0)
    assert(far === 3L)
    // directed degrees traverse ONE stored orientation; the undirected
    // form counts the self-loop ONCE (P-gamma: e11 out, e13 self)
    val dirRows = Planner.run(g,
      """MATCH (p:Paper {name: "P-gamma"})
        |RETURN count { (p)-[:CITES]->() } AS out_d,
        |       count { (p)<-[:CITES]-() } AS in_d,
        |       size((p)-[:CITES]-()) AS und""".stripMargin)
      .collect().head
    assert((dirRows.getLong(0), dirRows.getLong(1), dirRows.getLong(2)) ===
      ((2L, 1L, 2L)))
    // zero-degree nodes coalesce to 0, never null (left join miss)
    val zero = Planner.run(g,
      """MATCH (f:FieldOfStudy)
        |RETURN f.name AS name, count { (f)-[:WRITES]-() } AS w""".stripMargin)
      .collect().head
    assert((zero.getString(0), zero.getLong(1)) === (("Databases", 0L)))
    // degree in WHERE (the profiling one-liner)
    val prolific = Planner.run(g,
      """MATCH (a:Author) WHERE count { (a)-[:WRITES]-() } >= 2
        |RETURN a.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(prolific === Seq("Alice"))
    // both spellings are ONE AST; canonical render is the count{} form
    val c = Parser.parse("MATCH (a:Author) RETURN count { (a)-[:WRITES]-() } AS w")
    val s = Parser.parse("MATCH (a:Author) RETURN size((a)-[:WRITES]-()) AS w")
    assert(c === s)
    assert(Parser.parse(c.render) === c)
    // size((x)) of a parenthesized NON-pattern still parses as string size
    val sz = Parser.parse("MATCH (a:Author) RETURN size((a.name)) AS n")
    assert(sz.items.head.expr === Ast.ScalarFn("size", Seq(Ast.PropRef("a", "name"))))
    // degree patterns cannot bind a rel var or range
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) RETURN count { (a)-[r:WRITES]-() } AS w"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author) RETURN count { (a)-[:WRITES*1..2]-() } AS w"))
    // unbound variable → plan-entry error
    intercept[IllegalArgumentException](Planner.run(g,
      "MATCH (a:Author) RETURN count { (z)-[:WRITES]-() } AS w"))
  }

  test("map-parameter anchors: (n {name: $param}) ≡ the literal anchor") {
    val lit = Planner.run(g,
      """MATCH (x {name: "Alice"})-[r]-(y) RETURN count(*) AS n""")
      .collect().head.getLong(0)
    val par = Planner.run(g,
      """MATCH (x {name: $who})-[r]-(y) RETURN count(*) AS n""",
      Map("who" -> "Alice")).collect().head.getLong(0)
    assert(par === lit && par === 4L)
    // integer parameters anchor nodeId the same way
    val byId = Planner.run(g,
      """MATCH (x {nodeId: $id})-[r]-(y) RETURN count(*) AS n""",
      Map("id" -> 10L)).collect().head.getLong(0)
    assert(byId === 4L)
    // missing / mistyped parameters fail with the parameter's name
    val missing = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (x {name: $who})-[r]-(y) RETURN count(*) AS n""").collect())
    assert(missing.getMessage.contains("$who"))
    // round-trip keeps the $param spelling
    val q = Parser.parse("""MATCH (x:Author {name: $who})-[r:WRITES]-(y) RETURN y.name AS n""")
    assert(q.paths.head.nodes.head.anchorValue === Some(Ast.ParamRef("who")))
    assert(Parser.parse(q.render) === q)
    // scalar-parameter comparisons in WHERE — the anchor's WHERE twin
    val cmp = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WHERE a.name = $who AND p.nodeId >= $minId
        |RETURN p.name AS name ORDER BY name""".stripMargin,
      Map("who" -> "Alice", "minId" -> 21L))
      .collect().map(_.getString(0)).toSeq
    assert(cmp === Seq("P-beta"))
    val qw = Parser.parse(
      """MATCH (a:Author) WHERE a.nodeId >= $minId RETURN a.name AS n""")
    assert(qw.preds.head === Ast.PropCmp("a", "nodeId", ">=", Ast.ParamRef("minId")))
    assert(Parser.parse(qw.render) === qw)
  }

  test("ORDER BY an unprojected property; min/max over expressions") {
    // hidden sort column: order by the author's id without returning it
    val byId = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |RETURN p.name AS pname ORDER BY a.nodeId DESC, pname LIMIT 2""".stripMargin)
    assert(byId.columns.toSeq === Seq("pname")) // the hidden column dropped
    assert(byId.collect().map(_.getString(0)).toSeq ===
      Seq("P-gamma", "P-alpha"))
    // general expression arguments to min/max (the v.prop form keeps its
    // historical AST node and render)
    val mm = Planner.run(g,
      """MATCH (a:Author)
        |RETURN min(a.nodeId * 2) AS mn, max(a.nodeId % 4) AS mx,
        |       min(a.name) AS first""".stripMargin)
      .collect().head
    assert((mm.getLong(0), mm.getLong(1), mm.getString(2)) ===
      ((20L, 3L, "Alice")))
    val q = Parser.parse(
      "MATCH (a:Author) RETURN min(a.nodeId * 2) AS mn, max(a.name) AS mx")
    assert(q.items.head.expr ===
      Ast.AggFn("min", Ast.BinOp("*", Ast.PropRef("a", "nodeId"), Ast.LongLitE(2L))))
    assert(q.items(1).expr === Ast.MinMaxProp("max", "a", "name"))
    assert(Parser.parse(q.render) === q)
  }

  test("IN $param membership works on any property (not just nodeId)") {
    val in = Planner.run(g,
      """MATCH (a:Author) WHERE a.name IN $names
        |RETURN a.name AS name ORDER BY name""".stripMargin,
      Map("names" -> Seq("Alice", "Carol", "Nobody")))
      .collect().map(_.getString(0)).toSeq
    assert(in === Seq("Alice", "Carol"))
    val notIn = Planner.run(g,
      """MATCH (a:Author) WHERE NOT a.name IN $names
        |RETURN a.name AS name""".stripMargin,
      Map("names" -> Seq("Alice", "Carol")))
      .collect().map(_.getString(0)).toSeq
    assert(notIn === Seq("Bob"))
    // typed membership: an integer-list parameter cannot test a string
    val typeErr = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author) WHERE a.name IN $ids RETURN a.name AS name""",
      Map("ids" -> Seq(1L, 2L))).collect())
    assert(typeErr.getMessage.contains("typed"))
    // round-trips: the general form re-parses as InParam; the historical
    // `NOT v.nodeId IN $param` spelling keeps its own AST node
    val q = Parser.parse(
      """MATCH (a:Author) WHERE a.name IN $names AND NOT a.nodeId IN $found RETURN a.name AS name""")
    assert(q.preds === Seq(
      Ast.InParam(Ast.PropRef("a", "name"), "names", negated = false),
      Ast.NotIdIn("a", "found")))
    assert(Parser.parse(q.render) === q)
  }

  test("multi-property map anchors: every pair is one more equality") {
    val hit = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha", abstract: "about dbs"})
        |RETURN p.nodeId AS id""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(hit === Seq(20L))
    // a mismatching second pair empties the anchor
    assert(Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha", abstract: "graphs"})
        |RETURN p.nodeId AS id""".stripMargin).isEmpty)
    // parameters are legal in any pair
    val byParam = Planner.run(g,
      """MATCH (p:Paper {name: $nm, nodeId: $id}) RETURN p.nodeId AS id""",
      Map("nm" -> "P-gamma", "id" -> 22L))
      .collect().map(_.getLong(0)).toSeq
    assert(byParam === Seq(22L))
    // round-trip keeps all pairs in order
    val q = Parser.parse(
      """MATCH (p:Paper {name: "x", nodeId: 5, abstract: $a}) RETURN p.name AS n""")
    val n0 = q.paths.head.nodes.head
    assert(n0.anchorProp === Some("name") &&
      n0.extraAnchors === Seq(("nodeId", Ast.LongLit(5L)),
        ("abstract", Ast.ParamRef("a"))))
    assert(Parser.parse(q.render) === q)
    // only the FIRST pair may reference an UNWIND variable
    intercept[Parser.ParseError](Parser.parse(
      """UNWIND $xs AS u MATCH (p:Paper {name: "x", nodeId: u}) RETURN p.name AS n"""))
  }

  test("relationship variable reuse is rejected at plan entry (r12 ADVICE)") {
    val dup = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[r]-(p:Paper), (b:Author)-[r]-(q:Paper)
        |RETURN a.name AS name""".stripMargin))
    assert(dup.getMessage.contains("relationship variable reuse"))
    // within one path too
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[r]-(p:Paper)-[r]-(b) RETURN a.name AS name"""))
    // and across MATCH → OPTIONAL MATCH (shared resolution space)
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[r]-(p:Paper) OPTIONAL MATCH (p)-[r]-(f:FieldOfStudy)
        |RETURN a.name AS name""".stripMargin))
    // DISTINCT node vars stay fine (the legal re-binding join)
    assert(Planner.run(g,
      """MATCH (a:Author)-[r1]-(p:Paper), (p)-[r2:HAS_TOPIC]-(f)
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0) > 0)
  }

  test("list functions over a collected alias: head/last/tail/size/" +
    "index/slice/reverse") {
    // Alice writes P-alpha and P-beta; collect(DISTINCT) canonicalizes
    // to the sorted list ["P-alpha", "P-beta"]
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH a.name AS author, collect(DISTINCT p.name) AS ps
        |RETURN author, head(ps) AS h, last(ps) AS l, tail(ps) AS t,
        |       size(ps) AS n, ps[0] AS i0, ps[-1] AS iNeg, ps[1..] AS sl,
        |       ps[0..99] AS clamped, reverse(ps) AS rev, ps[5] AS oob"""
        .stripMargin).collect().head
    assert(row.getString(1) === "P-alpha")        // head
    assert(row.getString(2) === "P-beta")         // last
    assert(row.getSeq[String](3) === Seq("P-beta")) // tail
    assert(row.getLong(4) === 2L)                 // size
    assert(row.getString(5) === "P-alpha")        // [0]
    assert(row.getString(6) === "P-beta")         // [-1]
    assert(row.getSeq[String](7) === Seq("P-beta"))  // [1..]
    assert(row.getSeq[String](8) === Seq("P-alpha", "P-beta")) // clamp
    assert(row.getSeq[String](9) === Seq("P-beta", "P-alpha")) // reverse
    assert(row.isNullAt(10))                      // out of range → null
  }

  test("list literal, negative slice, and empty-list edge cases") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Carol"})
        |RETURN ["x", a.name, "z"] AS l3, [1, 2, 3][-2..] AS tail2,
        |       CASE WHEN head([]) IS NULL THEN 1 ELSE 0 END AS emptyHead,
        |       size([]) AS emptySize""".stripMargin).collect().head
    assert(row.getSeq[String](0) === Seq("x", "Carol", "z"))
    assert(row.getSeq[Long](1) === Seq(2L, 3L))
    assert(row.getLong(2) === 1L)
    assert(row.getLong(3) === 0L)
  }

  test("reduce fold and general list comprehensions (WHERE / | / both)") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH collect(DISTINCT p.name) AS ps
        |RETURN reduce(acc = "", x IN ps | acc + "|" + x) AS joined,
        |       reduce(acc = 0, x IN ps | acc + size(x)) AS totalLen,
        |       [x IN ps WHERE x ENDS WITH "beta"] AS onlyBeta,
        |       [x IN ps | toUpper(x)] AS upped,
        |       [x IN ps WHERE x CONTAINS "alpha" | size(x)] AS lens"""
        .stripMargin).collect().head
    assert(row.getString(0) === "|P-alpha|P-beta")
    assert(row.getLong(1) === 13L) // 7 + 6
    assert(row.getSeq[String](2) === Seq("P-beta"))
    assert(row.getSeq[String](3) === Seq("P-ALPHA", "P-BETA"))
    assert(row.getSeq[Long](4) === Seq(7L))
  }

  test("lambda variables shadow outer columns and unbind after the body") {
    // `x` is ALSO a carried scalar; inside the comprehension it must be
    // the lambda element, outside it stays the carried column
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH a.name AS x, collect(DISTINCT p.name) AS ps
        |RETURN x, [x IN ps | x] AS elems""".stripMargin).collect().head
    assert(row.getString(0) === "Alice")
    assert(row.getSeq[String](1) === Seq("P-alpha", "P-beta"))
  }

  test("range / split / left / right / ltrim / rtrim / toBoolean scalars") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})
        |RETURN range(1, 7, 2) AS r, split("a|b|c", "|") AS parts,
        |       left(a.name, 2) AS l2, right(a.name, 2) AS r2,
        |       ltrim("  x ") AS lt, rtrim(" x  ") AS rt,
        |       toBoolean("true") AS tb, reverse("abc") AS rs"""
        .stripMargin).collect().head
    assert(row.getSeq[Long](0) === Seq(1L, 3L, 5L, 7L))
    assert(row.getSeq[String](1) === Seq("a", "b", "c"))
    assert(row.getString(2) === "Bo" && row.getString(3) === "ob")
    assert(row.getString(4) === "x " && row.getString(5) === " x")
    assert(row.getBoolean(6) === true)
    assert(row.getString(7) === "cba")
  }

  test("UNWIND range(…) expands to the literal anchor form") {
    val rows = Planner.run(g,
      """UNWIND range(10, 12) AS nid
        |MATCH (a:Author {nodeId: nid})
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("Alice", "Bob", "Carol"))
    intercept[Parser.ParseError](
      Parser.parse("UNWIND range(1, 200000) AS i MATCH (a) RETURN a.name"))
    intercept[Parser.ParseError](
      Parser.parse("UNWIND range(1, 5, 0) AS i MATCH (a) RETURN a.name"))
  }

  test("integer-division typing flows through list folds and indexing") {
    // reduce over longs stays integral → Cypher integer division
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH collect(DISTINCT p.nodeId) AS ids
        |RETURN reduce(acc = 0, x IN ids | acc + x) / 2 AS halfSum,
        |       ids[0] / 2 AS halfFirst""".stripMargin).collect().head
    assert(row.getLong(0) === 20L) // (20 + 21) / 2 = 20 truncated
    assert(row.getLong(1) === 10L)
  }

  test("string conditions inside CASE WHEN (StrCond)") {
    val rows = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS name,
        |       CASE WHEN p.name ENDS WITH "beta" THEN "B"
        |            WHEN p.name CONTAINS "alpha" THEN "A"
        |            ELSE "other" END AS tag
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("P-alpha", "A"), ("P-beta", "B"), ("P-gamma", "other")))
  }

  test("list expressions render∘parse is the identity") {
    val texts = Seq(
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) WITH a.name AS x, collect(DISTINCT p.name) AS ps RETURN x, head(ps) AS h, ps[0] AS i0, ps[1..3] AS sl, ps[..2] AS pre, reduce(acc = 0, y IN ps | acc + size(y)) AS n, [y IN ps WHERE y CONTAINS "a" | toUpper(y)] AS c""",
      """MATCH (a:Author) RETURN [1, 2, 3][-1] AS l, ["x", a.name] AS m, range(1, 9, 2) AS r, split("a|b", "|") AS s""")
    for (t <- texts) {
      val q = Parser.parse(t)
      assert(Parser.parse(q.render) === q, s"render∘parse drifted for: $t")
    }
  }

  test("standalone SET: bulk update with expression values") {
    // every null-abstract paper gets "?"; the rest stay untouched
    val updated = Planner.runMutation(g,
      """MATCH (p:Paper) WHERE p.abstract IS NULL SET p.abstract = "?"""")
    val abs = updated.nodes.where(col("label") === "Paper")
      .select("name", "abstract").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(abs === Map("P-alpha" -> "about dbs", "P-beta" -> "?",
      "P-gamma" -> "graphs"))
    // expression over the node's own properties
    val renamed = Planner.runMutation(g,
      """MATCH (p:Paper {name: "P-alpha"}) SET p.name = p.name + "!"""")
    assert(renamed.nodes.where(col("name") === "P-alpha!").count() === 1)
    assert(renamed.nodes.count() === g.nodes.count()) // update, not insert
    // identity properties are not assignable
    intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (p:Paper) SET p.nodeId = 7"""))
  }

  test("REMOVE nulls the property (union-of-keys schema keeps the column)") {
    val removed = Planner.runMutation(g,
      """MATCH (p:Paper {name: "P-alpha"}) REMOVE p.abstract""")
    val r = removed.nodes.where(col("name") === "P-alpha").collect().head
    assert(r.isNullAt(r.fieldIndex("abstract")))
    intercept[IllegalArgumentException](Planner.runMutation(g,
      """MATCH (p:Paper) REMOVE p.labels"""))
  }

  test("CREATE nodes: append under the unique-key constraint") {
    val created = Planner.runCreateNodes(g,
      """CREATE (n:Author {nodeId: 99, name: "Dave"}),
        |       (m:Paper {nodeId: 98, name: "P-delta"})""".stripMargin)
    assert(created.nodes.count() === g.nodes.count() + 2)
    val dave = created.nodes.where(col("nodeId") === 99L).collect().head
    assert(dave.getString(dave.fieldIndex("name")) === "Dave")
    assert(dave.getSeq[String](dave.fieldIndex("labels")) ===
      Seq("Author", "_Entity_"))
    // existing (label, nodeId) key → the constraint error, like MERGE-less
    // Neo4j WITH the loader's uniqueness constraint
    intercept[IllegalArgumentException](Planner.runCreateNodes(g,
      """CREATE (n:Author {nodeId: 10, name: "Alice2"})"""))
    // duplicate keys within one CREATE
    intercept[IllegalArgumentException](Planner.runCreateNodes(g,
      """CREATE (n:Author {nodeId: 97}), (m:Author {nodeId: 97})"""))
    // run() dispatches on the CREATE prefix and returns the nodes table
    assert(Planner.run(g, """CREATE (n:Author {nodeId: 96, name: "Eve"})""")
      .count() === g.nodes.count() + 1)
    // a type-mismatched literal FAILS with a clear message instead of
    // silently cast-to-null (Neo4j stores the value; the loader errors)
    val mis = intercept[IllegalArgumentException](Planner.runCreateNodes(g,
      """CREATE (n:Author {nodeId: 95, name: 123})"""))
    assert(mis.getMessage.contains("cannot be stored in a string column"))
  }

  test("relationship CREATE: one edge per matched pair, direction stored") {
    val out = Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-gamma"})
        |CREATE (a)-[:READS]->(p)""".stripMargin)
    assert(out.rels.count() === g.rels.count() + 1)
    val e = out.rels.where(col("relType") === "READS").collect().head
    assert((e.getAs[Long]("src"), e.getAs[Long]("dst")) === ((10L, 22L)))
    // reversed arrow stores the reversed orientation
    val rev = Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-gamma"})
        |CREATE (a)<-[:READS]-(p)""".stripMargin)
    val e2 = rev.rels.where(col("relType") === "READS").collect().head
    assert((e2.getAs[Long]("src"), e2.getAs[Long]("dst")) === ((22L, 10L)))
    // CREATE requires a direction, like Neo4j
    intercept[Parser.ParseError](Parser.parseMutation(
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-gamma"})
        |CREATE (a)-[:READS]-(p)""".stripMargin))
  }

  test("relationship MERGE: idempotent upsert, orientation-aware probe") {
    // WRITES 10→20 exists: undirected MERGE finds it either way → no-op
    val same = Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-alpha"})
        |MERGE (p)-[:WRITES]-(a)""".stripMargin)
    assert(same.rels.count() === g.rels.count())
    // directed MERGE probes ONE orientation: 20→10 is absent → inserts
    val ins = Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-alpha"})
        |MERGE (p)-[:WRITES]->(a)""".stripMargin)
    assert(ins.rels.count() === g.rels.count() + 1)
    // new pair inserts once; re-running the same MERGE is a no-op
    val m1 = Planner.runMutation(g,
      """MATCH (a:Author {name: "Bob"}), (p:Paper {name: "P-gamma"})
        |MERGE (a)-[:WRITES]->(p)""".stripMargin)
    assert(m1.rels.count() === g.rels.count() + 1)
    val m2 = Planner.runMutation(m1,
      """MATCH (a:Author {name: "Bob"}), (p:Paper {name: "P-gamma"})
        |MERGE (a)-[:WRITES]->(p)""".stripMargin)
    assert(m2.rels.count() === m1.rels.count())
    // run() on a rel mutation returns the relationships table
    assert(Planner.run(g,
      """MATCH (a:Author {name: "Bob"}), (p:Paper {name: "P-gamma"})
        |MERGE (a)-[:WRITES]->(p)""".stripMargin).count() ===
      g.rels.count() + 1)
  }

  test("undirected MERGE: a symmetric match creates ONE edge per pair") {
    // the author×author product matches every ordered pair both ways;
    // Neo4j creates one edge per UNORDERED pair (later rows see the edge
    // earlier rows created) — the within-batch canonicalization collapses
    // (x,y)/(y,x) to one (least, greatest) insert
    val out = Planner.runMutation(g,
      """MATCH (x:Author), (y:Author) WHERE x.nodeId < y.nodeId OR y.nodeId < x.nodeId
        |MERGE (x)-[:KNOWS]-(y)""".stripMargin)
    val knows = out.rels.where(col("relType") === "KNOWS")
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).sorted
    assert(knows.toSeq === Seq((10L, 11L), (10L, 12L), (11L, 12L)))
    // a pre-existing edge (either stored orientation) still suppresses
    // the canonical insert: WRITES 10→20 exists, so only the (11,22) and
    // (12,20)… pairs absent in EITHER orientation are inserted once
    val sym = Planner.runMutation(g,
      """MATCH (a:Author {name: "Alice"}), (p:Paper {name: "P-alpha"})
        |MERGE (p)-[:WRITES]-(a)""".stripMargin)
    assert(sym.rels.count() === g.rels.count())
  }

  test("mutation clauses render∘parse round-trips") {
    val u = Parser.parseMutation(
      """MATCH (p:Paper) WHERE p.abstract IS NULL SET p.abstract = "?"""")
      .swap.getOrElse(fail("expected UpdateQuery"))
    assert(Parser.parseMutation(u.render) === Left(u))
    val r = Parser.parseMutation(
      """MATCH (a:Author {name: "Bob"}), (p:Paper {name: "P-gamma"}) MERGE (a)-[:WRITES]->(p)""")
      .getOrElse(fail("expected RelMutationQuery"))
    assert(Parser.parseMutation(r.render) === Right(r))
    val c = Parser.parseCreateNodes(
      """CREATE (n:Author {nodeId: 99, name: "Dave"})""")
    assert(Parser.parseCreateNodes(c.render) === c)
  }

  test("collect→UNWIND round trip: bare RETURN tail") {
    // collect then unwind restores one row per element (sorted by the
    // canonical collect(DISTINCT) order)
    val rows = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH a.name AS author, collect(DISTINCT p.name) AS ps
        |UNWIND ps AS title
        |RETURN author, title ORDER BY title""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("Alice", "P-alpha"), ("Alice", "P-beta")))
    // a transformed list unwinds too
    val upped = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH collect(DISTINCT p.name) AS ps
        |UNWIND ps AS t
        |RETURN toUpper(t) AS u ORDER BY u""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(upped === Seq("P-ALPHA", "P-BETA"))
  }

  test("collect→UNWIND then re-MATCH: the unwound scalar anchors a node") {
    // collect author names per institution, unwind, re-anchor each name
    val rows = Planner.run(g,
      """MATCH (i:Institution {name: "MIT"})-[r:AFFILIATED_WITH]-(a:Author)
        |WITH collect(DISTINCT a.name) AS names
        |UNWIND names AS nm
        |MATCH (x:Author {name: nm})-[w:WRITES]-(p:Paper)
        |RETURN nm, count(p) AS n_papers ORDER BY nm""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("Alice", 2L), ("Bob", 1L)))
  }

  test("UNWIND of an unbound or non-list alias fails clearly") {
    val e1 = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a.name AS nm
        |UNWIND xs AS x
        |RETURN x""".stripMargin))
    assert(e1.getMessage.contains("not a carried list alias") ||
      e1.getMessage.contains("requires a previous WITH stage"))
    // UNWIND-without-MATCH tail demands a carried alias at parse time
    intercept[Parser.ParseError](Parser.parse(
      "UNWIND $xs AS x RETURN x"))
  }

  test("carried-list UNWIND renders and re-parses") {
    val t = """MATCH (a:Author)-[w:WRITES]-(p:Paper) WITH collect(DISTINCT p.name) AS ps UNWIND ps AS t MATCH (q:Paper {name: t}) RETURN count(q) AS n"""
    val q = Parser.parse(t)
    assert(Parser.parse(q.render) === q)
  }

  test("allShortestPaths: one row per distinct shortest path") {
    // Alice(10) reaches Databases(30) at hop 2 via BOTH papers 20 and
    // 21; the parallel WRITES/REVIEWS pair on Alice—P-alpha forks the
    // (10,20,30) node walk into TWO relationship sequences
    val rows = Planner.run(g,
      """MATCH p = allShortestPaths((a:Author {name: "Alice"})-[*1..3]-(b:FieldOfStudy {name: "Databases"}))
        |RETURN nodes(p) AS ns, length(p) AS len""".stripMargin).collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getLong(1) === 2L))
    assert(rows.map(_.getSeq[Long](0)).groupBy(identity)
      .view.mapValues(_.length).toMap ===
      Map(Seq(10L, 20L, 30L) -> 2, Seq(10L, 21L, 30L) -> 1))
    // the singular form keeps ONE deterministic min-predecessor witness
    val one = Planner.run(g,
      """MATCH p = shortestPath((a:Author {name: "Alice"})-[*1..3]-(b:FieldOfStudy {name: "Databases"}))
        |RETURN nodes(p) AS ns""".stripMargin).collect()
    assert(one.length === 1 && one.head.getSeq[Long](0) === Seq(10L, 20L, 30L))
  }

  test("allShortestPaths multiplicity census from an anchor") {
    // MIT(1): dist-1 = {10, 11} (1 path each); dist-2 = {20 via Alice
    // (2 paths — the parallel WRITES/REVIEWS fork) and via Bob (1),
    // 21 via Alice (1 path)}
    val rows = Planner.run(g,
      """MATCH p = allShortestPaths((i:Institution {name: "MIT"})-[*1..2]-(y))
        |RETURN y.nodeId AS nid, length(p) AS len, count(*) AS n
        |ORDER BY nid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((10L, 1L, 1L), (11L, 1L, 1L), (20L, 2L, 3L),
      (21L, 2L, 1L)))
    // render∘parse keeps the all-form
    val q = Parser.parse(
      """MATCH p = allShortestPaths((a:Author {name: "Alice"})-[*1..2]-(b)) RETURN length(p) AS len""")
    assert(q.shortest.exists(_.all) && Parser.parse(q.render) === q)
  }

  test("property-to-property comparison: the pair-dedup idiom") {
    // co-author pairs on a shared paper, each unordered pair once
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper), (b:Author)-[w2:WRITES]-(p)
        |WHERE a.nodeId < b.nodeId
        |RETURN a.name AS a1, b.name AS a2, p.name AS paper"""
        .stripMargin).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(("Alice", "Bob", "P-alpha")))
    // id(v) is the nodeId key (renders canonically as v.nodeId)
    val viaId = Planner.run(g,
      """MATCH (a:Author) WHERE id(a) = 10 RETURN a.name AS n""")
      .collect().map(_.getString(0)).toSeq
    assert(viaId === Seq("Alice"))
    val q = Parser.parse("MATCH (a:Author) WHERE id(a) = 10 RETURN id(a) AS i")
    assert(q.render.contains("a.nodeId"))
    assert(Parser.parse(q.render) === q)
  }

  test("simple CASE desugars to the searched form with equality guards") {
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name,
        |       CASE a.name WHEN "Alice" THEN "A" WHEN "Bob" THEN "B"
        |            ELSE "other" END AS tag
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("Alice", "A"), ("Bob", "B"), ("Carol", "other")))
    // a null subject matches no branch (falls to ELSE)
    val nulls = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS name,
        |       CASE p.abstract WHEN "graphs" THEN 1 ELSE 0 END AS hit
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(nulls === Seq(("P-alpha", 0L), ("P-beta", 0L), ("P-gamma", 1L)))
  }

  test("exists(n.prop) is the IS NOT NULL sugar; count(expr) skips nulls") {
    val has = Planner.run(g,
      """MATCH (p:Paper) WHERE exists(p.abstract)
        |RETURN p.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(has === Seq("P-alpha", "P-gamma"))
    val hasNot = Planner.run(g,
      """MATCH (p:Paper) WHERE NOT exists(p.abstract)
        |RETURN p.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(hasNot === Seq("P-beta"))
    // conditional count: CASE yields null on the unmatched branch
    val row = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN count(CASE WHEN p.abstract IS NOT NULL THEN 1 END) AS with_abs,
        |       count(*) AS total""".stripMargin).collect().head
    assert((row.getLong(0), row.getLong(1)) === ((2L, 3L)))
  }

  test("ORDER BY a general expression (hidden pre-projection key)") {
    // sort authors by name length desc, then name — size() is not in the
    // projection
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name
        |ORDER BY size(a.name) DESC, name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("Alice", "Carol", "Bob"))
    // the hidden key never reaches the output schema
    val df = Planner.run(g,
      """MATCH (a:Author) RETURN a.name AS name ORDER BY size(a.name) DESC, name LIMIT 1""")
    assert(df.columns.toSeq === Seq("name"))
    assert(df.collect().head.getString(0) === "Alice")
    // render∘parse identity for the expression key
    val q = Parser.parse(
      "MATCH (a:Author) RETURN a.name AS name ORDER BY size(a.name) DESC")
    assert(Parser.parse(q.render) === q)
    // aggregating queries get the clear guidance instead of a plan error
    val e = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |RETURN a.name AS name, count(p) AS n ORDER BY n * 2""".stripMargin))
    assert(e.getMessage.contains("project it under an alias"))
  }

  test("null literal: SET n.p = null is the property-removal idiom") {
    val cleared = Planner.runMutation(g,
      """MATCH (p:Paper {name: "P-alpha"}) SET p.abstract = null""")
    val r = cleared.nodes.where(col("name") === "P-alpha").collect().head
    assert(r.isNullAt(r.fieldIndex("abstract")))
    // and in expression position: coalesce / CASE defaults
    val row = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"})
        |RETURN coalesce(p.abstract, "?") AS a,
        |       CASE WHEN p.abstract IS NULL THEN null ELSE 1 END AS b"""
        .stripMargin).collect().head
    assert(row.getString(0) === "?" && row.isNullAt(1))
  }

  test("keys(n): sorted non-null property names, label metadata excluded") {
    val rows = Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS name, keys(p) AS ks ORDER BY name""")
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    // P-beta has a null abstract → the key is absent on that row
    assert(rows === Seq(
      ("P-alpha", Seq("abstract", "name", "nameEmbedding", "nodeId")),
      ("P-beta", Seq("name", "nameEmbedding", "nodeId")),
      ("P-gamma", Seq("abstract", "name", "nameEmbedding", "nodeId"))))
  }

  test("whole-entity projection: RETURN n / properties(n) as a sorted struct") {
    // RETURN n = the canonical name-sorted property struct (label
    // metadata excluded, nodeId included — the S2 key); absent
    // properties are null fields under union-of-keys
    val row = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"}) RETURN p""").collect().head
    val s = row.getStruct(0)
    assert(s.schema.fieldNames.toSeq ===
      Seq("abstract", "name", "nameEmbedding", "nodeId"))
    assert(s.isNullAt(0) && s.getString(1) === "P-beta" &&
      s.getLong(3) === 21L)
    // properties(n) plans to the SAME struct
    val both = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |RETURN p AS whole, properties(p) AS props""".stripMargin)
      .collect().head
    assert(both.getStruct(0) === both.getStruct(1))
    // the struct is a GROUP KEY like any column (implicit grouping)
    val grouped = Planner.run(g,
      """MATCH (i:Institution)-[e:AFFILIATED_WITH]-(a:Author)
        |RETURN i AS inst, count(a) AS n ORDER BY n DESC""".stripMargin)
      .collect().map(r => (r.getStruct(0).getAs[String]("name"), r.getLong(1)))
    assert(grouped.toSeq === Seq(("MIT", 2L), ("Stanford", 1L)))
    // DISTINCT over the struct
    assert(Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper {name: "P-alpha"})
        |RETURN DISTINCT p""".stripMargin).count() === 1L)
    // a BOUND relationship variable projects its identity triple
    // {dst, relType, src} — stored orientation, like Neo4j's fixed
    // start/end under an undirected match (round 15, VERDICT r14 #4)
    val relRows = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN w AS rel, properties(w) AS props
        |ORDER BY p.name""".stripMargin).collect()
    relRows.foreach { r =>
      assert(r.getStruct(0).schema.fieldNames.toSeq ===
        Seq("dst", "relType", "src"))
      assert(r.getStruct(0) === r.getStruct(1)) // RETURN w ≡ properties(w)
      assert(r.getStruct(0).getAs[String]("relType") === "WRITES")
    }
    // round-trip: every projected triple IS a stored rels row
    val stored = g.rels.collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[String]("relType"))).toSet
    relRows.foreach { r =>
      val s = r.getStruct(0)
      assert(stored.contains((s.getAs[Long]("src"), s.getAs[Long]("dst"),
        s.getAs[String]("relType"))))
    }
    // an OPTIONAL relationship carries its FULL identity triple through
    // the null-extending join (round 16): matched rows project the
    // {dst, relType, src} struct, unmatched rows project SQL NULL (not a
    // struct of nulls) — institutions never write
    val optRel = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS n, w AS rel ORDER BY n""".stripMargin).collect()
    assert(optRel.length === 2 && optRel.forall(_.isNullAt(1)))
    val optHit = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |OPTIONAL MATCH (a)-[w:WRITES]-(p:Paper)
        |RETURN w AS rel, properties(w) AS props
        |ORDER BY p.name""".stripMargin).collect()
    assert(optHit.nonEmpty)
    optHit.foreach { r =>
      assert(r.getStruct(0).schema.fieldNames.toSeq ===
        Seq("dst", "relType", "src"))
      assert(r.getStruct(0) === r.getStruct(1))
      assert(r.getStruct(0).getAs[String]("relType") === "WRITES")
      assert(stored.contains((r.getStruct(0).getAs[Long]("src"),
        r.getStruct(0).getAs[Long]("dst"),
        r.getStruct(0).getAs[String]("relType"))))
    }
    // an UNMATCHED optional variable projects as NULL, not a struct of
    // nulls (Neo4j's null node) — institutions never write
    val opt = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS name, p AS paper ORDER BY name""".stripMargin)
      .collect()
    assert(opt.length === 2 && opt.forall(_.isNullAt(1)))
    // properties() carries through a WITH barrier as a scalar struct
    val carried = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |WITH properties(p) AS rec
        |RETURN rec""".stripMargin).collect().head.getStruct(0)
    assert(carried.getAs[String]("name") === "P-alpha")
    // collect(n) aggregates whole entities — the retrieval record list
    // shape: a canonically SORTED list of the structs (field-wise from
    // the first sorted field, nulls first under sort_array — so P-beta's
    // null abstract leads)
    val bag = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN a.name AS author, collect(p) AS papers""".stripMargin)
      .collect().head
    val papers = bag.getSeq[org.apache.spark.sql.Row](1)
    assert(papers.map(_.getAs[String]("name")) === Seq("P-beta", "P-alpha"))
  }

  test("map literal {k: expr, …}: listed-order struct, nests (round 15)") {
    val row = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |RETURN {id: p.nodeId, nm: toUpper(p.name),
        |        tag: {len: size(p.name), fixed: "x"}} AS rec""".stripMargin)
      .collect().head
    val s = row.getStruct(0)
    assert(s.schema.fieldNames.toSeq === Seq("id", "nm", "tag"))
    assert(s.getLong(0) === 20L && s.getString(1) === "P-ALPHA")
    val tag = s.getStruct(2)
    assert(tag.getLong(0) === 7L && tag.getString(1) === "x")
    // carries through WITH like any scalar; aggregates stay barred
    val carried = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"})
        |WITH {nm: p.name} AS rec
        |RETURN rec""".stripMargin).collect().head.getStruct(0)
    assert(carried.getString(0) === "P-beta")
    intercept[Parser.ParseError](Parser.parse(
      """MATCH (p:Paper) RETURN {n: count(p)} + 1 AS x"""))
    intercept[Parser.ParseError](Parser.parse(
      """MATCH (p:Paper) RETURN {} AS x"""))
    // duplicate keys would plan an ambiguous duplicate-field struct —
    // rejected at parse time like Neo4j (review r15)
    val dup = intercept[Parser.ParseError](Parser.parse(
      """MATCH (p:Paper) RETURN {a: 1, a: 2} AS x"""))
    assert(dup.getMessage.contains("duplicate map literal key"))
    // render∘parse identity
    val q = Parser.parse(
      """MATCH (p:Paper) RETURN {id: p.nodeId, t: {a: 1, b: "s"}} AS rec""")
    assert(Parser.parse(q.render) === q)
  }

  test("count(r) / count(DISTINCT r): relationship counting (round 15)") {
    // null-skipping over OPTIONAL: institutions write nothing → 0
    val opt = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS name, count(w) AS n ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(opt.toSeq === Seq(("MIT", 0L), ("Stanford", 0L)))
    // DISTINCT counts identity triples: a cartesian-duplicated row
    // space (each HAS_TOPIC edge × 3 papers) counts each relationship
    // once; the plain count keeps the bag
    val dup = Planner.run(g,
      """MATCH (p:Paper)-[w:HAS_TOPIC]-(f:FieldOfStudy), (q:Paper)
        |RETURN count(w) AS bag, count(DISTINCT w) AS dedup""".stripMargin)
      .collect().head
    assert(dup.getLong(0) === 9L && dup.getLong(1) === 3L)
    // the e4/e12 parallel pair stays TWO distinct relationships
    val par = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w]-(p:Paper {name: "P-alpha"})
        |RETURN count(DISTINCT w) AS n""".stripMargin).collect().head.getLong(0)
    assert(par === 2L)
    // DISTINCT over an OPTIONAL rel (round 16): the triple is
    // null-guarded on relType, so unmatched rows are SQL NULL — which
    // count(DISTINCT …) skips, matching Neo4j. Institutions never
    // write → 0; Alice's two WRITES rels stay two distinct triples.
    val optDup = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS name, count(DISTINCT w) AS n
        |ORDER BY name""".stripMargin).collect()
    assert(optDup.length === 2 && optDup.forall(_.getLong(1) === 0L))
    val optDup2 = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |OPTIONAL MATCH (a)-[w:WRITES]-(p:Paper)
        |RETURN count(DISTINCT w) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(optDup2 === 2L)
  }

  test("startNode(r)/endNode(r): stored-orientation endpoints (round 15)") {
    // WRITES stores author→paper; the undirected match recovers the
    // stored orientation through the endpoint functions
    val rows = Planner.run(g,
      """MATCH (p:Paper)-[w:WRITES]-(a:Author {name: "Alice"})
        |RETURN startNode(w).name AS s, endNode(w).name AS e,
        |       startNode(w).nodeId AS sid
        |ORDER BY e""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq === Seq(("Alice", "P-alpha", 10L),
      ("Alice", "P-beta", 10L)))
    // bare form: the endpoint's whole-entity struct (name-sorted)
    val whole = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})-[w:WRITES]-(p:Paper)
        |RETURN endNode(w) AS dst""".stripMargin).collect().head.getStruct(0)
    assert(whole.schema.fieldNames.toSeq ===
      Seq("abstract", "name", "nameEmbedding", "nodeId"))
    assert(whole.getAs[String]("name") === "P-alpha")
    // carried rel: the endpoint joins resolve the __w_ columns
    val carried = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})-[w:WRITES]-(p:Paper)
        |WITH w
        |RETURN startNode(w).name AS s""".stripMargin)
      .collect().head.getString(0)
    assert(carried === "Bob")
    // endpoint functions also filter (WHERE position)
    val filtered = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WHERE startNode(w).name = "Carol"
        |RETURN endNode(w).name AS e""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(filtered === Seq("P-gamma"))
    // OPTIONAL rels carry endpoint ids since round 16: the endpoint
    // join is a LEFT join, so an unmatched row's endpoint is NULL
    // (Neo4j's startNode(null) = null) and a matched row resolves
    val optEp = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS n, startNode(w).name AS s ORDER BY n""".stripMargin)
      .collect()
    assert(optEp.length === 2 && optEp.forall(_.isNullAt(1)))
    // the BARE whole-entity form is likewise NULL on unmatched rows —
    // not a struct of all-null fields — so count() skips the phantoms
    // (review r16)
    val optEpWhole = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN i.name AS n, endNode(w) AS o ORDER BY n""".stripMargin)
      .collect()
    assert(optEpWhole.length === 2 && optEpWhole.forall(_.isNullAt(1)))
    val optEpCnt = Planner.run(g,
      """MATCH (i:Institution)
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN count(endNode(w)) AS c""".stripMargin)
      .collect().head.getLong(0)
    assert(optEpCnt === 0L)
    val optEpHit = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |OPTIONAL MATCH (a)-[w:WRITES]-(p:Paper)
        |RETURN startNode(w).name AS s, endNode(w).name AS e
        |ORDER BY e""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(optEpHit === Seq(("Alice", "P-alpha"), ("Alice", "P-beta")))
    // render∘parse identity, both spellings
    val q = Parser.parse(
      """MATCH (a)-[w:WRITES]-(p) RETURN startNode(w) AS s, endNode(w).name AS en""")
    assert(q.items.map(_.expr) === Seq(Ast.EndpointOf("start", "w"),
      Ast.EndpointOf("end", "w", Some("name"))))
    assert(Parser.parse(q.render) === q)
    // WITH…WHERE position: the endpoint join attaches POST-barrier
    // against the carried rel columns (review r15)
    val wpw = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH w, p.name AS pn
        |WHERE startNode(w).name <> "Carol"
        |RETURN pn ORDER BY pn""".stripMargin)
    assert(wpw.columns.toSeq === Seq("pn")) // helper columns dropped
    assert(wpw.collect().map(_.getString(0)).toSeq ===
      Seq("P-alpha", "P-alpha", "P-beta"))
  }

  test("WITH r: relationship variables carry across barriers (round 15)") {
    // type(r) reads the carried triple after the barrier
    val typed = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w]-(p:Paper)
        |WITH w, p.name AS pn
        |RETURN pn, type(w) AS t ORDER BY pn, t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(typed.toSeq === Seq(("P-alpha", "REVIEWS"), ("P-alpha", "WRITES"),
      ("P-beta", "WRITES")))
    // RETURN r after a barrier: the identity-triple struct from the
    // flattened carry columns
    val whole = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})-[w:WRITES]-(p:Paper)
        |WITH w
        |RETURN w""".stripMargin).collect().head.getStruct(0)
    assert(whole.schema.fieldNames.toSeq === Seq("dst", "relType", "src"))
    assert(whole.getAs[Long]("src") === 11L && whole.getAs[Long]("dst") === 20L)
    // collect(r) aggregates carried relationships; DISTINCT dedups the
    // triple
    val bag = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w]-(p:Paper {name: "P-alpha"})
        |WITH DISTINCT w
        |RETURN count(*) AS n""".stripMargin).collect().head.getLong(0)
    assert(bag === 2L) // the e4/e12 parallel pair survives DISTINCT
    // ORDER BY a carried rel field at the barrier
    val ordered = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w]-(p:Paper {name: "P-alpha"})
        |WITH w ORDER BY w.relType DESC LIMIT 1
        |RETURN type(w) AS t""".stripMargin).collect().head.getString(0)
    assert(ordered === "WRITES")
    // a carried rel never RE-BINDS in a later MATCH
    val e = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH w, a
        |MATCH (a)-[w:REVIEWS]-(q:Paper)
        |RETURN type(w) AS t""".stripMargin))
    assert(e.getMessage.contains("re-binding carried relationship"))
    // the dialect boundary holds across the barrier too: map projection
    // on a CARRIED rel is rejected like the stage-bound form (review r15)
    val mp = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH w
        |RETURN w {.src} AS x""".stripMargin))
    assert(mp.getMessage.contains("relationship variable"))
  }

  test("map projection n {.p1, .p2}: listed-order struct") {
    val rows = Planner.run(g,
      """MATCH (p:Paper) WHERE p.abstract IS NOT NULL
        |RETURN p {.name, .abstract} AS rec ORDER BY p.name""".stripMargin)
      .collect().map { r =>
        val s = r.getStruct(0); (s.getString(0), s.getString(1)) }
    assert(rows.toSeq === Seq(("P-alpha", "about dbs"), ("P-gamma", "graphs")))
    // listed order is preserved (not sorted)
    val sch = Planner.run(g,
      """MATCH (p:Paper) RETURN p {.nodeId, .name} AS rec LIMIT 1""")
      .schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(sch === Seq("nodeId", "name"))
    // unknown fields fail with the union-of-keys message
    val e = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p {.nope} AS rec"""))
    assert(e.getMessage.contains("unknown node property"))
    // carried var: the struct resolves against the __w_ columns
    val carried = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH p ORDER BY p.name LIMIT 1
        |RETURN p {.name} AS rec, properties(p) AS props""".stripMargin)
      .collect().head
    assert(carried.getStruct(0).getString(0) === "P-alpha")
    assert(carried.getStruct(1).getAs[Long]("nodeId") === 20L)
    // render∘parse identity for all three shapes
    val q = Parser.parse(
      """MATCH (p:Paper) RETURN p, properties(p) AS props, p {.name, .abstract} AS rec""")
    assert(q.items.map(_.expr) === Seq(Ast.ColRef("p"), Ast.PropsOf("p"),
      Ast.MapProj("p", Seq("name", "abstract"))))
    assert(Parser.parse(q.render) === q)
  }

  test("ORDER BY null ordering: nulls largest, like Neo4j") {
    // papers ordered by abstract ASC: P-beta's null abstract sorts LAST
    val asc = Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS name, p.abstract AS a
        |ORDER BY a, name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(asc === Seq("P-alpha", "P-gamma", "P-beta"))
    // DESC: the null comes first (null is the largest value)
    val desc = Planner.run(g,
      """MATCH (p:Paper) RETURN p.name AS name, p.abstract AS a
        |ORDER BY a DESC, name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(desc === Seq("P-beta", "P-gamma", "P-alpha"))
    // OPTIONAL MATCH null-extended keys honor the same rule under LIMIT
    val lim = Planner.run(g,
      """MATCH (p:Paper)
        |OPTIONAL MATCH (p)-[c:CITES]-(q:Paper)
        |WHERE q.nodeId < p.nodeId
        |RETURN p.name AS name, q.name AS cited
        |ORDER BY cited LIMIT 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // the single non-null key (P-gamma cites P-alpha) fills the page
    // first; the null-extended rows follow
    assert(lim.head === (("P-gamma", "P-alpha")) && lim(1)._2 == null)
  }

  test("RETURN *: every binding as a whole-entity/scalar column") {
    // bound node vars come back as whole-entity structs, and (round 15,
    // like Neo4j) bound REL vars as identity-triple structs — name-sorted
    val df = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper) RETURN *""")
    assert(df.columns.toSeq === Seq("a", "p", "w"))
    val rows = df.collect()
    assert(rows.length === 2 &&
      rows.forall(_.getStruct(0).getAs[String]("name") === "Alice"))
    assert(rows.forall(_.getStruct(2).getAs[String]("relType") === "WRITES"))
    // carried scalars and explicit extras compose; explicit names win
    val mixed = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a, count(p) AS np
        |RETURN *, np * 2 AS dbl ORDER BY np DESC, dbl LIMIT 1""".stripMargin)
    assert(mixed.columns.toSeq === Seq("a", "np", "dbl"))
    val top = mixed.collect().head
    assert(top.getStruct(0).getAs[String]("name") === "Alice" &&
      top.getLong(1) === 2L && top.getLong(2) === 4L)
    // OPTIONAL vars are included (null when unmatched) — rel vars too
    // since round 16 (the full triple survives the null-extending join)
    val opt = Planner.run(g,
      """MATCH (i:Institution {name: "MIT"})
        |OPTIONAL MATCH (i)-[w:WRITES]-(p:Paper)
        |RETURN *""".stripMargin)
    assert(opt.columns.toSeq === Seq("i", "p", "w"))
    val optRow = opt.collect().head
    assert(optRow.isNullAt(1) && optRow.isNullAt(2))
    // render∘parse identity for both spellings
    val q = Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN *, a.name AS nm""")
    assert(q.star && Parser.parse(q.render) === q)
    val bare = Parser.parse("""MATCH (a:Author) RETURN *""")
    assert(bare.star && bare.items.isEmpty && Parser.parse(bare.render) === bare)
  }

  test("list quantifiers any/all/none/single over collected lists") {
    // per-author paper-name lists: Alice [P-alpha, P-beta],
    // Bob [P-alpha], Carol [P-gamma]
    def quant(p: String): Seq[String] = Planner.run(g,
      s"""MATCH (a:Author)-[w:WRITES]-(x:Paper)
         |WITH a.name AS author, collect(x.name) AS ps
         |WHERE $p
         |RETURN author ORDER BY author""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(quant("""any(t IN ps WHERE t ENDS WITH "beta")""") === Seq("Alice"))
    assert(quant("""all(t IN ps WHERE t STARTS WITH "P-")""") ===
      Seq("Alice", "Bob", "Carol"))
    assert(quant("""none(t IN ps WHERE t CONTAINS "alpha")""") === Seq("Carol"))
    // exactly one 'a'-containing name each; Alice has two (alpha, beta)
    assert(quant("""single(t IN ps WHERE t CONTAINS "a")""") ===
      Seq("Bob", "Carol"))
    // composes under OR/NOT like any scalar predicate
    assert(quant(
      """NOT (any(t IN ps WHERE t = "P-beta") OR any(t IN ps WHERE t = "P-gamma"))""")
      === Seq("Bob"))
    // render∘parse identity
    val q = Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(x:Paper) WITH a.name AS author, collect(x.name) AS ps WHERE any(t IN ps WHERE t CONTAINS "a") RETURN author""")
    assert(Parser.parse(q.render) === q)
    // quantifiers also work in CONDITION position (CASE WHEN)
    val cased = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(x:Paper)
        |WITH a.name AS author, collect(x.name) AS ps
        |RETURN author,
        |       CASE WHEN any(t IN ps WHERE t ENDS WITH "beta")
        |            THEN 1 ELSE 0 END AS has_beta
        |ORDER BY author""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(cased.toSeq === Seq(("Alice", 1L), ("Bob", 0L), ("Carol", 0L)))
    val q2 = Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(x:Paper) WITH a.name AS author, collect(x.name) AS ps RETURN author, CASE WHEN all(t IN ps WHERE t STARTS WITH "P") THEN 1 ELSE 0 END AS f""")
    assert(Parser.parse(q2.render) === q2)
  }

  test("single(): openCypher three-valued truth table (advisor r14)") {
    // Alice [P-alpha, P-beta], Bob [P-alpha], Carol [P-gamma].
    def quant(p: String): Seq[String] = Planner.run(g,
      s"""MATCH (a:Author)-[w:WRITES]-(x:Paper)
         |WITH a.name AS author, collect(x.name) AS ps
         |WHERE $p
         |RETURN author ORDER BY author""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    // t = null is null for EVERY element → single is null, and NOT null
    // is still null → every row drops (the old size∘filter lowering
    // returned false, so NOT kept all rows Neo4j drops)
    assert(quant("""NOT single(t IN ps WHERE t = null)""") === Seq())
    assert(quant("""single(t IN ps WHERE t = null)""") === Seq())
    // exactly one true PLUS a null evaluation → null (the unknown could
    // be a second true): Alice has true(P-alpha) + null(P-beta masked),
    // Bob a clean single true, Carol a clean false
    val oneTrueOneNull =
      """single(t IN ps WHERE (CASE WHEN t CONTAINS "beta" THEN null
        | ELSE t END) CONTAINS "alpha")""".stripMargin.replace("\n", "")
    assert(quant(oneTrueOneNull) === Seq("Bob"))
    // two trues decide FALSE regardless of unknowns → NOT keeps Alice
    assert(quant(
      """NOT single(t IN ps WHERE (CASE WHEN t = "nope" THEN null
        | ELSE t END) STARTS WITH "P-")""".stripMargin.replace("\n", ""))
      === Seq("Alice"))
    // zero trues + no nulls stays a definite false under NOT
    assert(quant("""NOT single(t IN ps WHERE t = "zzz")""") ===
      Seq("Alice", "Bob", "Carol"))
  }

  test("round(): explicit half-toward-+inf tie rule (round 15)") {
    // Neo4j's Math.round semantics, spelled floor(x + 0.5) on both
    // engines: 2.5 → 3, -2.5 → -2 (NOT -3: half toward +∞), -5.5 → -5
    val row = Planner.run(g,
      """MATCH (b:Author {name: "Bob"})
        |RETURN round(2.5) AS a, round(0 - 2.5) AS b2,
        |       round(3.3) AS c, round(0 - 3.3) AS d,
        |       round(toFloat(0 - b.nodeId) / 2.0) AS e""".stripMargin)
      .collect().head
    assert(row.getDouble(0) === 3.0 && row.getDouble(1) === -2.0)
    assert(row.getDouble(2) === 3.0 && row.getDouble(3) === -3.0)
    assert(row.getDouble(4) === -5.0) // round(-5.5) = -5
    // double literals parse, type as FLOAT, and render∘parse round-trip
    val q = Parser.parse(
      """MATCH (b:Author) RETURN round(b.nodeId * 0.5) AS h, 2.0 AS t""")
    assert(Parser.parse(q.render) === q)
    val lit = Planner.run(g,
      """MATCH (b:Author {name: "Bob"}) RETURN b.nodeId * 0.5 AS h""")
      .collect().head
    assert(lit.getDouble(0) === 5.5) // double mult, not integer division
    // planner-constructed doubles render plain-decimal (Double.toString
    // would emit 1.0E-5, unreadable by numLit) and non-finite doubles
    // are rejected at construction — ADVICE r16
    assert(Ast.exprText(Ast.DblLitE(1.0e-5)) === "0.000010")
    assert(Ast.exprText(Ast.DblLitE(1.0e-5)).toDouble === 1.0e-5)
    assert(Ast.exprText(Ast.DblLitE(1.0e7)) === "10000000.0")
    assert(Ast.exprText(Ast.DblLitE(-2.0)) === "-2.0")
    val nf = intercept[IllegalArgumentException](
      Ast.DblLitE(Double.NaN))
    assert(nf.getMessage.contains("non-finite"))
    // round() is statically DOUBLE (review r16): `+` stays numeric
    // addition (never string concatenation) and typed membership admits
    // it against a numeric list
    val rplus = Planner.run(g,
      """MATCH (b:Author {name: "Bob"}) RETURN round(1.4) + 1 AS x""")
      .collect().head.getDouble(0)
    assert(rplus === 2.0)
    val rin = Planner.run(g,
      """MATCH (b:Author)
        |WHERE round(toFloat(b.nodeId) / 10.0) IN [1]
        |RETURN count(*) AS n""".stripMargin)
      .collect().head.getLong(0)
    assert(rin === 3L) // 10, 11, 12 all round to 1.0
    intercept[IllegalArgumentException](
      Ast.DblLitE(Double.PositiveInfinity))
  }

  test("floor/ceil/sqrt: IEEE-exact math scalars") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN floor(sqrt(toFloat(a.nodeId))) AS f,
        |       ceil(sqrt(toFloat(a.nodeId))) AS c,
        |       sqrt(toFloat(a.nodeId) * toFloat(a.nodeId)) AS s""".stripMargin)
      .collect().head
    // nodeId 10: sqrt = 3.16…, floor 3.0, ceil 4.0; sqrt(100) = 10.0
    assert(row.getDouble(0) === 3.0 && row.getDouble(1) === 4.0 &&
      row.getDouble(2) === 10.0)
    // beyond 2^63 Spark's long-returning floor/ceil would SATURATE at
    // Long.MaxValue while DuckDB/Neo4j stay double — the magnitude guard
    // routes such (already-integral) doubles to the identity; NaN maps
    // to NaN (the raw long cast would send it to 0) — ADVICE r16
    val big = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN floor(10000000000000000000.0) AS f,
        |       ceil(0 - 10000000000000000000.0) AS c,
        |       round(10000000000000000000.0) AS r,
        |       floor(sqrt(0 - 1.0)) AS n""".stripMargin)
      .collect().head
    assert(big.getDouble(0) === 1.0e19 && big.getDouble(1) === -1.0e19 &&
      big.getDouble(2) === 1.0e19 && big.getDouble(3).isNaN)
    // ln/exp/log10 (round 16): exact at the anchor points, composition
    // identities inside the 9-digit contract, render∘parse identity
    val tr = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN ln(1.0) AS l1, exp(0.0) AS e0, log10(100.0) AS lg,
        |       ln(exp(1.0)) AS le,
        |       toInteger(round(exp(1.0) * 1000000.0)) AS e_micro""".stripMargin)
      .collect().head
    assert(tr.getDouble(0) === 0.0 && tr.getDouble(1) === 1.0 &&
      tr.getDouble(2) === 2.0 && tr.getDouble(3) === 1.0 &&
      tr.getLong(4) === 2718282L)
    val qt = Parser.parse(
      "MATCH (a:Author) RETURN ln(toFloat(a.nodeId)) AS l, exp(2.0) AS e, log10(5.0) AS g")
    assert(Parser.parse(qt.render) === qt)
    // round-trip (round() joined the family in round 15 with an
    // explicit tie rule — see its own spec)
    val q = Parser.parse(
      """MATCH (a:Author) RETURN floor(sqrt(toFloat(a.nodeId))) AS f""")
    assert(Parser.parse(q.render) === q)
  }

  test("trig family: tolerance-checked transcendentals (round 16)") {
    // anchor points exact in IEEE double: sin(0)=0, cos(0)=1,
    // atan2(0,1)=0, degrees(pi())=180, radians of that back to π,
    // haversin(0)=0; the constants are the nearest doubles to π and e
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |RETURN sin(0.0) AS s0, cos(0.0) AS c0, atan2(0.0, 1.0) AS a0,
        |       degrees(pi()) AS dg, radians(degrees(pi())) AS rd,
        |       haversin(0.0) AS h0, pi() AS p, e() AS ee""".stripMargin)
      .collect().head
    assert(row.getDouble(0) === 0.0 && row.getDouble(1) === 1.0 &&
      row.getDouble(2) === 0.0 && row.getDouble(3) === 180.0 &&
      row.getDouble(4) === math.Pi && row.getDouble(5) === 0.0 &&
      row.getDouble(6) === math.Pi && row.getDouble(7) === math.E)
    // identities inside the 9-digit contract, quantized like the
    // catalog surface: sin²+cos² = 1, atan2(y,1) = atan(y),
    // cot = cos/sin, haversin(x) = (1−cos x)/2, asin∘sin = id on [0,π/2]
    val idr = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |WITH toFloat(a.nodeId) / 10.0 AS x
        |RETURN toInteger(round((sin(x) * sin(x) + cos(x) * cos(x)) * 1000000.0)) AS one,
        |       toInteger(round((atan2(x, 1.0) - atan(x)) * 1000000.0)) AS z1,
        |       toInteger(round((cot(x) - cos(x) / sin(x)) * 1000000.0)) AS z2,
        |       toInteger(round((haversin(x) - (1.0 - cos(x)) / 2.0) * 1000000.0)) AS z3,
        |       toInteger(round(asin(sin(x)) * 1000000.0)) AS x_back,
        |       toInteger(round(acos(cos(x)) * 1000000.0)) AS x_back2,
        |       toInteger(round(tan(x) * 1000000.0 - sin(x) / cos(x) * 1000000.0)) AS z4""".stripMargin)
      .collect().head
    assert(idr.getLong(0) === 1000000L && idr.getLong(1) === 0L &&
      idr.getLong(2) === 0L && idr.getLong(3) === 0L &&
      idr.getLong(4) === 1000000L && idr.getLong(5) === 1000000L &&
      idr.getLong(6) === 0L)
    // typing: DOUBLE statically — arithmetic stays numeric
    val tplus = Planner.run(g,
      """MATCH (a:Author {name: "Alice"}) RETURN cos(0.0) + 1 AS x""")
      .collect().head.getDouble(0)
    assert(tplus === 2.0)
    // render∘parse identity across arities (0, 1, 2 args)
    val qt = Parser.parse(
      """MATCH (a:Author) RETURN sin(toFloat(a.nodeId)) AS s, atan2(1.0, 2.0) AS t, pi() AS p, e() AS ee, haversin(0.5) AS h""")
    assert(Parser.parse(qt.render) === qt)
  }

  test("isEmpty(): string and list forms, null-propagating (round 16)") {
    val rows = Planner.run(g,
      """MATCH (p:Paper)
        |RETURN p.name AS n, isEmpty(p.abstract) AS ea,
        |       isEmpty(replace(p.name, p.name, "")) AS es,
        |       isEmpty(labels(p)) AS el
        |ORDER BY n""".stripMargin).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getBoolean(1),
        r.getBoolean(2), r.getBoolean(3))).toSeq
    // P-beta has no abstract → isEmpty(null) = null (not false);
    // a fully-replaced-away string is empty; labels is never empty
    assert(rows === Seq(
      ("P-alpha", false, true, false),
      ("P-beta", null, true, false),
      ("P-gamma", false, true, false)))
    val q = Parser.parse(
      """MATCH (p:Paper) RETURN isEmpty(p.name) AS x""")
    assert(Parser.parse(q.render) === q)
  }

  test("labels(n) types as an array: size/head compose") {
    val row = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |RETURN size(labels(p)) AS n, head(labels(p)) AS first""".stripMargin)
      .collect().head
    assert(row.getLong(0) === 2L && row.getString(1) === "Paper")
  }

  test("dynamic property access n[key]: string-canonical value, null semantics") {
    // the keys(n)→lookup round trip: every non-null scalar property by
    // its runtime name
    val rows = Planner.run(g,
      """MATCH (p:Paper {name: "P-alpha"})
        |WITH p, keys(p) AS ks
        |UNWIND ks AS k
        |RETURN k, p[k] AS v ORDER BY k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    // nameEmbedding is a non-scalar (array) property: present in keys,
    // null under dynamic access (no cross-engine string form)
    assert(rows.toSeq === Seq(("abstract", "about dbs"),
      ("name", "P-alpha"), ("nameEmbedding", null), ("nodeId", "20")))
    // a key naming NO property → null; a null-valued property → null
    val nulls = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"})
        |RETURN p["nope"] AS missing, p["abstract"] AS absent,
        |       p["name"] AS nm""".stripMargin).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) &&
      nulls.getString(2) === "P-beta")
    // the key may be any string expression (here: computed)
    val computed = Planner.run(g,
      """MATCH (p:Paper {name: "P-gamma"})
        |RETURN p[toLower("NAME")] AS v""".stripMargin)
      .collect().head.getString(0)
    assert(computed === "P-gamma")
    // a numeric key is rejected (that spelling is the list index)
    val num = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (p:Paper) RETURN p[size("ab") * 1] AS v"""))
    assert(num.getMessage.contains("STRING key"))
    // render∘parse identity
    val q = Parser.parse(
      """MATCH (p:Paper) RETURN p["name"] AS v, p[toLower("X")] AS w""")
    assert(q.items.head.expr ===
      Ast.DynProp("p", Ast.StrLitE("name")))
    assert(Parser.parse(q.render) === q)
    // a NON-literal bracket on a carried LIST alias parses as DynProp
    // (the parser cannot see bindings) — the planner rejects it with a
    // targeted message, not a confusing node-schema error (advisor r14)
    val listIdx = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH collect(p.name) AS ps
        |UNWIND ps AS k
        |RETURN ps[k] AS v""".stripMargin))
    assert(listIdx.getMessage.contains("integer literal"))
  }

  test("collect over a general expression") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |RETURN collect(toUpper(p.name)) AS all_upper,
        |       collect(DISTINCT size(p.name)) AS lens""".stripMargin)
      .collect().head
    assert(row.getSeq[String](0) === Seq("P-ALPHA", "P-BETA"))
    assert(row.getSeq[Long](1) === Seq(6L, 7L))
    // the v.prop spelling still parses to its historical nodes
    val q = Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN collect(p.name) AS ns")
    assert(q.items.head.expr === Ast.CollectAll("p", "name"))
    assert(Parser.parse(q.render) === q)
  }

  test("WITH-stage ORDER BY takes expressions (hidden barrier key)") {
    // top-2 authors by DOUBLED paper count (an expression over the alias)
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a.name AS author, count(DISTINCT p) AS np
        |ORDER BY np * 2 DESC, author LIMIT 2
        |RETURN author, np""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("Alice", 2L), ("Bob", 1L)))
    // hidden key absent from the carried schema
    val df = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH a.name AS author, count(DISTINCT p) AS np ORDER BY np * 2 DESC LIMIT 1
        |RETURN author, np""".stripMargin)
    assert(df.columns.toSeq === Seq("author", "np"))
  }

  test("pattern comprehension: per-row list of pattern projections") {
    // each author's paper titles as a list — P-beta's missing abstract
    // doesn't matter here; Carol gets hers, and the miss case is below
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name, [(a)-[:WRITES]-(p:Paper) | p.name] AS ps
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(rows === Seq(
      ("Alice", Seq("P-alpha", "P-beta")),
      ("Bob", Seq("P-alpha")),
      ("Carol", Seq("P-gamma"))))
    // inner WHERE filters the pattern; no match → the EMPTY list
    val filtered = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name,
        |       [(a)-[:WRITES]-(p:Paper) WHERE p.abstract IS NOT NULL | toUpper(p.name)] AS ps
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(filtered === Seq(
      ("Alice", Seq("P-ALPHA")),
      ("Bob", Seq("P-ALPHA")),
      ("Carol", Seq("P-GAMMA"))))
    val empty = Planner.run(g,
      """MATCH (i:Institution)
        |RETURN i.name AS name,
        |       [(i)-[:WRITES]-(p:Paper) | p.name] AS ps
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(empty === Seq(("MIT", Seq()), ("Stanford", Seq())))
  }

  test("pattern comprehension composes with size() and WHERE") {
    // prolific = authors with ≥2 papers, via size([pattern])
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |WHERE size([(a)-[:WRITES]-(p:Paper) | p.nodeId]) >= 2
        |RETURN a.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("Alice"))
    // render∘parse identity
    val q = Parser.parse(
      """MATCH (a:Author) RETURN a.name AS name, [(a)-[:WRITES]-(p:Paper) WHERE p.name CONTAINS "alpha" | p.name] AS ps""")
    assert(Parser.parse(q.render) === q)
    // a parenthesized expression in a list literal still backtracks
    val lit = Planner.run(g,
      """MATCH (a:Author {name: "Bob"}) RETURN [(1 + 2), 4] AS l""")
      .collect().head.getSeq[Long](0)
    assert(lit === Seq(3L, 4L))
  }

  test("WITH * carries every bound node var and carried scalar") {
    val rows = Planner.run(g,
      """MATCH (a:Author)-[w:WRITES]-(p:Paper)
        |WITH *, size(p.name) AS plen
        |MATCH (p)-[t:HAS_TOPIC]-(f:FieldOfStudy)
        |RETURN a.name AS author, p.name AS paper, f.name AS topic, plen
        |ORDER BY author, paper""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rows === Seq(
      ("Alice", "P-alpha", "Databases", 7L),
      ("Alice", "P-beta", "Databases", 6L),
      ("Bob", "P-alpha", "Databases", 7L),
      ("Carol", "P-gamma", "Databases", 7L)))
    // chained: the second star re-carries the first's scalars
    val chained = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})-[w:WRITES]-(p:Paper)
        |WITH *, 1 AS one
        |MATCH (p)-[t:HAS_TOPIC]-(f:FieldOfStudy)
        |WITH *
        |RETURN count(*) AS n, min(one) AS o""".stripMargin).collect().head
    assert((chained.getLong(0), chained.getLong(1)) === ((2L, 1L)))
    // render∘parse keeps the star
    val q = Parser.parse(
      """MATCH (a:Author)-[w:WRITES]-(p:Paper) WITH *, size(p.name) AS plen MATCH (p)-[t:HAS_TOPIC]-(f:FieldOfStudy) RETURN plen""")
    assert(q.prefixes.head.star && Parser.parse(q.render) === q)
  }

  test("IN over a carried list alias (collect → IN membership)") {
    // papers written by MIT authors, then customers... here: topics of
    // papers whose name is in the collected list
    val rows = Planner.run(g,
      """MATCH (i:Institution {name: "MIT"})-[r:AFFILIATED_WITH]-(a:Author)
        |WITH collect(DISTINCT a.name) AS mitNames
        |MATCH (b:Author)-[w:WRITES]-(p:Paper)
        |WHERE b.name IN mitNames
        |RETURN count(DISTINCT p) AS n_papers""".stripMargin)
      .collect().head.getLong(0)
    assert(rows === 2L) // Alice: P-alpha, P-beta; Bob: P-alpha
    // negated form
    val out = Planner.run(g,
      """MATCH (i:Institution {name: "MIT"})-[r:AFFILIATED_WITH]-(a:Author)
        |WITH collect(DISTINCT a.name) AS mitNames
        |MATCH (b:Author)
        |WHERE NOT b.name IN mitNames
        |RETURN b.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("Carol"))
    // unbound alias fails clearly
    val e = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (b:Author) WHERE b.name IN nope RETURN b.name AS n"""))
    assert(e.getMessage.contains("not a carried list alias"))
  }

  test("CALL subquery: per-row top-k via one window row_number") {
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper)
        |       RETURN p.name AS top ORDER BY p.name LIMIT 1 }
        |RETURN a.name AS author, top ORDER BY author""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows === Seq(("Alice", "P-alpha"), ("Bob", "P-alpha"),
      ("Carol", "P-gamma")))
    // LIMIT 2: Alice contributes two rows, the single-paper authors one
    val top2 = Planner.run(g,
      """MATCH (a:Author)
        |CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper)
        |       RETURN p.name AS top ORDER BY p.name DESC LIMIT 2 }
        |RETURN a.name AS author, top ORDER BY author, top""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(top2 === Seq(("Alice", "P-alpha"), ("Alice", "P-beta"),
      ("Bob", "P-alpha"), ("Carol", "P-gamma")))
    // an outer row with NO subquery rows is eliminated (openCypher):
    // institutions never WRITE
    val none = Planner.run(g,
      """MATCH (i:Institution)
        |CALL { WITH i MATCH (i)-[w:WRITES]-(p:Paper)
        |       RETURN p.name AS top ORDER BY p.name LIMIT 1 }
        |RETURN i.name AS name""".stripMargin).collect()
    assert(none.isEmpty)
  }

  test("CALL subquery: per-row aggregates survive empty input") {
    // count → 0 and collect → [] for institutions (no WRITES edges)
    val rows = Planner.run(g,
      """MATCH (i:Institution)
        |CALL { WITH i MATCH (i)-[w:WRITES]-(p:Paper)
        |       RETURN count(p) AS np, collect(p.name) AS ps }
        |RETURN i.name AS name, np, ps ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
      .toSeq
    assert(rows === Seq(("MIT", 0L, Seq()), ("Stanford", 0L, Seq())))
    // and genuine per-row aggregates where matches exist
    val counts = Planner.run(g,
      """MATCH (a:Author)
        |CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper) RETURN count(p) AS np }
        |RETURN a.name AS author, np ORDER BY author""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts === Seq(("Alice", 2L), ("Bob", 1L), ("Carol", 1L)))
    // render∘parse identity
    val q = Parser.parse(
      """MATCH (a:Author) CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper) RETURN count(p) AS np } RETURN a.name AS author, np ORDER BY author""")
    assert(q.calls.length === 1 && Parser.parse(q.render) === q)
    // imports must be bound and appear in the pattern
    intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author) CALL { WITH z MATCH (z)-[w:WRITES]-(p:Paper) RETURN count(p) AS np } RETURN np"""))
    intercept[Parser.ParseError](Parser.parse(
      """MATCH (a:Author) CALL { WITH a MATCH (a)-[w:WRITES]-(p:Paper) RETURN p.name } RETURN a.name AS n"""))
  }

  test("CALL subquery: grouped aggregation eliminates empty outer rows") {
    // a GROUPING item next to the aggregate: openCypher's grouped
    // aggregation over empty input yields zero rows, so an institution
    // (no WRITES) is eliminated — never a fabricated (null, 0) row
    val none = Planner.run(g,
      """MATCH (i:Institution)
        |CALL { WITH i MATCH (i)-[w:WRITES]-(p:Paper)
        |       RETURN p.name AS pname, count(*) AS n }
        |RETURN i.name AS name, pname, n""".stripMargin).collect()
    assert(none.isEmpty)
    // with matches, one row per (outer row, group): Alice touches
    // P-alpha twice (WRITES e4 + REVIEWS e12) and P-beta once
    val rows = Planner.run(g,
      """MATCH (a:Author {name: "Alice"})
        |CALL { WITH a MATCH (a)-[w]-(p:Paper)
        |       RETURN p.name AS pname, count(*) AS n }
        |RETURN pname, n ORDER BY pname""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("P-alpha", 2L), ("P-beta", 1L)))
  }

  test("$param in expression position and arithmetic-headed WHERE") {
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |WHERE a.name CONTAINS $frag AND a.nodeId % 2 = 0
        |RETURN a.name + $suffix AS tagged ORDER BY tagged""".stripMargin,
      Map("frag" -> "l", "suffix" -> "!"))
      .collect().map(_.getString(0)).toSeq
    // even nodeIds: Alice(10), Carol(12); both contain 'l'
    assert(rows === Seq("Alice!", "Carol!"))
    // coalesce with a parameter fallback
    val co = Planner.run(g,
      """MATCH (p:Paper {name: "P-beta"})
        |RETURN coalesce(p.abstract, $fb) AS a""".stripMargin,
      Map("fb" -> "none")).collect().head.getString(0)
    assert(co === "none")
    // missing parameter names itself
    val e = intercept[IllegalArgumentException](Planner.run(g,
      """MATCH (a:Author) RETURN a.name + $nope AS x""").collect())
    assert(e.getMessage.contains("$nope"))
  }

  test("power operator: right-associative, always double") {
    val row = Planner.run(g,
      """MATCH (a:Author {name: "Bob"})
        |RETURN 2 ^ 3 ^ 2 AS p9, (2 ^ 3) ^ 2 AS p6, 2 ^ 3 / 2 AS half"""
        .stripMargin).collect().head
    assert(row.getDouble(0) === 512.0) // right-assoc: 2^(3^2)
    assert(row.getDouble(1) === 64.0)
    assert(row.getDouble(2) === 4.0)   // double division (pow is double)
    val q = Parser.parse("MATCH (a:Author) RETURN (2 ^ 3) ^ 2 AS x, 2 ^ 3 ^ 2 AS y")
    assert(Parser.parse(q.render) === q)
  }

  test("function-headed IN membership") {
    val rows = Planner.run(g,
      """MATCH (a:Author) WHERE toUpper(a.name) IN ["ALICE", "CAROL"]
        |RETURN a.name AS name ORDER BY name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("Alice", "Carol"))
    val viaSize = Planner.run(g,
      """MATCH (a:Author) WHERE size(a.name) IN [3]
        |RETURN a.name AS name""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(viaSize === Seq("Bob"))
  }

  test("general COUNT { } subquery: multi-hop, inner WHERE, miss → 0") {
    // 2-hop count: papers reachable from each institution via authors
    val rows = Planner.run(g,
      """MATCH (i:Institution)
        |RETURN i.name AS name,
        |       COUNT { (i)-[:AFFILIATED_WITH]-(a:Author)-[:WRITES]-(p:Paper) } AS np
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // MIT: Alice(P-alpha, P-beta) + Bob(P-alpha) = 3 paths; Stanford: 1
    assert(rows === Seq(("MIT", 3L), ("Stanford", 1L)))
    // inner WHERE + WHERE usage + zero case
    val gated = Planner.run(g,
      """MATCH (a:Author)
        |WHERE COUNT { (a)-[:WRITES]-(p:Paper) WHERE p.abstract IS NOT NULL } >= 1
        |RETURN a.name AS name,
        |       COUNT { (a)-[:CITES]-(x)-[:CITES]-(y) } AS c2
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gated === Seq(("Alice", 0L), ("Bob", 0L), ("Carol", 0L)))
    // the 1-hop degree sugar keeps its own AST node
    val q1 = Parser.parse("MATCH (a:Author) RETURN count { (a)-[:WRITES]-(:Paper) } AS d")
    assert(q1.items.head.expr.isInstanceOf[Ast.DegreeOf])
    val q2 = Parser.parse(
      "MATCH (a:Author) RETURN COUNT { (a)-[:WRITES]-(p:Paper)-[:HAS_TOPIC]-(f) } AS c")
    assert(q2.items.head.expr.isInstanceOf[Ast.PatternCount])
    assert(Parser.parse(q2.render) === q2)
  }

  test("COLLECT { } subquery is pattern-comprehension sugar") {
    val rows = Planner.run(g,
      """MATCH (a:Author)
        |RETURN a.name AS name,
        |       COLLECT { MATCH (a)-[:WRITES]-(p:Paper) WHERE p.abstract IS NOT NULL RETURN toUpper(p.name) } AS ps
        |ORDER BY name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(rows === Seq(("Alice", Seq("P-ALPHA")), ("Bob", Seq("P-ALPHA")),
      ("Carol", Seq("P-GAMMA"))))
    // parses to the same node as the comprehension; canonical render is
    // the bracket form and re-parses identically
    val q = Parser.parse(
      """MATCH (a:Author) RETURN COLLECT { MATCH (a)-[:WRITES]-(p:Paper) RETURN p.name } AS ps""")
    assert(q.items.head.expr.isInstanceOf[Ast.PatternComp])
    assert(q.render.contains("[(a)-[:WRITES]-(p:Paper) | p.name]"))
    assert(Parser.parse(q.render) === q)
  }

  test("aggregates stay rejected inside list expressions") {
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN [count(p), 1] AS bad"))
    intercept[Parser.ParseError](Parser.parse(
      "MATCH (a:Author)-[w:WRITES]-(p:Paper) RETURN reduce(acc = 0, x IN collect(p.nodeId) | acc + x) AS bad"))
  }
}
