package graft.cypher

import Ast._

/** Hand-rolled recursive-descent parser for the mini-Cypher grammar in
  * [[Ast]] (no external parser deps — offline build). Replaces the
  * reference's brittle `str.split`-based query surgery
  * (retrieval/retriever.py:3-12 — its own comment says "Replace with
  * regex"); a real AST makes the rewrite + execution robust by construction.
  *
  * Case-sensitive keywords like Neo4j's are accepted case-insensitively.
  */
object Parser {

  final case class ParseError(message: String, pos: Int)
    extends RuntimeException(s"$message at position $pos")

  def parse(input: String): CypherQuery = {
    val p = new P(input)
    val q = p.query()
    p.expectEnd()
    q
  }

  /** Parse a (possibly UNION-chained) query. A single-part input yields
    * `UnionQuery(Seq(q), all = false)` — which plans as the plain query. */
  def parseUnion(input: String): UnionQuery = new P(input).unionQuery()

  /** Parse the restricted mutation clause
    * `MERGE (n:L {nodeId: <int>}) [ON CREATE SET …] [ON MATCH SET …]
    * [SET …]` ([[Ast.MergeQuery]]). */
  def parseMerge(input: String): MergeQuery = {
    val p = new P(input)
    val q = p.mergeQuery()
    p.expectEnd()
    q
  }

  /** Parse the restricted deletion clause
    * `MATCH (n:L [{prop: lit}]) [WHERE …] [DETACH] DELETE n`
    * ([[Ast.DeleteQuery]]). */
  def parseDelete(input: String): DeleteQuery = {
    val p = new P(input)
    val q = p.deleteQuery()
    p.expectEnd()
    q
  }

  /** Parse the restricted node-creation clause
    * `CREATE (n:L {nodeId: <int>[, p: lit]*}) [, …]`
    * ([[Ast.CreateNodesQuery]]). */
  def parseCreateNodes(input: String): CreateNodesQuery = {
    val p = new P(input)
    val q = p.createNodesQuery()
    p.expectEnd()
    q
  }

  /** Parse ONE scalar expression — the planner re-resolves a final
    * ORDER BY key stored as canonical expression text. */
  def parseExpression(input: String): Expr = {
    val p = new P(input)
    val e = p.expressionEntry()
    p.expectEnd()
    e
  }

  /** Parse the MATCH-prefixed mutation clauses: standalone
    * `SET` / `REMOVE` ([[Ast.UpdateQuery]], Left) or relationship
    * `CREATE` / `MERGE` ([[Ast.RelMutationQuery]], Right). */
  def parseMutation(input: String): Either[UpdateQuery, RelMutationQuery] = {
    val p = new P(input)
    val q = p.mutationQuery()
    p.expectEnd()
    q
  }

  /** Parse the bulk record-driven mutation
    * `UNWIND $rows AS r MERGE/CREATE (n:L {nodeId: r.<key>}) [SET …]`
    * or its `FOREACH (r IN $rows | …)` sugar ([[Ast.BulkUpsertQuery]]). */
  def parseBulkUpsert(input: String): BulkUpsertQuery = {
    val p = new P(input)
    val q = p.bulkUpsertQuery()
    p.expectEnd()
    q
  }

  /** Parse the bulk relationship upsert — the reference loader's edge
    * statement: `UNWIND $pairs AS pr MATCH (src:L {nodeId: pr[0]})
    * MATCH (tgt:L {nodeId: pr[1]}) MERGE/CREATE (src)-[:T]->(tgt)`
    * ([[Ast.BulkRelQuery]]). */
  def parseBulkRel(input: String): BulkRelQuery = {
    val p = new P(input)
    val q = p.bulkRelQuery()
    p.expectEnd()
    q
  }

  private final class P(in: String) {
    private var pos = 0

    // ---- low-level ----
    private def ws(): Unit = { while (pos < in.length && in(pos).isWhitespace) pos += 1 }
    private def peek(kw: String): Boolean = {
      ws()
      if (!in.regionMatches(true, pos, kw, 0, kw.length)) false
      else if (kw.nonEmpty && kw.last.isLetter) {
        // word keywords must end at an identifier boundary ("count" must not
        // match a variable named "counter")
        val next = pos + kw.length
        !(next < in.length && (in(next).isLetterOrDigit || in(next) == '_'))
      } else true
    }
    private def opt(kw: String): Boolean = {
      if (peek(kw)) { pos += kw.length; true } else false
    }

    /** [[peek]] for a FUNCTION name: true only when a '(' follows, so a
      * bare column that happens to be named `size` / `min` / `count` / …
      * still parses as a reference instead of making every function name
      * a reserved word. */
    private def peekCall(kw: String): Boolean = {
      if (!peek(kw)) false
      else {
        var i = pos + kw.length
        while (i < in.length && in(i).isWhitespace) i += 1
        i < in.length && in(i) == '('
      }
    }
    /** [[peekCall]]'s twin for the brace-argument form: true only when a
      * '{' follows (`count { (n)--() }`). */
    private def peekBrace(kw: String): Boolean = {
      if (!peek(kw)) false
      else {
        var i = pos + kw.length
        while (i < in.length && in(i).isWhitespace) i += 1
        i < in.length && in(i) == '{'
      }
    }

    private def expect(kw: String): Unit =
      if (!opt(kw)) fail(s"expected '$kw'")
    private def fail(msg: String): Nothing = throw ParseError(msg, pos)

    private def ident(): String = {
      ws()
      val start = pos
      while (pos < in.length && (in(pos).isLetterOrDigit || in(pos) == '_')) pos += 1
      if (pos == start) fail("expected identifier")
      in.substring(start, pos)
    }

    private def param(): String = { ws(); expect("$"); ident() }

    /** A SKIP/LIMIT count: an integer literal or `$param` (round 15 —
      * parameterized paging; the planner resolves and validates it). */
    private def countVal(): CountVal = {
      ws()
      if (pos < in.length && in(pos) == '$') CountParam(param())
      else CountLit(longLit().toInt)
    }

    private def stringLit(): String = {
      ws()
      val quote = if (pos < in.length && (in(pos) == '"' || in(pos) == '\'')) in(pos)
                  else fail("expected string literal")
      pos += 1
      val sb = new StringBuilder
      while (pos < in.length && in(pos) != quote) {
        if (in(pos) == '\\' && pos + 1 < in.length) { sb += in(pos + 1); pos += 2 }
        else { sb += in(pos); pos += 1 }
      }
      if (pos >= in.length) fail("unterminated string")
      pos += 1
      sb.toString
    }

    private def longLit(): Long = {
      ws()
      val start = pos
      if (pos < in.length && in(pos) == '-') pos += 1
      val digits = pos
      while (pos < in.length && in(pos).isDigit) pos += 1
      // a bare '-' must be a ParseError with position, not a raw
      // NumberFormatException from "-".toLong
      if (pos == digits) fail("expected integer")
      in.substring(start, pos).toLong
    }

    /** `[-]digits[.digits]` — the percentile argument (the only place the
      * dialect admits a fractional literal). */
    private def doubleLit(): Double = {
      ws()
      val start = pos
      if (pos < in.length && in(pos) == '-') pos += 1
      val digits = pos
      while (pos < in.length && in(pos).isDigit) pos += 1
      if (pos == digits) fail("expected number")
      if (pos < in.length && in(pos) == '.') {
        pos += 1
        while (pos < in.length && in(pos).isDigit) pos += 1
      }
      in.substring(start, pos).toDouble
    }

    // ---- grammar ----
    def query(): CypherQuery = {
      val stages = Seq.newBuilder[Stage]
      while (true) {
        // after a WITH barrier the query may end in a bare RETURN (the
        // reference's FULL_TEXT_QUERY shape: MATCH … WITH … WHERE … RETURN);
        // the final "stage" then has no MATCH of its own
        val hasMatch = !peek("RETURN")
        val unwinds = Seq.newBuilder[Unwind]
        val paths = Seq.newBuilder[MatchPath]
        var preds: Seq[Pred] = Nil
        var shortest: Option[ShortestPathClause] = None
        if (hasMatch) {
          while (peek("UNWIND")) {
            expect("UNWIND"); ws()
            if (pos < in.length && in(pos) == '[') {
              // self-contained literal form: UNWIND [lit, …] AS x
              val ls = litList(); expect("AS"); val v = ident()
              unwinds += Unwind("", v, Some(ls))
            } else if (peekCall("range")) {
              // UNWIND range(lo, hi[, step]) AS i — expanded to the
              // literal form at parse time (bounded, driver-side)
              expect("range"); expect("(")
              val lo = longLit(); expect(",")
              val hi = longLit()
              ws()
              val step = if (pos < in.length && in(pos) == ',') { pos += 1; longLit() }
                         else 1L
              expect(")")
              if (step <= 0) fail("range step must be a positive integer")
              if (hi >= lo && (hi - lo) / step + 1 > 100000)
                fail("UNWIND range too large (over 100000 elements)")
              expect("AS"); val v = ident()
              unwinds += Unwind("", v,
                Some((lo to hi by step).map(LongLit(_))))
            } else if (pos < in.length && in(pos) == '$') {
              val p = param(); expect("AS"); val v = ident()
              unwinds += Unwind(p, v)
            } else {
              // UNWIND xs AS x — a carried list alias (collect→UNWIND)
              val src = ident(); expect("AS"); val v = ident()
              unwinds += Unwind(src, v, None, carried = true)
            }
          }
          if (unwinds.result().nonEmpty && peek("RETURN")) {
            // UNWIND … RETURN tail (no MATCH of its own) — the classic
            // collect→UNWIND ending; falls through to the RETURN parse
            // with no paths (legal only over a carried frame, checked at
            // plan time)
            if (!unwinds.result().forall(_.carried))
              fail("UNWIND without MATCH takes a carried list alias")
          } else {
          expect("MATCH")
          ws()
          // consecutive MATCH clauses: a variable reused across clauses
          // re-binds by nodeId (the planner's shared-var join); each
          // clause keeps its own WHERE conjuncts. The canonical render is
          // the comma form — see Ast's relationship-uniqueness note.
          def matchTail(): Unit = {
            while ({ ws(); pos < in.length && in(pos) == ',' }) {
              pos += 1; paths += maybeNamedPath()
            }
            preds = predList()
            while (peek("MATCH")) {
              expect("MATCH")
              paths += maybeNamedPath()
              while ({ ws(); pos < in.length && in(pos) == ',' }) {
                pos += 1; paths += maybeNamedPath()
              }
              preds = preds ++ predList()
            }
          }
          if (pos < in.length && in(pos) != '(') {
            val pv = ident(); ws()
            if (pos >= in.length || in(pos) != '=') fail("expected '=' after path variable")
            pos += 1
            if (peek("shortestPath") || peek("allShortestPaths")) {
              // MATCH p = [all]shortestPath[s]((a…)-[:T*lo..hi]-(b…)) —
              // the clause stands alone in ITS group (no unwinds/other
              // paths beside it) but MAY follow WITH stages that bind an
              // endpoint (the carried variable seeds the BFS); the
              // all-form yields one row per distinct shortest path
              val all = opt("allShortestPaths")
              if (!all) expect("shortestPath")
              expect("(")
              val p = shortestInner()
              ws()
              if (pos >= in.length || in(pos) != ')') fail("expected ')' closing shortestPath")
              pos += 1
              if (unwinds.result().nonEmpty)
                fail("shortestPath cannot follow UNWIND")
              shortest = Some(ShortestPathClause(pv, p, all))
              preds = predList()
              if (peek("WITH") || peek("OPTIONAL"))
                fail("shortestPath cannot feed a further WITH/OPTIONAL " +
                  "stage — consume length(p)/nodes(p) in RETURN directly")
            } else {
              // named enumerated path: MATCH p = (a)-[…]-(b) — scopes
              // nodes(p) / relationships(p)
              paths += path().copy(name = Some(pv))
              matchTail()
            }
          } else {
            paths += path()
            matchTail()
          }
          } // end MATCH-present branch (vs the UNWIND … RETURN tail)
        }
        // OPTIONAL MATCH chain — final clause only (before RETURN); one
        // path per clause, each with its own pattern-scoped WHERE
        val optionals = Seq.newBuilder[OptionalMatch]
        var sawOptional = false
        while (hasMatch && peek("OPTIONAL")) {
          sawOptional = true
          expect("OPTIONAL"); expect("MATCH")
          val p = path()
          ws()
          if (pos < in.length && in(pos) == ',')
            fail("one path per OPTIONAL MATCH clause (chain clauses instead)")
          optionals += OptionalMatch(p, predList())
        }
        if (sawOptional && peek("WITH"))
          fail("OPTIONAL MATCH is only supported in the final clause (before RETURN)")
        // CALL { … } subqueries — final clause only, chained
        val callsB = Seq.newBuilder[CallSubquery]
        var sawCall = false
        while (hasMatch && peek("CALL")) {
          sawCall = true
          expect("CALL")
          ws()
          if (pos >= in.length || in(pos) != '{') fail("expected '{' after CALL")
          pos += 1
          val imports =
            if (opt("WITH")) {
              val b = Seq.newBuilder[String]
              b += ident()
              while ({ ws(); pos < in.length && in(pos) == ',' }) {
                pos += 1; b += ident()
              }
              b.result()
            } else Nil
          expect("MATCH")
          val ps = Seq.newBuilder[MatchPath]
          ps += path()
          while ({ ws(); pos < in.length && in(pos) == ',' }) {
            pos += 1; ps += path()
          }
          val cpreds = predList(Some("a CALL-subquery"))
          expect("RETURN")
          val citems = Seq.newBuilder[RetItem]
          def item(): Unit = {
            val it = retItem(inWith = true)
            if (it.alias.isEmpty)
              fail("CALL RETURN items must be aliased scalar expressions " +
                "(node variables don't carry out of the subquery)")
            citems += it
          }
          item()
          while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; item() }
          val corder =
            if (opt("ORDER")) {
              expect("BY")
              val ks = Seq.newBuilder[(String, Boolean)]
              def one(): Unit = {
                val r = orderRef()
                val d = if (opt("DESC")) true else { opt("ASC"); false }
                ks += ((r, d))
              }
              one()
              while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
              ks.result()
            } else Nil
          val climit = if (opt("LIMIT")) Some(countVal()) else None
          ws()
          if (pos >= in.length || in(pos) != '}')
            fail("expected '}' closing the CALL subquery")
          pos += 1
          callsB += CallSubquery(imports, ps.result(), cpreds,
            citems.result(), corder, climit)
        }
        if (sawCall && peek("WITH"))
          fail("CALL { … } is only supported in the final clause (before RETURN)")
        if (hasMatch && opt("WITH")) {
          // projection barrier: items must alias expressions (bare vars
          // carry bindings), optional post-projection WHERE; `WITH *`
          // carries every bound node var + carried scalar forward
          val d = opt("DISTINCT")
          val items = Seq.newBuilder[RetItem]
          ws()
          val star =
            if (pos < in.length && in(pos) == '*') { pos += 1; true }
            else false
          if (!star) items += retItem(inWith = true)
          while ({ ws(); pos < in.length && in(pos) == ',' }) {
            pos += 1; items += retItem(inWith = true)
          }
          // openCypher sub-clause order inside WITH: ORDER BY, SKIP, LIMIT,
          // then WHERE (the filter applies after the trim, like Neo4j) —
          // the top-k-per-stage idiom `WITH n, count(…) AS deg
          // ORDER BY deg DESC LIMIT 5`
          val order =
            if (opt("ORDER")) {
              expect("BY")
              val keys = Seq.newBuilder[(String, Boolean)]
              def one(): Unit = {
                // the barrier ORDER BY also takes a full scalar
                // expression over the projected items / carried vars,
                // stored as canonical text like the final clause's
                val e = noAggs(expression())
                val ref = e match {
                  case ColRef(n)     => n
                  case PropRef(v, p) => s"$v.$p"
                  case other         => exprText(other)
                }
                val desc = if (opt("DESC")) true else { opt("ASC"); false }
                keys += ((ref, desc))
              }
              one()
              while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
              keys.result()
            } else Nil
          val skip = if (opt("SKIP")) Some(countVal()) else None
          val lim = if (opt("LIMIT")) Some(countVal()) else None
          stages += Stage(unwinds.result(), paths.result(), preds, d,
            items.result(), predList(), order, skip, lim, star)
        } else {
          expect("RETURN")
          val distinct = opt("DISTINCT")
          val items = Seq.newBuilder[RetItem]
          ws()
          val retStar =
            if (pos < in.length && in(pos) == '*') { pos += 1; true }
            else false
          if (!retStar) items += retItem()
          while ({ ws(); pos < in.length && in(pos) == ',' }) {
            pos += 1; items += retItem()
          }
          val order =
            if (opt("ORDER")) {
              expect("BY")
              val keys = Seq.newBuilder[(String, Boolean)]
              def one(): Unit = {
                // the final ORDER BY takes a full scalar EXPRESSION
                // (ORDER BY size(a.name) DESC); stored as its canonical
                // text — bare refs keep their historical spelling
                val e = noAggs(expression())
                val ref = e match {
                  case ColRef(n)     => n
                  case PropRef(v, p) => s"$v.$p"
                  case other         => exprText(other)
                }
                val desc = if (opt("DESC")) true else { opt("ASC"); false }
                keys += ((ref, desc))
              }
              one()
              while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
              keys.result()
            } else Nil
          val skip = if (opt("SKIP")) Some(countVal()) else None
          val limit = if (opt("LIMIT")) Some(countVal()) else None
          // the query ends here — either end-of-input or a UNION boundary
          // (the caller decides which is legal: parse() demands the end,
          // unionQuery() keeps chaining)
          return CypherQuery(unwinds.result(), paths.result(), preds, distinct,
            items.result(), order, limit, stages.result(), optionals.result(),
            shortest, skip, callsB.result(), retStar)
        }
      }
      throw new IllegalStateException("unreachable")
    }

    /** `MERGE (n:L {nodeId: <int> | $param}) [ON CREATE SET items]
      * [ON MATCH SET items] [SET items]` — clause order free, each at
      * most once. Only the S2 unique key may anchor (literal or scalar
      * parameter); SET values are full scalar expressions over literals,
      * `$params`, and the merged node's own properties (the loader's
      * record-driven shape, stark_neo4j_loading.py:29-37). */
    def mergeQuery(): MergeQuery = {
      expect("MERGE")
      val n = node()
      if (n.label.isEmpty)
        fail("MERGE requires a label: MERGE (n:Label {nodeId: …})")
      if (!n.anchorProp.contains("nodeId"))
        fail("MERGE anchors on the unique key: {nodeId: <integer> | $param}")
      n.anchorValue match {
        case Some(LongLit(_)) | Some(ParamRef(_)) => ()
        case _ => fail("MERGE nodeId must be an integer literal or $param")
      }
      var onCreate: Seq[SetItem] = Nil
      var onMatch: Seq[SetItem] = Nil
      var set: Seq[SetItem] = Nil
      while (peek("ON") || peek("SET")) {
        if (opt("ON")) {
          val create = if (opt("CREATE")) true else { expect("MATCH"); false }
          expect("SET")
          val items = setItems(n.varName)
          if (create) {
            if (onCreate.nonEmpty) fail("duplicate ON CREATE SET")
            onCreate = items
          } else {
            if (onMatch.nonEmpty) fail("duplicate ON MATCH SET")
            onMatch = items
          }
        } else {
          expect("SET")
          if (set.nonEmpty) fail("duplicate SET")
          set = setItems(n.varName)
        }
      }
      MergeQuery(n, onCreate, onMatch, set)
    }

    /** `MATCH (n:L [{prop: lit}]) [WHERE preds] [DETACH] DELETE n` — one
      * single-node pattern; the WHERE takes the full predicate grammar
      * (EXISTS included). */
    def deleteQuery(): DeleteQuery = {
      expect("MATCH")
      val n = node()
      ws()
      if (pos < in.length && (in(pos) == '-' || in(pos) == '<' || in(pos) == ','))
        fail("DELETE matches a single node pattern — constrain with WHERE " +
          "(EXISTS patterns included) instead of extra hops")
      val preds = predList()
      val detach = opt("DETACH")
      expect("DELETE")
      val v = ident()
      if (v != n.varName)
        fail(s"DELETE must name the matched variable ${n.varName}")
      DeleteQuery(n, preds, detach)
    }

    /** `CREATE (n:L {nodeId: <int>[, p: lit]*}) [, (m:L2 {…})]*` — node
      * creation; every pattern needs a label and a literal nodeId key,
      * and all map values must be literals (pre-bound, like the loader's
      * per-row parameters). */
    def createNodesQuery(): CreateNodesQuery = {
      expect("CREATE")
      val pats = Seq.newBuilder[NodePat]
      def one(): Unit = {
        val n = node()
        if (n.label.isEmpty)
          fail("CREATE requires a label: CREATE (n:Label {nodeId: …})")
        val pairs = (n.anchorProp, n.anchorValue) match {
          case (Some(p), Some(v)) => (p, v) +: n.extraAnchors
          case _ => fail("CREATE requires a property map with the nodeId key")
        }
        if (!pairs.exists { case (p, v) =>
              p == "nodeId" && v.isInstanceOf[LongLit] })
          fail("CREATE requires a literal nodeId key (the S2 unique key)")
        pairs.foreach {
          case (_, StrLit(_)) | (_, LongLit(_)) => ()
          case (p, other) => fail(s"CREATE property $p must be a literal, got $other")
        }
        pats += n
      }
      one()
      while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
      CreateNodesQuery(pats.result())
    }

    /** The MATCH-prefixed mutation clauses: standalone `SET` / `REMOVE`
      * over one matched node pattern, or relationship `CREATE` / `MERGE`
      * between two matched anchors. */
    def mutationQuery(): Either[UpdateQuery, RelMutationQuery] = {
      expect("MATCH")
      val n1 = node()
      ws()
      val n2: Option[NodePat] =
        if (pos < in.length && in(pos) == ',') { pos += 1; Some(node()) }
        else None
      val preds = predList()
      if (peek("SET") || peek("REMOVE")) {
        if (n2.nonEmpty)
          fail("SET/REMOVE matches a single node pattern")
        if (opt("SET")) {
          // optional LEADING map-merge item `n += $props` (the canonical
          // position — explicit items after it win on the same key)
          val saved = pos
          val plus: Option[String] =
            try {
              val v0 = ident()
              ws()
              if (pos + 1 < in.length && in(pos) == '+' && in(pos + 1) == '=') {
                if (v0 != n1.varName)
                  fail(s"SET += targets the matched variable ${n1.varName}")
                pos += 2
                Some(param())
              } else { pos = saved; None }
            } catch { case _: ParseError => pos = saved; None }
          val (items, labels) =
            if (plus.isEmpty) updateSetItems(n1.varName)
            else if ({ ws(); pos < in.length && in(pos) == ',' }) {
              pos += 1; updateSetItems(n1.varName)
            } else (Nil, Nil)
          // SET may CHAIN a REMOVE clause in the same statement
          // (Neo4j's clause chaining; round 15)
          val (rs, rl) =
            if (peek("REMOVE")) { expect("REMOVE"); removeItems(n1.varName) }
            else (Nil, Nil)
          Left(UpdateQuery(n1, preds, items, rs, plus, labels, rl))
        }
        else {
          expect("REMOVE")
          val (rs, rl) = removeItems(n1.varName)
          Left(UpdateQuery(n1, preds, Nil, rs, None, Nil, rl))
        }
      } else {
        val merge = if (opt("MERGE")) true else { expect("CREATE"); false }
        val b = n2.getOrElse(
          fail("relationship CREATE/MERGE needs two anchors: MATCH (a…), (b…)"))
        expect("("); val v1 = ident(); expect(")")
        ws()
        var dir = 0
        if (pos < in.length && in(pos) == '<') { dir = -1; pos += 1 }
        expect("-"); expect("["); expect(":")
        val t = ident()
        expect("]"); expect("-")
        ws()
        if (pos < in.length && in(pos) == '>') {
          if (dir == -1) fail("relationship cannot point both ways")
          dir = 1; pos += 1
        }
        expect("("); val v2 = ident(); expect(")")
        if (!merge && dir == 0)
          fail("CREATE requires a relationship direction (like Neo4j)")
        if (v1 == n1.varName && v2 == b.varName)
          Right(RelMutationQuery(n1, b, preds, t, dir, merge))
        else if (v1 == b.varName && v2 == n1.varName)
          // the pattern re-orients: keep (a, b) as written in the pattern
          Right(RelMutationQuery(b, n1, preds, t, dir, merge))
        else fail("CREATE/MERGE endpoints must name the two matched variables")
      }
    }

    /** `UNWIND $rows AS r MERGE/CREATE (n:L {nodeId: r.<key>})
      * [ON CREATE SET …] [ON MATCH SET …] [SET …]` or the FOREACH
      * sugar `FOREACH (r IN $rows | MERGE … SET …)` — the loader's
      * record-driven bulk upsert. The key must come from the row
      * variable; CREATE takes plain SET only. */
    def bulkUpsertQuery(): BulkUpsertQuery = {
      val (pm, rowVar, foreach) =
        if (peek("FOREACH")) {
          expect("FOREACH")
          ws()
          if (pos >= in.length || in(pos) != '(') fail("expected '(' after FOREACH")
          pos += 1
          val rv = ident(); expect("IN"); val p0 = param()
          ws()
          if (pos >= in.length || in(pos) != '|')
            fail("expected '|' in FOREACH (r IN $rows | …)")
          pos += 1
          (p0, rv, true)
        } else {
          expect("UNWIND"); val p0 = param(); expect("AS"); val rv = ident()
          (p0, rv, false)
        }
      val create = if (opt("CREATE")) true else { expect("MERGE"); false }
      ws()
      if (pos >= in.length || in(pos) != '(') fail("expected '('")
      pos += 1
      val v = ident()
      ws()
      if (pos >= in.length || in(pos) != ':')
        fail("bulk CREATE/MERGE requires a label")
      pos += 1
      val label = ident()
      ws()
      if (pos >= in.length || in(pos) != '{')
        fail("bulk CREATE/MERGE anchors on {nodeId: " + rowVar + ".<field>}")
      pos += 1
      val kp = ident()
      if (kp != "nodeId")
        fail("bulk CREATE/MERGE anchors on the unique key nodeId")
      expect(":")
      val rv2 = ident()
      if (rv2 != rowVar)
        fail(s"the key must come from the row variable $rowVar")
      ws()
      if (pos >= in.length || in(pos) != '.') fail("expected '.'")
      pos += 1
      val keyField = ident()
      ws()
      if (pos >= in.length || in(pos) != '}')
        fail("the bulk anchor map holds only the nodeId key — set other " +
          "properties with SET")
      pos += 1
      ws()
      if (pos >= in.length || in(pos) != ')') fail("expected ')'")
      pos += 1
      var onCreate: Seq[SetItem] = Nil
      var onMatch: Seq[SetItem] = Nil
      var set: Seq[SetItem] = Nil
      while (peek("ON") || peek("SET")) {
        if (opt("ON")) {
          val isCreate = if (opt("CREATE")) true else { expect("MATCH"); false }
          expect("SET")
          val items = setItems(v)
          if (isCreate) {
            if (onCreate.nonEmpty) fail("duplicate ON CREATE SET")
            onCreate = items
          } else {
            if (onMatch.nonEmpty) fail("duplicate ON MATCH SET")
            onMatch = items
          }
        } else {
          expect("SET")
          if (set.nonEmpty) fail("duplicate SET")
          set = setItems(v)
        }
      }
      if (create && (onCreate.nonEmpty || onMatch.nonEmpty))
        fail("CREATE takes plain SET only (no ON CREATE / ON MATCH)")
      if (foreach) {
        ws()
        if (pos >= in.length || in(pos) != ')')
          fail("expected ')' closing FOREACH")
        pos += 1
      }
      BulkUpsertQuery(pm, rowVar,
        NodePat(v, Some(label), Some("nodeId"), None), keyField,
        onCreate, onMatch, set, create, foreach)
    }

    /** `UNWIND $pairs AS pr MATCH (src:L {nodeId: pr[0]}) MATCH (tgt:L
      * {nodeId: pr[1]}) MERGE/CREATE (src)-[:T]->(tgt)` — the loader's
      * edge statement. The anchor indices must be pr[0] / pr[1] in that
      * order. */
    def bulkRelQuery(): BulkRelQuery = {
      expect("UNWIND"); val pm = param(); expect("AS"); val rowVar = ident()
      def anchoredNode(idx: Int): NodePat = {
        expect("MATCH")
        ws()
        if (pos >= in.length || in(pos) != '(') fail("expected '('")
        pos += 1
        val v = ident()
        val label =
          if ({ ws(); pos < in.length && in(pos) == ':' }) {
            pos += 1; Some(ident())
          } else None
        ws()
        if (pos >= in.length || in(pos) != '{')
          fail(s"expected {nodeId: $rowVar[$idx]}")
        pos += 1
        val kp = ident()
        if (kp != "nodeId") fail("bulk edge anchors on the nodeId key")
        expect(":")
        val rv = ident()
        if (rv != rowVar) fail(s"the key must come from $rowVar")
        ws()
        if (pos >= in.length || in(pos) != '[') fail(s"expected [$idx]")
        pos += 1
        val i = longLit()
        if (i != idx) fail(s"expected $rowVar[$idx] (src then tgt)")
        ws()
        if (pos >= in.length || in(pos) != ']') fail("expected ']'")
        pos += 1
        ws()
        if (pos >= in.length || in(pos) != '}') fail("expected '}'")
        pos += 1
        ws()
        if (pos >= in.length || in(pos) != ')') fail("expected ')'")
        pos += 1
        NodePat(v, label, Some("nodeId"), None)
      }
      val src = anchoredNode(0)
      val tgt = anchoredNode(1)
      if (src.varName == tgt.varName)
        fail("src and tgt must bind distinct variables")
      val merge = if (opt("MERGE")) true else { expect("CREATE"); false }
      expect("("); val v1 = ident(); expect(")")
      ws()
      var dir = 0
      if (pos < in.length && in(pos) == '<') { dir = -1; pos += 1 }
      expect("-"); expect("["); expect(":")
      val t = ident()
      expect("]"); expect("-")
      ws()
      if (pos < in.length && in(pos) == '>') {
        if (dir == -1) fail("relationship cannot point both ways")
        dir = 1; pos += 1
      }
      expect("("); val v2 = ident(); expect(")")
      if (!merge && dir == 0)
        fail("CREATE requires a relationship direction (like Neo4j)")
      if (v1 == src.varName && v2 == tgt.varName)
        BulkRelQuery(pm, rowVar, src, tgt, t, dir, merge)
      else if (v1 == tgt.varName && v2 == src.varName)
        // canonicalize: src (pr[0]) is always written first; the swapped
        // spelling is the same edge with the arrow flipped
        BulkRelQuery(pm, rowVar, src, tgt, t, -dir, merge)
      else fail("MERGE/CREATE endpoints must name the two matched variables")
    }

    /** Mixed REMOVE items: `v.p` property removals and `v:Label[:L2]`
      * label-mutation items (round 15) — returned as (property removes,
      * labels to drop). */
    private def removeItems(matchVar: String)
        : (Seq[(String, String)], Seq[String]) = {
      val rs = Seq.newBuilder[(String, String)]
      val ls = Seq.newBuilder[String]
      def one(): Unit = {
        val v = ident()
        if (v != matchVar)
          fail(s"REMOVE must target the matched variable $matchVar")
        ws()
        if (pos < in.length && in(pos) == ':') {
          while ({ ws(); pos < in.length && in(pos) == ':' }) {
            pos += 1; ls += ident()
          }
        } else {
          expect("."); val p = ident()
          rs += ((v, p))
        }
      }
      one()
      while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
      (rs.result(), ls.result())
    }

    /** Mixed SET items: `v.p = expr` property writes and `v:Label[:L2]`
      * label-mutation items (round 15) — returned as (property sets,
      * labels to add). */
    private def updateSetItems(matchVar: String)
        : (Seq[UpdateSet], Seq[String]) = {
      val items = Seq.newBuilder[UpdateSet]
      val labels = Seq.newBuilder[String]
      def one(): Unit = {
        val v = ident()
        if (v != matchVar)
          fail(s"SET must target the matched variable $matchVar")
        ws()
        if (pos < in.length && in(pos) == ':') {
          // `SET n:Label[:Label2]` — label-mutation item(s)
          while ({ ws(); pos < in.length && in(pos) == ':' }) {
            pos += 1; labels += ident()
          }
        } else {
          expect("."); val p = ident()
          ws()
          if (pos >= in.length || in(pos) != '=') fail("expected '=' in SET")
          pos += 1
          val e = expression()
          if (isAggExpr(e) || containsNestedAgg(e))
            fail("SET values are scalar expressions — aggregates cannot appear")
          items += UpdateSet(v, p, e)
        }
      }
      one()
      while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
      (items.result(), labels.result())
    }

    private def setItems(mergeVar: String): Seq[SetItem] = {
      val items = Seq.newBuilder[SetItem]
      def one(): Unit = {
        val v = ident()
        if (v != mergeVar)
          fail(s"SET may only assign properties of $mergeVar")
        ws()
        if (pos >= in.length || in(pos) != '.') fail("expected '.'")
        pos += 1
        val p = ident()
        if (p == "nodeId" || p == "label" || p == "labels")
          fail(s"SET cannot reassign the identity column $p")
        ws()
        if (pos >= in.length || in(pos) != '=') fail("expected '='")
        pos += 1
        // a full scalar expression — literals, $params, and the merged
        // node's own properties ([[updateSetItems]]'s grammar)
        val e = expression()
        if (isAggExpr(e) || containsNestedAgg(e))
          fail("SET values are scalar expressions — aggregates cannot appear")
        items += SetItem(v, p, e)
      }
      one()
      while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
      items.result()
    }

    def expectEnd(): Unit = {
      ws()
      if (pos != in.length) fail(s"trailing input: '${in.substring(pos).take(20)}'")
    }

    /** `query (UNION [ALL] query)*` — the ALL-ness must be uniform across
      * every boundary (Neo4j: "Invalid combination of UNION and UNION
      * ALL"). */
    def unionQuery(): UnionQuery = {
      val parts = Seq.newBuilder[CypherQuery]
      parts += query()
      var all: Option[Boolean] = None
      while (opt("UNION")) {
        val isAll = opt("ALL")
        all match {
          case Some(a) if a != isAll =>
            fail("invalid combination of UNION and UNION ALL")
          case _ => all = Some(isAll)
        }
        parts += query()
      }
      expectEnd()
      UnionQuery(parts.result(), all.getOrElse(false))
    }

    /** `existsCtx` names the surrounding clause when `EXISTS { … }` is NOT
      * plannable there (only an EXISTS inner WHERE now — MATCH, OPTIONAL
      * MATCH, and WITH WHERE all plan it) — rejected at parse time with a
      * grammar-level message instead of surfacing an opaque
      * AnalysisException from the planner.
      *
      * WHERE is a full boolean expression with Cypher precedence
      * (NOT > AND > OR, parentheses group); the top-level AND chain
      * flattens back into the conjunct list (so `a AND b` still yields
      * two preds, the legacy shape every plan path consumes). EXISTS
      * pattern predicates compose freely: a top-level conjunct plans as a
      * semi/anti join, one nested under OR/NOT/parens as a marker left
      * join (Planner.applyPreds). */
    private def predList(existsCtx: Option[String] = None): Seq[Pred] =
      if (opt("WHERE")) flatAnds(orTree(existsCtx)) else Nil

    private def flatAnds(p: Pred): Seq[Pred] = p match {
      case AndPred(l, r) => flatAnds(l) ++ flatAnds(r)
      case x => Seq(x)
    }

    /** `orTree := andTree (OR andTree)*` — OR binds loosest. */
    private def orTree(ctx: Option[String]): Pred = {
      var l = andTree(ctx)
      while (opt("OR")) l = OrPred(l, andTree(ctx))
      l
    }

    /** `andTree := boolTerm (AND boolTerm)*`. */
    private def andTree(ctx: Option[String]): Pred = {
      var l = boolTerm(ctx)
      while (opt("AND")) l = AndPred(l, boolTerm(ctx))
      l
    }

    /** Backtracking probe for Neo4j's PATTERN-AS-PREDICATE sugar:
      * `WHERE [NOT] (a)-[:T]-(b)` ≡ `[NOT] EXISTS { (a)-[:T]-(b) }`.
      * Succeeds only on a ≥1-hop path starting at the CURRENT '(' — a
      * bare parenthesized node or any non-pattern text restores the
      * position and returns None (the group parse takes over). */
    private def tryPatternPred(): Option[MatchPath] = {
      val saved = pos
      try {
        val p = path()
        if (p.rels.nonEmpty) Some(p) else { pos = saved; None }
      } catch { case _: ParseError => pos = saved; None }
    }

    /** `boolTerm := [NOT] pattern | NOT '(' orTree ')' | '(' orTree ')'
      * | simple-pred` (NOT before EXISTS / nodeId-IN stays part of the
      * simple pred; a [NOT] pattern is EXISTS sugar). */
    private def boolTerm(ctx: Option[String]): Pred = {
      ws()
      if (peek("NOT")) {
        val saved = pos
        expect("NOT")
        ws()
        if (pos < in.length && in(pos) == '(') {
          tryPatternPred() match {
            case Some(p) =>
              ctx.foreach(c => fail(
                s"pattern predicates are not supported in $c WHERE"))
              ExistsPat(p, negated = true)
            case None =>
              pos += 1
              val inner = orTree(ctx)
              expect(")")
              NotPred(inner)
          }
        } else { pos = saved; pred(ctx) }
      } else if (pos < in.length && in(pos) == '(') {
        tryPatternPred() match {
          case Some(p) =>
            ctx.foreach(c => fail(
              s"pattern predicates are not supported in $c WHERE"))
            ExistsPat(p, negated = false)
          case None =>
            pos += 1
            val inner = orTree(ctx)
            expect(")")
            inner
        }
      } else pred(ctx)
    }

    /** A path that may carry a `p = ` name prefix (non-first pattern
      * slots; shortestPath is only legal in the first slot). */
    private def maybeNamedPath(): MatchPath = {
      ws()
      if (pos < in.length && in(pos) != '(') {
        val pv = ident(); ws()
        if (pos >= in.length || in(pos) != '=')
          fail("expected '=' after path variable")
        pos += 1
        path().copy(name = Some(pv))
      } else path()
    }

    private def path(): MatchPath = {
      val nodes = Seq.newBuilder[NodePat]
      val rels = Seq.newBuilder[RelPat]
      nodes += node()
      while ({ ws(); pos < in.length && (in(pos) == '-' || in(pos) == '<') }) {
        rels += rel()
        nodes += node()
      }
      val n = nodes.result(); val r = rels.result()
      if (n.length > 3) fail("paths of more than 3 nodes are outside the emitted grammar")
      MatchPath(n, r)
    }

    private def node(): NodePat = {
      expect("(")
      val v = ident()
      val label = if ({ ws(); pos < in.length && in(pos) == ':' }) {
        pos += 1; Some(ident())
      } else None
      var prop: Option[String] = None
      var value: Option[AnchorValue] = None
      val extras = Seq.newBuilder[(String, AnchorValue)]
      def anchorValue(): AnchorValue = {
        ws()
        if (pos < in.length && (in(pos) == '"' || in(pos) == '\'')) StrLit(stringLit())
        else if (pos < in.length && (in(pos).isDigit || in(pos) == '-')) LongLit(longLit())
        else if (pos < in.length && in(pos) == '$') ParamRef(param())
        else VarRef(ident())
      }
      ws()
      if (pos < in.length && in(pos) == '{') {
        pos += 1
        prop = Some(ident())
        expect(":")
        value = Some(anchorValue())
        // multi-property map anchor: additional pairs are further
        // equalities on the same frame (literals / $params only — the
        // UNWIND-variable form stays single-pair)
        while ({ ws(); pos < in.length && in(pos) == ',' }) {
          pos += 1
          val p2 = ident()
          expect(":")
          anchorValue() match {
            case VarRef(_) => fail(
              "only the first map-anchor pair may reference an UNWIND variable")
            case v2 => extras += ((p2, v2))
          }
        }
        expect("}")
      }
      expect(")")
      NodePat(v, label, prop, value, extras.result())
    }

    private def rel(): RelPat = {
      ws()
      // `<-[…]-` reverse arrow; `-[…]-` undirected; `-[…]->` forward
      val leftArrow = pos < in.length && in(pos) == '<'
      if (leftArrow) pos += 1
      expect("-")
      expect("[")
      ws()
      val v = if (pos < in.length && in(pos) != ':' && in(pos) != ']' && in(pos) != '*')
                Some(ident()) else None
      val t = relTypeList()
      // variable-length spec: *  |  *n  |  *min..max  (bare * = 1..3, the
      // dialect's cap; Neo4j's unbounded * has no distributed equivalent)
      val range: Option[(Int, Int)] =
        if ({ ws(); pos < in.length && in(pos) == '*' }) {
          pos += 1; ws()
          if (pos < in.length && in(pos).isDigit) {
            val lo = longLit().toInt
            ws()
            val hi = if (pos + 1 < in.length && in(pos) == '.' && in(pos + 1) == '.') {
              pos += 2; longLit().toInt
            } else lo
            if (lo < 1 || hi < lo || hi > 3)
              fail(s"variable-length range *$lo..$hi outside the dialect (1..3)")
            Some((lo, hi))
          } else Some((1, 3))
        } else None
      if (range.isDefined && v.isDefined)
        fail("variable-length relationships cannot bind a variable")
      expect("]")
      expect("-")
      ws()
      val rightArrow = pos < in.length && in(pos) == '>'
      if (rightArrow) pos += 1
      if (leftArrow && rightArrow)
        fail("a relationship cannot point both ways")
      RelPat(v, t, range, if (rightArrow) 1 else if (leftArrow) -1 else 0)
    }

    /** `EXISTS { path [WHERE pred (AND pred)*] }` (NOT already consumed by
      * the caller when negated) — one path per predicate, like the
      * OPTIONAL MATCH rule. The inner WHERE filters the PATTERN's
      * solutions (it may reference pattern-local and shared variables);
      * nesting another EXISTS inside it is out of dialect. */
    private def existsPred(negated: Boolean): Pred = {
      expect("EXISTS")
      ws()
      if (pos >= in.length || in(pos) != '{') fail("expected '{' after EXISTS")
      pos += 1
      val p = path()
      val inner =
        if (peek("WHERE")) { expect("WHERE"); flatAnds(orTree(Some("an EXISTS inner"))) }
        else Nil
      ws()
      if (pos >= in.length || in(pos) != '}')
        fail("expected '}' closing the EXISTS pattern")
      pos += 1
      ExistsPat(p, negated, inner)
    }

    /** `[lit, lit, …]` — the literal list of an IN predicate. */
    private def litList(): Seq[AnchorValue] = {
      expect("[")
      val vs = Seq.newBuilder[AnchorValue]
      def one(): Unit = {
        ws()
        vs += (
          if (pos < in.length && (in(pos) == '"' || in(pos) == '\'')) StrLit(stringLit())
          else if (pos < in.length && (in(pos).isDigit || in(pos) == '-')) LongLit(longLit())
          else fail("expected a string or integer literal in the IN list"))
      }
      one()
      while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
      expect("]")
      val out = vs.result()
      // homogeneous only: a mixed list would reach Spark's In coercion
      // (string-casts the column), which is not Cypher's typed comparison
      if (out.exists(_.isInstanceOf[StrLit]) &&
          out.exists(_.isInstanceOf[LongLit]))
        fail("IN lists must be all strings or all integers")
      out
    }

    /** Neo4j type alternation `:A|B|C` (empty when the rel is untyped). */
    private def relTypeList(): Seq[String] =
      if ({ ws(); pos < in.length && in(pos) == ':' }) {
        pos += 1
        val ts = Seq.newBuilder[String]
        ts += ident()
        while ({ ws(); pos < in.length && in(pos) == '|' }) { pos += 1; ts += ident() }
        ts.result()
      } else Nil

    /** The pattern inside `shortestPath( … )`: exactly two nodes and one
      * relationship, which MUST be variable-length — BFS bounds are wider
      * than the enumeration dialect's (`*lo..hi` with lo ∈ {0,1}, hi ≤ 8;
      * bare `*` = 1..3; `*..hi` = 1..hi) because a frontier pass is
      * O(rounds·frontier), not O(degree^k). */
    private def shortestInner(): MatchPath = {
      val n1 = node()
      expect("-"); expect("[")
      ws()
      if (pos < in.length && in(pos) != ':' && in(pos) != ']' && in(pos) != '*')
        fail("shortestPath relationships cannot bind a variable")
      val t = relTypeList()
      ws()
      if (pos >= in.length || in(pos) != '*')
        fail("shortestPath requires a variable-length relationship (*lo..hi)")
      pos += 1; ws()
      val explicitLo =
        if (pos < in.length && in(pos).isDigit) Some(longLit().toInt) else None
      ws()
      val explicitHi =
        if (pos + 1 < in.length && in(pos) == '.' && in(pos + 1) == '.') {
          pos += 2; Some(longLit().toInt)
        } else None
      val lo = explicitLo.getOrElse(1)
      val hi = explicitHi.getOrElse(if (explicitLo.isDefined) lo else 3)
      if (lo != 0 && lo != 1)
        fail("shortestPath minimum hop bound must be 0 or 1 (like Neo4j)")
      if (hi < lo || hi > 8) fail(s"shortestPath range *$lo..$hi outside 0..8")
      expect("]")
      expect("-")
      ws()
      if (pos < in.length && in(pos) == '>')
        fail("directed patterns not supported (grammar is undirected)")
      val n2 = node()
      if (n1.varName == n2.varName)
        fail("shortestPath endpoints must bind distinct variables")
      MatchPath(Seq(n1, n2), Seq(RelPat(None, t, Some((lo, hi)))))
    }

    /** The single-hop pattern of the degree sugar `count { (n)-[:T]-() }`
      * / `size((n)--())`: a bound variable, a rel spec that cannot bind a
      * variable or range, and an ANONYMOUS far node with an optional
      * label. Returns the [[DegreeOf]] expression. */
    private def degreePattern(): Expr = {
      expect("(")
      val v = ident()
      expect(")")
      ws()
      val leftArrow = pos < in.length && in(pos) == '<'
      if (leftArrow) pos += 1
      expect("-")
      var types: Seq[String] = Nil
      ws()
      if (pos < in.length && in(pos) == '[') {
        pos += 1
        ws()
        if (pos < in.length && in(pos) != ':' && in(pos) != ']')
          fail("degree patterns cannot bind a relationship variable")
        types = relTypeList()
        ws()
        if (pos < in.length && in(pos) == '*')
          fail("degree patterns are single-hop")
        expect("]")
      }
      expect("-")
      ws()
      val rightArrow = pos < in.length && in(pos) == '>'
      if (rightArrow) pos += 1
      if (leftArrow && rightArrow)
        fail("a relationship cannot point both ways")
      expect("(")
      ws()
      val farLabel =
        if (pos < in.length && in(pos) == ':') { pos += 1; Some(ident()) }
        else None
      expect(")")
      DegreeOf(v, types, if (rightArrow) 1 else if (leftArrow) -1 else 0,
        farLabel)
    }

    /** Consume one string-predicate operator if present: `CONTAINS`,
      * `STARTS WITH`, `ENDS WITH`, or `=~`. */
    private def strOp(): Option[String] = {
      ws()
      if (opt("CONTAINS")) Some("CONTAINS")
      else if (opt("STARTS")) { expect("WITH"); Some("STARTS WITH") }
      else if (opt("ENDS")) { expect("WITH"); Some("ENDS WITH") }
      else if (pos + 1 < in.length && in(pos) == '=' && in(pos + 1) == '~') {
        pos += 2; Some("=~")
      } else None
    }

    private def cmpOp(): String = {
      ws()
      if (pos + 1 < in.length && in(pos) == '<' && in(pos + 1) == '>') { pos += 2; "<>" }
      else if (pos + 1 < in.length && in(pos) == '<' && in(pos + 1) == '=') { pos += 2; "<=" }
      else if (pos + 1 < in.length && in(pos) == '>' && in(pos + 1) == '=') { pos += 2; ">=" }
      else if (pos < in.length && in(pos) == '<') { pos += 1; "<" }
      else if (pos < in.length && in(pos) == '>') { pos += 1; ">" }
      else if (pos < in.length && in(pos) == '=') { pos += 1; "=" }
      else fail("expected comparison operator")
    }

    private val scalarFnNames =
      Seq("toLower", "toUpper", "trim", "replace", "substring", "size",
        "abs", "sign", "toString", "toInteger", "toFloat", "id", "head",
        "last", "reverse", "ltrim", "rtrim", "left", "right", "coalesce",
        "floor", "ceil", "sqrt", "round", "ln", "exp", "log10",
        "sin", "cos", "tan", "cot", "asin", "acos", "atan", "atan2",
        "pi", "e", "degrees", "radians", "haversin", "isEmpty",
        "properties", "startNode", "endNode")

    /** WHERE predicates are aggregate-free (Cypher aggregates live in
      * RETURN/WITH; the HAVING idiom is `WITH … AS x WHERE x …`). */
    private def noAggs(e: Expr): Expr = {
      if (containsNestedAgg(e) || isAggExpr(e))
        fail("aggregates cannot appear in WHERE — aggregate at a WITH " +
          "barrier and filter the alias")
      e
    }

    /** The shared operator tail after an expression-valued left side:
      * string predicate, IN (literal list / $param / carried alias),
      * IS [NOT] NULL, or a comparison — with the literal-RHS shapes
      * normalized to the plain-pred nodes their rendered text re-parses
      * to (parse∘render stays the identity). */
    private def predTail(l: Expr): Pred = {
      strOp() match {
        case Some(o) => StrPred(l, o, noAggs(expression()))
        case None =>
          ws()
          if (peek("IN")) {
            expect("IN"); ws()
            if (pos < in.length && in(pos) == '$')
              InParam(l, param(), negated = false)
            else if (pos < in.length && in(pos) == '[')
              InList(l, litList(), negated = false)
            else InCarried(l, ident(), negated = false)
          } else if (peek("IS")) {
            expect("IS"); val neg = opt("NOT"); expect("NULL")
            IsNullPred(l, neg)
          } else {
            val o = cmpOp()
            val r = noAggs(expression())
            (l, r) match {
              case (PropRef(v, p), LongLitE(x)) => PropCmp(v, p, o, LongLit(x))
              case (PropRef(v, p), StrLitE(s))  => PropCmp(v, p, o, StrLit(s))
              case (PropRef(v, p), ParamE(nm))  => PropCmp(v, p, o, ParamRef(nm))
              case (ColRef(n), LongLitE(x))     => ColCmp(n, o, LongLit(x))
              case (ColRef(n), StrLitE(s))      => ColCmp(n, o, StrLit(s))
              case (ColRef(n), ParamE(nm))      => ColCmp(n, o, ParamRef(nm))
              case _                            => ExprCmp(l, o, r)
            }
          }
      }
    }

    private def pred(existsCtx: Option[String] = None): Pred = {
      ws()
      def rejectExists(): Unit = existsCtx.foreach(ctx =>
        fail(s"EXISTS { … } is not supported in $ctx WHERE"))
      if (peekCall("any") || peekCall("all") || peekCall("none") ||
          peekCall("single")) {
        // list quantifiers any/all/none/single(x IN xs WHERE cond)
        val fn = if (opt("any")) "any"
                 else if (opt("all")) "all"
                 else if (opt("none")) "none"
                 else { expect("single"); "single" }
        expect("(")
        val v = ident(); expect("IN")
        val l = noAggs(expression())
        expect("WHERE")
        val c = cond()
        expect(")")
        ListQuantPred(fn, v, l, c)
      }
      else if (scalarFnNames.exists(peekCall) || peekBrace("count")) {
        // function-headed left side: toLower(n.name) CONTAINS "x",
        // size(n.name) > 5, count { (n)--() } >= 3 — parse a full
        // expression, then the shared operator tail (BOTH sides
        // aggregate-free; a degree pattern is a scalar, not an aggregate)
        predTail(noAggs(expression()))
      } else if (peekCall("exists")) {
        // legacy function form exists(n.prop) ≡ n.prop IS NOT NULL
        expect("exists"); expect("(")
        val v = ident(); expect("."); val p = ident(); expect(")")
        IsNullPred(PropRef(v, p), negated = true)
      } else if (peek("NOT")) {
        expect("NOT")
        if (peekCall("exists")) {
          expect("exists"); expect("(")
          val v = ident(); expect("."); val p = ident(); expect(")")
          IsNullPred(PropRef(v, p), negated = false)
        }
        else if (peek("EXISTS")) { rejectExists(); existsPred(negated = true) }
        else if (peekCall("any") || peekCall("all") || peekCall("none") ||
                 peekCall("single"))
          // NOT quantifier — re-enter for the quantifier, wrap the tree
          NotPred(pred(existsCtx))
        else {
          val v = ident()
          ws()
          if (pos < in.length && in(pos) == ':') {
            pos += 1
            return LabelPred(v, ident(), negated = true)
          }
          val prop =
            if (pos < in.length && in(pos) == '.') { pos += 1; Some(ident()) }
            else None
          expect("IN")
          ws()
          if (pos < in.length && in(pos) == '[')
            InList(prop.map(PropRef(v, _)).getOrElse(ColRef(v)),
              litList(), negated = true)
          else if (pos < in.length && in(pos) != '$')
            // NOT … IN carriedListAlias
            InCarried(prop.map(PropRef(v, _)).getOrElse(ColRef(v)),
              ident(), negated = true)
          else {
            val pm = param()
            prop match {
              // nodeId keeps the historical AST node so each rendered
              // text re-parses to exactly one tree
              case Some("nodeId") => NotIdIn(v, pm)
              case Some(p) => InParam(PropRef(v, p), pm, negated = true)
              case None    => InParam(ColRef(v), pm, negated = true)
            }
          }
        }
      } else if (peek("EXISTS")) {
        rejectExists()
        existsPred(negated = false)
      } else if (peek("normalize")) {
        // normalize(lower(col)) = normalize(lower($param)) — ner.py:113
        expect("normalize"); expect("("); expect("lower"); expect("(")
        val c = ident(); expect(")"); expect(")")
        expect("="); expect("normalize"); expect("("); expect("lower"); expect("(")
        val p = param(); expect(")"); expect(")")
        NormEqParam(c, p)
      } else {
        val predStart = { ws(); pos }
        val v1 = ident()
        ws()
        // label test: `v:Label` (the post-bind twin of the inline anchor)
        if (pos < in.length && in(pos) == ':') {
          pos += 1
          return LabelPred(v1, ident(), negated = false)
        }
        // optional property access: `v.prop <op> literal` / `v.prop IS NULL`
        val prop: Option[String] =
          if (pos < in.length && in(pos) == '.') { pos += 1; Some(ident()) }
          else None
        ws()
        // arithmetic-headed left side (`a.nodeId % 2 = 0`, `x + 1 > y`):
        // re-parse from the start as a full expression, then the shared
        // operator tail
        if (pos < in.length && "+-*/%^[".indexOf(in(pos)) >= 0) {
          pos = predStart
          return predTail(noAggs(expression()))
        }
        if (peek("IN")) {
          expect("IN")
          ws()
          val ref = prop.map(PropRef(v1, _)).getOrElse(ColRef(v1))
          if (pos < in.length && in(pos) == '$')
            return InParam(ref, param(), negated = false)
          if (pos < in.length && in(pos) == '[')
            return InList(ref, litList(), negated = false)
          // membership in a CARRIED list alias (collect → IN)
          return InCarried(ref, ident(), negated = false)
        }
        if (peek("IS")) {
          expect("IS")
          val neg = opt("NOT")
          expect("NULL")
          return prop match {
            case Some(p) => IsNullPred(PropRef(v1, p), neg)
            case None    => IsNullPred(ColRef(v1), neg)
          }
        }
        // string predicate on a plain ref: n.name CONTAINS "…" etc.
        strOp().foreach { o =>
          val l = prop.map(PropRef(v1, _)).getOrElse(ColRef(v1))
          return StrPred(l, o, noAggs(expression()))
        }
        // comparison operators, longest first; bare `a <> b` between two
        // identifiers stays the nodeId inequality of the original grammar
        val op = cmpOp()
        ws()
        val value: AnchorValue =
          if (pos < in.length && (in(pos) == '"' || in(pos) == '\'')) StrLit(stringLit())
          else if (pos < in.length && (in(pos).isDigit || in(pos) == '-')) LongLit(longLit())
          else if (pos < in.length && in(pos) == '$') ParamRef(param())
          else VarRef(ident())
        // property-to-property comparison (`a.nodeId < b.nodeId` — the
        // pair-dedup idiom): the value side continues as a PropRef
        if (value.isInstanceOf[VarRef] &&
            { ws(); pos < in.length && in(pos) == '.' }) {
          pos += 1
          val p2 = ident()
          val VarRef(v2) = value: @unchecked
          val l = prop.map(PropRef(v1, _)).getOrElse(ColRef(v1))
          return ExprCmp(l, if (op == "=") "=" else op, PropRef(v2, p2))
        }
        (prop, op, value) match {
          case (Some(p), o, v: StrLit)  => PropCmp(v1, p, o, v)
          case (Some(p), o, v: LongLit) => PropCmp(v1, p, o, v)
          // scalar-parameter comparison: `v.prop >= $min` / `col = $x` —
          // the WHERE twin of the map-parameter anchor
          case (Some(p), o, v: ParamRef) => PropCmp(v1, p, o, v)
          case (None, o, v: ParamRef)    => ColCmp(v1, o, v)
          case (Some(_), o, VarRef(_)) =>
            fail(s"operator '$o' on a property cannot compare against a " +
              "variable; quote string literals")
          case (None, "<>", VarRef(v2)) => VarNeq(v1, v2)
          case (None, o, VarRef(_)) =>
            // out-of-grammar (`col = ident`): reject HERE with position
            // info instead of surfacing a generic plan-time error far
            // from the parse site — only `<>` compares two variables
            fail(s"operator '$o' cannot compare against a variable " +
              "(only <> between two node variables); quote string literals")
          case (None, o, v) => ColCmp(v1, o, v)
        }
      }
    }

    // ---- expressions (RETURN / WITH items): precedence-climbing ----

    /** `addExpr := mulExpr (('+'|'-') mulExpr)*` — left-associative. */
    private def expression(): Expr = {
      var e = mulExpr()
      var go = true
      while (go) {
        ws()
        if (pos < in.length && in(pos) == '+') { pos += 1; e = BinOp("+", e, mulExpr()) }
        else if (pos < in.length && in(pos) == '-') { pos += 1; e = BinOp("-", e, mulExpr()) }
        else go = false
      }
      e
    }

    private def mulExpr(): Expr = {
      var e = powExpr()
      var go = true
      while (go) {
        ws()
        if (pos < in.length && in(pos) == '*') { pos += 1; e = BinOp("*", e, powExpr()) }
        else if (pos < in.length && in(pos) == '/') { pos += 1; e = BinOp("/", e, powExpr()) }
        else if (pos < in.length && in(pos) == '%') { pos += 1; e = BinOp("%", e, powExpr()) }
        else go = false
      }
      e
    }

    /** `powExpr := atom ['^' powExpr]` — exponentiation binds tightest
      * and associates RIGHT (2 ^ 3 ^ 2 = 2^9), like Neo4j; the result is
      * always a double. */
    private def powExpr(): Expr = {
      val l = atomExpr()
      ws()
      if (pos < in.length && in(pos) == '^') { pos += 1; BinOp("^", l, powExpr()) }
      else l
    }

    /** `cond := quantifier | expr (IS [NOT] NULL | <cmpop> expr)` —
      * CASE WHEN / comprehension-WHERE guards. */
    private def cond(): Cond = {
      if (peekCall("any") || peekCall("all") || peekCall("none") ||
          peekCall("single")) {
        val fn = if (opt("any")) "any"
                 else if (opt("all")) "all"
                 else if (opt("none")) "none"
                 else { expect("single"); "single" }
        expect("(")
        val v = ident(); expect("IN")
        val l = noAggs(expression())
        expect("WHERE")
        val c = cond()
        expect(")")
        return QuantCond(fn, v, l, c)
      }
      val l = expression()
      ws()
      if (peek("IS")) {
        expect("IS"); val neg = opt("NOT"); expect("NULL")
        NullCond(l, neg)
      } else if (peek("CONTAINS")) {
        expect("CONTAINS"); StrCond(l, "CONTAINS", expression())
      } else if (peek("STARTS")) {
        expect("STARTS"); expect("WITH"); StrCond(l, "STARTS WITH", expression())
      } else if (peek("ENDS")) {
        expect("ENDS"); expect("WITH"); StrCond(l, "ENDS WITH", expression())
      } else if (pos + 1 < in.length && in(pos) == '=' && in(pos + 1) == '~') {
        pos += 2; StrCond(l, "=~", expression())
      } else {
        val op =
          if (pos + 1 < in.length && in(pos) == '<' && in(pos + 1) == '>') { pos += 2; "<>" }
          else if (pos + 1 < in.length && in(pos) == '<' && in(pos + 1) == '=') { pos += 2; "<=" }
          else if (pos + 1 < in.length && in(pos) == '>' && in(pos + 1) == '=') { pos += 2; ">=" }
          else if (pos < in.length && in(pos) == '<') { pos += 1; "<" }
          else if (pos < in.length && in(pos) == '>') { pos += 1; ">" }
          else if (pos < in.length && in(pos) == '=') { pos += 1; "=" }
          else fail("expected comparison operator or IS [NOT] NULL")
        CmpCond(l, op, expression())
      }
    }

    /** An atom plus any postfix `[i]` / `[a..b]` list accesses (Cypher's
      * 0-based index / slice; bounds are integer literals), or — on a
      * bare variable with a NON-numeric key — the dynamic property
      * access `v[keyExpr]`. */
    private def atomExpr(): Expr = {
      var e = atomBase()
      var go = true
      while (go) {
        ws()
        if (pos < in.length && in(pos) == '[') {
          pos += 1
          ws()
          if (pos < in.length && !in(pos).isDigit && in(pos) != '-' &&
              in(pos) != '.') {
            // dynamic property access v[key] — the key is a string
            // expression; a numeric spelling stays the list index
            val k = expression()
            expect("]")
            e match {
              case ColRef(v) => e = DynProp(v, k)
              case other => fail(
                s"dynamic [key] access applies to a node variable, not $other")
            }
          } else {
          val from: Option[Long] =
            if (pos + 1 < in.length && in(pos) == '.' && in(pos + 1) == '.') None
            else Some(longLit())
          ws()
          if (pos + 1 < in.length && in(pos) == '.' && in(pos + 1) == '.') {
            pos += 2; ws()
            val to = if (pos < in.length && in(pos) == ']') None
                     else Some(longLit())
            expect("]")
            e = ListSlice(e, from, to)
          } else {
            expect("]")
            e = ListIndex(e, from.getOrElse(fail("expected list index")))
          }
          }
        } else go = false
      }
      e
    }

    /** `[' — list literal or general comprehension (the A2 aggregate
      * comprehension stays `size(…)`'s special case). Distinguished by a
      * non-committing `ident IN` lookahead. */
    private def bracketExpr(): Expr = {
      pos += 1 // '['
      ws()
      // pattern comprehension [(n)-[:T]-(m) [WHERE …] | proj] — probed
      // first when the bracket opens on '('; a parenthesized expression
      // (no relationship hop) backtracks to the literal-list parse
      if (pos < in.length && in(pos) == '(') {
        tryPatternPred() match {
          case Some(p) =>
            val preds =
              if (opt("WHERE")) flatAnds(orTree(Some("a pattern-comprehension inner")))
              else Nil
            ws()
            if (pos >= in.length || in(pos) != '|')
              fail("expected '| projection' in the pattern comprehension")
            pos += 1
            val proj = expression()
            expect("]")
            return PatternComp(p, preds, proj)
          case None => () // fall through to the list forms
        }
      }
      val isComp = {
        val p0 = pos
        val r = try { ident(); peek("IN") } catch { case _: ParseError => false }
        pos = p0
        r
      }
      if (isComp) {
        val v = ident(); expect("IN")
        val l = expression()
        ws()
        val c = if (opt("WHERE")) Some(cond()) else None
        ws()
        val pj = if (pos < in.length && in(pos) == '|') { pos += 1; Some(expression()) }
                 else None
        if (c.isEmpty && pj.isEmpty)
          fail("list comprehension needs a WHERE filter and/or '| projection'")
        expect("]")
        ListComp(v, l, c, pj)
      } else {
        ws()
        if (pos < in.length && in(pos) == ']') { pos += 1; ListLit(Nil) }
        else {
          val items = Seq.newBuilder[Expr]
          items += expression()
          while ({ ws(); pos < in.length && in(pos) == ',' }) {
            pos += 1; items += expression()
          }
          expect("]")
          ListLit(items.result())
        }
      }
    }

    /** Numeric literal in expression position: an integer, or — with a
      * `.digit` fraction — a DOUBLE literal (`0.5`, `2.0`; round 15,
      * landed with round()). A `.` NOT followed by a digit is left in
      * place (the `[a..b]` slice range spelling). */
    private def numLit(): Expr = {
      ws()
      val start = pos
      if (pos < in.length && in(pos) == '-') pos += 1
      while (pos < in.length && in(pos).isDigit) pos += 1
      if (pos > start && pos + 1 < in.length && in(pos) == '.' &&
          in(pos + 1).isDigit) {
        pos += 1
        while (pos < in.length && in(pos).isDigit) pos += 1
        DblLitE(in.substring(start, pos).toDouble)
      } else {
        pos = start
        LongLitE(longLit())
      }
    }

    private def atomBase(): Expr = {
      ws()
      if (pos < in.length && in(pos) == '(') {
        pos += 1
        val e = expression()
        expect(")")
        e
      }
      else if (pos < in.length && in(pos) == '[') bracketExpr()
      else if (pos < in.length && in(pos) == '{') {
        // map literal {k: expr, …} — the record-shaping idiom; keys are
        // identifiers, values any scalar expression (maps nest)
        pos += 1
        val entries = Seq.newBuilder[(String, Expr)]
        ws()
        if (pos < in.length && in(pos) == '}')
          fail("empty map literal {} is outside the dialect")
        def one(): Unit = {
          val k = ident(); expect(":"); entries += ((k, expression()))
        }
        one()
        while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
        expect("}")
        val es = entries.result()
        // duplicate keys would plan an ambiguous duplicate-field struct
        // (and duplicate-key JSON downstream); Neo4j rejects them too
        val dups = es.map(_._1).groupBy(identity)
          .collect { case (k, g) if g.size > 1 => k }
        if (dups.nonEmpty)
          fail(s"duplicate map literal key(s): ${dups.toSeq.sorted.mkString(", ")}")
        MapLitE(es)
      }
      else if (pos < in.length && (in(pos).isDigit || in(pos) == '-')) numLit()
      else if (pos < in.length && (in(pos) == '"' || in(pos) == '\'')) StrLitE(stringLit())
      else if (peek("CASE")) {
        expect("CASE")
        val branches = Seq.newBuilder[(Cond, Expr)]
        // simple form `CASE subj WHEN v THEN r …` desugars at parse time
        // to the searched form with equality guards (a null subject
        // matches no branch, identical to the desugared `=`); the
        // canonical render is the searched form
        val subject: Option[Expr] =
          if (peek("WHEN")) None else Some(expression())
        if (!peek("WHEN")) fail("expected WHEN")
        while (peek("WHEN")) {
          expect("WHEN")
          val c = subject match {
            case None    => cond()
            case Some(s) => CmpCond(s, "=", expression())
          }
          expect("THEN"); branches += ((c, expression()))
        }
        val default = if (opt("ELSE")) Some(expression()) else None
        expect("END")
        CaseExpr(branches.result(), default)
      }
      else if (peekCall("coalesce")) {
        expect("coalesce"); expect("(")
        val args = Seq.newBuilder[Expr]
        args += expression()
        while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; args += expression() }
        expect(")")
        CoalesceE(args.result())
      }
      else if (peekCall("sum") || peekCall("avg") || peekCall("stDevP") || peekCall("stDev")) {
        val fn =
          if (opt("sum")) "sum" else if (opt("avg")) "avg"
          else if (opt("stDevP")) "stDevP" else { expect("stDev"); "stDev" }
        expect("(")
        val d = opt("DISTINCT")
        val a = expression()
        expect(")")
        AggFn(fn, a, d)
      }
      else if (peekCall("percentileCont") || peekCall("percentileDisc")) {
        val fn = if (opt("percentileCont")) "percentileCont"
                 else { expect("percentileDisc"); "percentileDisc" }
        expect("(")
        val a = expression()
        expect(",")
        val p = doubleLit()
        expect(")")
        if (p < 0.0 || p > 1.0) fail("percentile must be in [0, 1]")
        PercentileFn(fn, a, p)
      }
      else if (peekCall("toLower") || peekCall("toUpper") || peekCall("trim") ||
               peekCall("abs") || peekCall("sign") || peekCall("toString") ||
               peekCall("toInteger") || peekCall("toFloat") ||
               peekCall("floor") || peekCall("ceil") || peekCall("sqrt") ||
               peekCall("round") || peekCall("ln") || peekCall("exp") ||
               peekCall("log10")) {
        val fn = if (opt("toLower")) "toLower"
                 else if (opt("toUpper")) "toUpper"
                 else if (opt("trim")) "trim"
                 else if (opt("abs")) "abs"
                 else if (opt("sign")) "sign"
                 else if (opt("toString")) "toString"
                 else if (opt("toInteger")) "toInteger"
                 else if (opt("toFloat")) "toFloat"
                 // floor/ceil/sqrt are IEEE-exactly-rounded (engine
                 // portable); round() carries an EXPLICIT tie rule —
                 // half toward +∞ — spelled floor(x + 0.5) on both
                 // engines, which sidesteps the native round()
                 // divergence (DuckDB rounds half away from zero); the
                 // floor form IS the contract (it differs from JDK
                 // Math.round at its documented special cases — see the
                 // planner note). ln/exp/log10 (round 16) are the
                 // TOLERANCE-CHECKED class: transcendentals are not
                 // guaranteed exactly-rounded across libms, so the
                 // dialect contract covers 9 significant decimal digits
                 // only — catalog hash surfaces must quantize (the
                 // round()/integer-micro-unit idiom); raw doubles may
                 // differ a ULP on exotic libms (bit-identical on the
                 // reference pair: glibc/DuckDB vs the JVM, verified)
                 else if (opt("floor")) "floor"
                 else if (opt("ceil")) "ceil"
                 else if (opt("round")) "round"
                 else if (opt("ln")) "ln"
                 else if (opt("exp")) "exp"
                 else if (opt("log10")) "log10"
                 else { expect("sqrt"); "sqrt" }
        expect("("); val a = expression(); expect(")")
        ScalarFn(fn, Seq(a))
      }
      // the trig family (round 16) joins ln/exp/log10 in the
      // TOLERANCE-CHECKED transcendental class: same 9-significant-digit
      // contract, same quantize-the-hash-surface rule
      else if (peekCall("sin") || peekCall("cos") || peekCall("tan") ||
               peekCall("cot") || peekCall("asin") || peekCall("acos") ||
               peekCall("atan") || peekCall("degrees") ||
               peekCall("radians") || peekCall("haversin")) {
        val fn = if (opt("sin")) "sin"
                 else if (opt("cos")) "cos"
                 else if (opt("tan")) "tan"
                 else if (opt("cot")) "cot"
                 else if (opt("asin")) "asin"
                 else if (opt("acos")) "acos"
                 else if (opt("atan")) "atan"
                 else if (opt("degrees")) "degrees"
                 else if (opt("radians")) "radians"
                 else { expect("haversin"); "haversin" }
        expect("("); val a = expression(); expect(")")
        ScalarFn(fn, Seq(a))
      }
      else if (peekCall("atan2")) {
        // Neo4j argument order: atan2(y, x)
        expect("atan2"); expect("(")
        val y = expression(); expect(",")
        val x = expression(); expect(")")
        ScalarFn("atan2", Seq(y, x))
      }
      else if (peekCall("pi") || peekCall("e")) {
        // zero-arg math constants — the nearest doubles to π and e,
        // identical literals on every IEEE-754 engine
        val fn = if (opt("pi")) "pi" else { expect("e"); "e" }
        expect("("); expect(")")
        ScalarFn(fn, Seq.empty)
      }
      else if (peekCall("substring")) {
        // Neo4j substring(s, start[, len]) — 0-indexed; start/len are
        // integer literals (keeps the cross-engine arithmetic static)
        expect("substring"); expect("(")
        val s = expression(); expect(",")
        val start = longLit()
        ws()
        val len = if (pos < in.length && in(pos) == ',') { pos += 1; Some(longLit()) }
                  else None
        expect(")")
        if (start < 0 || len.exists(_ < 0))
          fail("substring start/length must be non-negative")
        ScalarFn("substring",
          s +: LongLitE(start) +: len.map(LongLitE(_)).toSeq)
      }
      else if (peekCall("replace")) {
        expect("replace"); expect("(")
        val a = expression(); expect(",")
        val f = expression(); expect(",")
        val r = expression(); expect(")")
        ScalarFn("replace", Seq(a, f, r))
      }
      else if (peekCall("head") || peekCall("last") || peekCall("tail") ||
               peekCall("reverse") || peekCall("ltrim") || peekCall("rtrim") ||
               peekCall("toBoolean") || peekCall("isEmpty")) {
        val fn = if (opt("head")) "head"
                 else if (opt("last")) "last"
                 else if (opt("tail")) "tail"
                 else if (opt("isEmpty")) "isEmpty"
                 else if (opt("reverse")) "reverse"
                 else if (opt("ltrim")) "ltrim"
                 else if (opt("rtrim")) "rtrim"
                 else { expect("toBoolean"); "toBoolean" }
        expect("("); val a = expression(); expect(")")
        ScalarFn(fn, Seq(a))
      }
      else if (peekCall("split") || peekCall("left") || peekCall("right")) {
        val fn = if (opt("split")) "split"
                 else if (opt("left")) "left"
                 else { expect("right"); "right" }
        expect("("); val a = expression(); expect(",")
        val b = expression(); expect(")")
        ScalarFn(fn, Seq(a, b))
      }
      else if (peekCall("range")) {
        // range(lo, hi[, step]) — Neo4j's INCLUSIVE integer range (both
        // ends; positive literal step). In expression position it lowers
        // to Spark's `sequence`; `UNWIND range(…)` expands at parse time.
        expect("range"); expect("(")
        val lo = longLit(); expect(",")
        val hi = longLit()
        ws()
        val step = if (pos < in.length && in(pos) == ',') { pos += 1; longLit() }
                   else 1L
        expect(")")
        if (step <= 0) fail("range step must be a positive integer")
        ScalarFn("range", Seq(LongLitE(lo), LongLitE(hi), LongLitE(step)))
      }
      else if (peekCall("reduce")) {
        // reduce(acc = init, x IN xs | body) — Cypher's list fold
        expect("reduce"); expect("(")
        val acc = ident(); expect("=")
        val init = expression(); expect(",")
        val v = ident(); expect("IN")
        val l = expression(); ws()
        if (pos >= in.length || in(pos) != '|') fail("expected '|' in reduce")
        pos += 1
        val body = expression()
        expect(")")
        if (v == acc) fail("reduce accumulator and element must differ")
        ReduceExpr(acc, init, v, l, body)
      }
      else if (peekCall("id")) {
        // Neo4j's internal id — HERE the stable nodeId key (the engine
        // has no separate surrogate); canonical render is `v.nodeId`
        expect("id"); expect("("); val v = ident(); expect(")")
        PropRef(v, "nodeId")
      }
      else if (peekCall("labels")) { expect("labels"); expect("("); val v = ident(); expect(")"); LabelsOf(v) }
      else if (peekCall("type")) { expect("type"); expect("("); val v = ident(); expect(")"); TypeOf(v) }
      else if (peekCall("length")) { expect("length"); expect("("); val v = ident(); expect(")"); PathLength(v) }
      else if (peekCall("nodes")) { expect("nodes"); expect("("); val v = ident(); expect(")"); PathNodes(v) }
      else if (peekCall("relationships")) {
        expect("relationships"); expect("("); val v = ident(); expect(")")
        PathRels(v)
      }
      else if (peekBrace("count")) {
        // Neo4j degree sugar count { (n)-[:T]-() } keeps its 1-hop node
        // (and owns the var-less far-node text); anything else is the
        // general COUNT subquery — multi-hop, inner WHERE allowed
        expect("count"); ws(); pos += 1 // '{'
        val saved = pos
        val deg: Option[Expr] =
          try {
            val d = degreePattern()
            ws()
            if (pos < in.length && in(pos) == '}') { pos += 1; Some(d) }
            else { pos = saved; None }
          } catch { case _: ParseError => pos = saved; None }
        deg.getOrElse {
          val p = path()
          val preds = predList(Some("a COUNT-subquery inner"))
          ws()
          if (pos >= in.length || in(pos) != '}')
            fail("expected '}' closing the COUNT subquery")
          pos += 1
          PatternCount(p, preds)
        }
      }
      else if (peekCall("count")) {
        // count(*) | count([DISTINCT] var) | count([DISTINCT] var.prop) —
        // the property forms are null-skipping like Neo4j and plan via
        // the shared AggFn machinery
        expect("count"); expect("(")
        ws()
        if (pos < in.length && in(pos) == '*') { pos += 1; expect(")"); CountStar }
        else {
          val d = opt("DISTINCT")
          // bare `v` / `v.prop` keep their historical nodes (and own that
          // rendered text); anything else is the GENERAL null-skipping
          // count over an expression — count(CASE WHEN … THEN 1 END)
          val saved = pos
          val simple: Option[Expr] =
            try {
              val v = ident()
              ws()
              if (pos < in.length && in(pos) == '.') {
                pos += 1
                val p = ident()
                ws()
                if (pos < in.length && in(pos) == ')') {
                  pos += 1; Some(AggFn("count", PropRef(v, p), d))
                } else { pos = saved; None }
              } else if (pos < in.length && in(pos) == ')') {
                pos += 1; Some(if (d) CountDistinct(v) else CountVar(v))
              } else { pos = saved; None }
            } catch { case _: ParseError => pos = saved; None }
          simple.getOrElse {
            val a = expression(); expect(")")
            AggFn("count", a, d)
          }
        }
      }
      else if (peekCall("collect")) {
        expect("collect"); expect("(")
        val d = opt("DISTINCT")
        // the bare `v.prop` form keeps its historical node (and owns that
        // rendered text); anything else is the GENERAL collect over an
        // expression — collect(toUpper(n.name))
        val saved = pos
        val simple: Option[Expr] =
          try {
            val v = ident()
            ws()
            if (pos < in.length && in(pos) == '.') {
              pos += 1
              val p = ident()
              ws()
              if (pos < in.length && in(pos) == ')') {
                pos += 1
                Some(if (d) CollectDistinct(v, p) else CollectAll(v, p))
              } else { pos = saved; None }
            } else { pos = saved; None }
          } catch { case _: ParseError => pos = saved; None }
        simple.getOrElse {
          val a = expression(); expect(")")
          AggFn("collect", a, d)
        }
      }
      else if (peekCall("keys")) {
        expect("keys"); expect("("); val v = ident(); expect(")")
        KeysOf(v)
      }
      else if (peekCall("properties")) {
        expect("properties"); expect("("); val v = ident(); expect(")")
        PropsOf(v)
      }
      else if (peekCall("startNode") || peekCall("endNode")) {
        // startNode(r)/endNode(r) — stored-orientation endpoint node;
        // an optional `.prop` postfix reads one property (round 15)
        val fn = if (opt("startNode")) "start" else { expect("endNode"); "end" }
        expect("("); val v = ident(); expect(")")
        ws()
        val prop =
          if (pos + 1 < in.length && in(pos) == '.' &&
              (in(pos + 1).isLetter || in(pos + 1) == '_')) {
            pos += 1; Some(ident())
          } else None
        EndpointOf(fn, v, prop)
      }
      else if (peekBrace("COLLECT")) {
        // openCypher's COLLECT subquery — sugar for the pattern
        // comprehension (the canonical render): one grouped sorted
        // collect per shape, [] on no match
        expect("COLLECT"); ws(); pos += 1 // '{'
        expect("MATCH")
        val p = path()
        val preds = predList(Some("a COLLECT-subquery inner"))
        expect("RETURN")
        val proj = expression()
        ws()
        if (pos >= in.length || in(pos) != '}')
          fail("expected '}' closing the COLLECT subquery")
        pos += 1
        PatternComp(p, preds, proj)
      }
      else if (peekCall("min") || peekCall("max")) {
        val fn = if (opt("min")) "min" else { expect("max"); "max" }
        expect("(")
        // the bare `v.prop` form keeps the historical MinMaxProp node (and
        // owns that rendered text); any other argument is the general
        // expression aggregate through AggFn — min(c.bal / 100)
        val saved = pos
        val simple: Option[Expr] =
          try {
            val d = opt("DISTINCT")
            val v = ident()
            ws()
            if (!d && pos + 1 < in.length && in(pos) == '.') {
              pos += 1
              val p = ident()
              ws()
              if (pos < in.length && in(pos) == ')') {
                pos += 1
                Some(MinMaxProp(fn, v, p))
              } else { pos = saved; None }
            } else { pos = saved; None }
          } catch { case _: ParseError => pos = saved; None }
        simple.getOrElse {
          val d = opt("DISTINCT") // min/max over the distinct set ≡ plain
          val a = expression()
          expect(")")
          AggFn(fn, a, d)
        }
      }
      else if (peekCall("size")) {
        expect("size"); expect("(")
        ws()
        if (pos < in.length && in(pos) == '[') {
          // size([t IN collect(DISTINCT tgt) WHERE t.nodeId IN $ids | t])
          // — the reference's A2 aggregate comprehension, tried first; a
          // failed probe backtracks to the GENERAL list expression
          // (comprehension over a collected alias, or a literal list)
          val saved = pos
          val a2: Option[Expr] =
            try {
              expect("[")
              val t = ident(); expect("IN"); expect("collect"); expect("(")
              expect("DISTINCT"); val v = ident(); expect(")")
              expect("WHERE"); val t2 = ident(); expect("."); expect("nodeId")
              expect("IN"); val p = param()
              expect("|"); val t3 = ident(); expect("]"); expect(")")
              if (t != t2 || t != t3) fail("comprehension variable mismatch")
              Some(CountDistinctInParam(v, p))
            } catch { case _: ParseError => pos = saved; None }
          a2.getOrElse {
            val a = expression(); expect(")")
            ScalarFn("size", Seq(a))
          }
        } else if (pos < in.length && in(pos) == '(') {
          // size((n)-[:T]-()) — the degree sugar's legacy spelling; a
          // failed pattern probe backtracks to a parenthesized expression
          val saved = pos
          val deg = try Some(degreePattern())
                    catch { case _: ParseError => pos = saved; None }
          deg match {
            case Some(d) => expect(")"); d
            case None =>
              val a = expression(); expect(")")
              ScalarFn("size", Seq(a))
          }
        } else {
          // size(stringExpr) — string length, like Neo4j
          val a = expression(); expect(")")
          ScalarFn("size", Seq(a))
        }
      }
      else if (peek("vector")) {
        expect("vector"); expect("."); expect("similarity"); expect("."); expect("cosine")
        expect("("); val v = ident(); expect("."); val p = ident()
        expect(","); val q = param(); expect(")")
        Cosine(v, p, q)
      }
      else if (peek("null") && !peekCall("null")) { expect("null"); NullLitE }
      else if (pos < in.length && in(pos) == '$') ParamE(param())
      else {
        val v = ident()
        ws()
        if (pos < in.length && in(pos) == '.') {
          pos += 1; PropRef(v, ident())
        } else if (pos < in.length && in(pos) == '{') {
          // map projection v {.p1, .p2} — the chosen properties as a
          // struct in the listed order (.* / computed entries are
          // outside the dialect)
          pos += 1
          val fs = Seq.newBuilder[String]
          def one(): Unit = {
            ws()
            if (pos >= in.length || in(pos) != '.')
              fail("map projections take '.prop' entries only")
            pos += 1
            fs += ident()
          }
          one()
          while ({ ws(); pos < in.length && in(pos) == ',' }) { pos += 1; one() }
          ws()
          if (pos >= in.length || in(pos) != '}')
            fail("expected '}' closing the map projection")
          pos += 1
          MapProj(v, fs.result())
        } else ColRef(v) // bare name: WITH var carry / projected column
      }
    }

    private def isAggExpr(e: Expr): Boolean = e match {
      case _: CountDistinct | _: CountDistinctInParam | _: CollectDistinct |
           _: CollectAll | _: MinMaxProp | CountStar | _: CountVar |
           _: AggFn | _: PercentileFn => true
      case _ => false
    }

    /** An aggregate anywhere STRICTLY BELOW the top of `e` (inside
      * arithmetic / CASE / coalesce / another aggregate) — out of grammar:
      * aggregate at a WITH barrier and compute over the alias instead. */
    private def containsNestedAgg(e: Expr): Boolean = {
      def below(x: Expr): Boolean = isAggExpr(x) || nested(x)
      def nested(x: Expr): Boolean = x match {
        case BinOp(_, l, r)  => below(l) || below(r)
        case CoalesceE(args) => args.exists(below)
        case CaseExpr(bs, d) =>
          bs.exists { case (c, x2) => condHasAgg(c) || below(x2) } ||
            d.exists(below)
        case AggFn(_, a, _)  => below(a)
        case PercentileFn(_, a, _) => below(a)
        case ScalarFn(_, args)  => args.exists(below)
        case ListLit(items)     => items.exists(below)
        case MapLitE(es)        => es.exists { case (_, x) => below(x) }
        case ListIndex(l, _)    => below(l)
        case ListSlice(l, _, _) => below(l)
        case ReduceExpr(_, init, _, l, body) =>
          below(init) || below(l) || below(body)
        case ListComp(_, l, c, pj) =>
          below(l) || c.exists(condHasAgg) || pj.exists(below)
        case PatternComp(_, _, proj) => below(proj)
        case _               => false
      }
      def condHasAgg(c: Cond): Boolean = c match {
        case CmpCond(l, _, r) => below(l) || below(r)
        case NullCond(x, _)   => below(x)
        case StrCond(l, _, r) => below(l) || below(r)
        case QuantCond(_, _, l, cc) => below(l) || condHasAgg(cc)
      }
      nested(e)
    }

    private def retItem(inWith: Boolean = false): RetItem = {
      ws()
      val e: Expr = expression()
      if (containsNestedAgg(e))
        fail("aggregates cannot nest inside expressions — aggregate at a " +
          "WITH barrier and compute over the alias")
      val alias = if (opt("AS")) Some(ident()) else None
      if (inWith && alias.isEmpty && !e.isInstanceOf[ColRef])
        fail("WITH expressions must be aliased (only bare variables carry)")
      RetItem(e, alias)
    }

    def expressionEntry(): Expr = expression()

    private def orderRef(): String = {
      val first = ident()
      ws()
      if (pos < in.length && in(pos) == '.') { pos += 1; s"$first.${ident()}" }
      else first
    }
  }
}
