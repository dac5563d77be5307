package graft.cypher

/** AST for the mini-Cypher dialect the reference emits and executes
  * (SURVEY §7.1 `graft.cypher`): every query string built by
  * retrieval/path_retriever.py:4-40, rewritten by retrieval/retriever.py:49-60,
  * or shipped in the qa_with_cypher_queries corpora is expressible here.
  *
  * Grammar (all traversal undirected, 1-3 nodes per path):
  * {{{
  *   query     := stage* unwind* MATCH path (',' path)* [WHERE pred (AND pred)*]
  *                (OPTIONAL MATCH path [WHERE pred (AND pred)*])*
  *                call*
  *                RETURN [DISTINCT] ['*' | item] (',' item)*
  *                [ORDER BY (ref|expr) [ASC|DESC]] [SKIP n] [LIMIT n]
  *              | stage+ unwind+ RETURN …              -- collect→UNWIND tail
  *              | MATCH var '=' (shortestPath|allShortestPaths)
  *                '(' node rel node ')'                 -- rel must be *lo..hi
  *                [WHERE pred (AND pred)*] RETURN …     -- all* = row per path
  *   call      := CALL '{' [WITH var (',' var)*] MATCH path (',' path)*
  *                [WHERE pred*] RETURN aliasedItem (',' aliasedItem)*
  *                [ORDER BY ref [DESC]] [LIMIT n] '}'  -- per-row top-k / aggs
  *   stage     := unwind* MATCH path (',' path)* [WHERE pred (AND pred)*]
  *                WITH [DISTINCT] ['*' | withItem] (',' withItem)*
  *                [ORDER BY (ref|expr) [ASC|DESC]] [SKIP n] [LIMIT n]
  *                [WHERE pred (AND pred)*]
  *   unwind    := UNWIND ($param | '[' lit (',' lit)* ']'
  *                        | range(int, int [, int])   -- expands at parse
  *                        | carriedListAlias) AS var  -- collect→UNWIND explode
  *   path      := [pathVar '='] node (rel node)*   -- name scopes nodes()/relationships()
  *   node      := '(' var [':' Label] [ '{' (name|nodeId) ':' (literal | var | $param) '}' ] ')'
  *   rel       := relBody '-' | relBody '->' | '<' relBody '-'
  *   relBody   := ['<'] '-[' [var] [':' TYPE ('|' TYPE)*] [range] ']'
  *   pred      := var '<>' var | NOT var '.' 'nodeId' IN $param
  *              | normalize(lower(col)) '=' normalize(lower($param))
  *              | (col | var '.' prop) cmpop (literal | $param)
  *              | var '.' prop cmpop var '.' prop    -- pair-dedup idiom
  *              | [NOT] exists '(' var '.' prop ')'  -- IS [NOT] NULL sugar
  *              | [NOT] (col | var '.' prop) IN carriedListAlias
  *              | (col | var '.' prop) IS [NOT] NULL
  *              | expr (CONTAINS | STARTS WITH | ENDS WITH | '=~') expr
  *              | strFn-headed expr cmpop expr   -- size(n.name) > 5
  *              | [NOT] var ':' Label            -- label test
  *              | (any | all | none | single) '(' var IN expr WHERE cond ')'
  *              | [NOT] EXISTS '{' path [WHERE pred (AND pred)*] '}'
  *              | [NOT] path                       -- Neo4j sugar for EXISTS
  *                 (EXISTS composes under OR/NOT too — the nested form
  *                  plans as a marker left-join — and is legal in MATCH,
  *                  OPTIONAL MATCH, and WITH WHERE; only an EXISTS's own
  *                  inner WHERE may not nest another EXISTS)
  *   item      := expr [AS alias]
  *   withItem  := var                     -- carries the node binding forward
  *              | expr AS alias           -- WITH expressions must alias (like Cypher)
  *   expr      := addExpr                 -- arithmetic with precedence
  *   addExpr   := mulExpr (('+'|'-') mulExpr)*
  *   mulExpr   := atom (('*'|'/'|'%') atom)*   -- int÷int truncates (Neo4j)
  *   atom      := '(' expr ')' | intLit | strLit
  *              | var '.' prop | bare-col | labels(var) | type(var)
  *              | count('*' | [DISTINCT] var['.' prop] | [DISTINCT] expr)
  *              | id(var)                         -- the nodeId key
  *              | (sum | avg | stDev | stDevP)([DISTINCT] expr)
  *              | (percentileCont | percentileDisc)(expr ',' double)
  *              | min(var '.' prop) | max(var '.' prop)
  *              | collect([DISTINCT] var '.' prop)
  *              | (toLower | toUpper | trim)(expr) | size(expr)
  *              | substring(expr ',' int [',' int])
  *              | replace(expr ',' expr ',' expr)
  *              | (abs | sign | toString | toInteger | toFloat)(expr)
  *              | (floor | ceil | sqrt)(expr)    -- IEEE-exact math
  *              | coalesce(expr (',' expr)*)
  *              | CASE [expr] (WHEN (cond|expr) THEN expr)+ [ELSE expr] END
  *                                -- simple form desugars to '=' guards
  *              | size('[' ... ']')              -- A2 comprehension
  *              | count '{' degPat '}' | size '(' degPat ')'  -- degree sugar
  *              | vector.similarity.cosine(var '.' prop, $param)
  *              | length(pathVar)                -- shortestPath hop count
  *              | nodes(pathVar) | relationships(pathVar)  -- path projection
  *              | '[' expr (',' expr)* ']'       -- list literal
  *              | atom '[' int ']'               -- 0-based index (neg from end)
  *              | atom '[' [int] '..' [int] ']'  -- half-open slice, clamping
  *              | (head | last | tail | reverse)(expr)
  *              | range(int, int [, int]) | split(expr, strLit)
  *              | (left | right)(expr, expr) | (ltrim | rtrim)(expr)
  *              | toBoolean(expr)
  *              | reduce(acc '=' expr ',' var IN expr '|' expr)  -- list fold
  *              | '[' var IN expr [WHERE cond] ['|' expr] ']'    -- comprehension
  *              | '[' path [WHERE pred*] '|' expr ']'   -- PATTERN comprehension
  *              | null | keys(var)                      -- non-null prop names
  *              | properties(var) | var                 -- whole-entity struct
  *              | var '{' '.'prop (',' '.'prop)* '}'    -- map projection
  *              | var '[' expr ']'                      -- dynamic prop access
  *   degPat    := '(' var ')' rel-without-var '(' [':' Label] ')'  -- 1 hop
  *   cond      := expr (cmpop expr | IS [NOT] NULL
  *                      | (CONTAINS | STARTS WITH | ENDS WITH | '=~') expr)
  * }}}
  *
  * Aggregates may not nest inside arithmetic (aggregate at a WITH barrier
  * and compute over the alias). Directed rels traverse one stored
  * orientation; the reference emits only the undirected form.
  *
  * '''Relationship-uniqueness deviation from Neo4j.''' This engine applies
  * trail semantics (a stored relationship bound at most once) PER PATH,
  * never across the comma patterns of a MATCH clause. Neo4j scopes
  * uniqueness to the whole MATCH clause (across comma patterns) but not
  * across consecutive MATCH clauses — so in Neo4j the two spellings
  * differ, while here they coincide. Consequently the parser folds
  * consecutive MATCH clauses into one comma-pattern list and
  * [[CypherQuery.render]] canonically emits the comma form: running that
  * rendered text on real Neo4j can return FEWER rows (Neo4j additionally
  * drops solutions that reuse one relationship across the comma
  * patterns). parse∘render stays the identity within this dialect.
  *
  * `WITH` is a projection barrier (retrieval/ner.py:112-114's
  * `WITH node.name AS name WHERE normalize(lower(name)) = … RETURN name`):
  * only the listed items survive into the next MATCH; a carried node
  * variable re-binds by nodeId. WITH-stage aggregation is outside the
  * dialect (the reference never emits it mid-query).
  *
  * The reference's `modify_query` string rewrite (retriever.py:49-60) becomes
  * the structural [[CypherQuery.widenForRetrieval]] — no string surgery.
  */
object Ast {

  /** `extraAnchors` holds the 2nd..nth pairs of a multi-property map
    * anchor `(n:L {name: "x", mktsegment: "AUTO"})` — each an ADDITIONAL
    * equality on the same frame (literals / $params only; the
    * UNWIND-variable form stays single-pair). The first pair keeps the
    * historical (anchorProp, anchorValue) slots. */
  final case class NodePat(varName: String, label: Option[String],
                           anchorProp: Option[String],
                           anchorValue: Option[AnchorValue],
                           extraAnchors: Seq[(String, AnchorValue)] = Nil)
  sealed trait AnchorValue
  final case class StrLit(v: String) extends AnchorValue
  final case class LongLit(v: Long) extends AnchorValue
  final case class VarRef(name: String) extends AnchorValue
  /** `(n:L {name: $param})` — a map-parameter anchor: the property equals
    * the SCALAR parameter's value (string or integer), the first
    * parameterized query shape a driver-API user writes. The UNWIND form
    * stays the LIST-parameter anchor. */
  final case class ParamRef(name: String) extends AnchorValue

  /** `range` is Neo4j's variable-length spec `*min..max` (None = plain
    * single hop). Var-length rels cannot bind a variable (the binding would
    * be a relationship LIST; outside the emitted grammar's RETURN surface).
    * `relTypes` is Neo4j's type alternation `:A|B` (empty = any type) —
    * a hop traverses an edge whose type is ANY of the listed ones.
    * `dir` is the pattern arrow: 0 undirected `-[]-` (the reference's only
    * form), +1 forward `-[]->` (stored src→dst left to right), −1 reverse
    * `<-[]-`. Directed hops traverse ONE stored orientation, so they are
    * strictly cheaper than undirected (no bidirected union). */
  final case class RelPat(varName: Option[String], relTypes: Seq[String],
                          range: Option[(Int, Int)] = None, dir: Int = 0)
  object RelPat {
    /** Single-type convenience constructor (the dominant case). */
    def apply(varName: Option[String], relType: Option[String],
              range: Option[(Int, Int)]): RelPat =
      RelPat(varName, relType.toSeq, range)
  }

  /** Alternating node/rel pattern: nodes.length == rels.length + 1.
    * `name` is the optional path variable of `MATCH p = (a)-[…]-(b)` —
    * it scopes the path-projection functions `nodes(p)` /
    * `relationships(p)` (and `length(p)` on shortestPath). */
  final case class MatchPath(nodes: Seq[NodePat], rels: Seq[RelPat],
                             name: Option[String] = None)

  sealed trait Pred
  final case class VarNeq(v1: String, v2: String) extends Pred
  final case class NotIdIn(varName: String, param: String) extends Pred
  /** `normalize(lower(col)) = normalize(lower($param))` — the WITH…WHERE
    * shape of the reference's FULL_TEXT_QUERY (retrieval/ner.py:111-114). */
  final case class NormEqParam(colName: String, param: String) extends Pred
  /** `col <op> literal` over a WITH-projected column — op ∈
    * {=, <>, <, <=, >, >=}; with an aggregate alias this is Cypher's
    * HAVING shape (`WITH n, count(DISTINCT c) AS deg WHERE deg >= 5`). */
  final case class ColCmp(colName: String, op: String,
                          value: AnchorValue) extends Pred
  /** `[NOT] EXISTS { (a)-[…]-(b) [WHERE pred AND …] }` — Neo4j's pattern
    * predicate: the row survives iff the pattern (with its inner WHERE,
    * which filters the PATTERN's solutions) has ≥ 1 (resp. 0) solutions
    * sharing the row's bindings. As a TOP-LEVEL conjunct it plans as a
    * LEFT SEMI (resp. ANTI) join on the shared variables' nodeIds — never
    * a count, never a correlated subquery. NESTED under OR/NOT/parens it
    * plans as a MARKER LEFT JOIN instead: the pattern's distinct shared
    * keys carry a `true` marker, the row's coalesce(marker, false) folds
    * into the boolean tree, and the marker columns drop after the filter
    * — the disjunction-composable form a semi-join cannot express.
    * Inner-WHERE predicates may reference the pattern's own variables and
    * any shared outer NODE variable (resolved against the pattern-local
    * binding, which the join equates); nesting another EXISTS inside the
    * inner WHERE is out of dialect. */
  final case class ExistsPat(path: MatchPath, negated: Boolean,
                             preds: Seq[Pred] = Nil) extends Pred
  /** `v.prop <op> literal` — property comparison directly in WHERE (the
    * ColCmp shape lifted from bare projected columns to node
    * properties). */
  final case class PropCmp(varName: String, prop: String, op: String,
                           value: AnchorValue) extends Pred
  /** `v.prop IS [NOT] NULL` / `col IS [NOT] NULL` — Cypher's null test
    * (`ref` is restricted to PropRef | ColRef at parse time). Matters
    * chiefly for OPTIONAL MATCH results, whose unmatched side is null. */
  final case class IsNullPred(ref: Expr, negated: Boolean) extends Pred
  /** Boolean combinators with Cypher precedence (NOT > AND > OR; the WHERE
    * list's implicit conjunction is the flattened top-level AND chain, so
    * `a AND b` still parses to two preds). EXISTS pattern predicates may
    * only appear as TOP-LEVEL conjuncts — they plan as semi/anti JOINS,
    * which have no disjunctive form (rejected at parse time inside
    * OR/NOT/parenthesized groups). */
  final case class OrPred(l: Pred, r: Pred) extends Pred
  final case class AndPred(l: Pred, r: Pred) extends Pred
  final case class NotPred(p: Pred) extends Pred
  /** `(v.prop | col) [NOT] IN [lit, …]` — membership against a literal
    * list (the parameterless companion of `NOT v.nodeId IN $param`).
    * `ref` is PropRef | ColRef; values are homogeneous literals. */
  final case class InList(ref: Expr, values: Seq[AnchorValue],
                          negated: Boolean) extends Pred
  /** `(v.prop | col) [NOT] IN $param` — membership against a LIST
    * parameter on ANY property (round 13; [[NotIdIn]] remains the
    * historical nodeId-only spelling and still owns `NOT v.nodeId IN
    * $param` at parse time, so each rendered text re-parses to exactly
    * one AST). Same typed-membership rule as [[InList]]: the parameter's
    * elements must agree with the ref's static type. */
  /** `[NOT] expr IN xs` where `xs` is a CARRIED list alias (a collected
    * list from a WITH barrier) — one `array_contains` over the carried
    * column, the membership twin of the carried-list UNWIND. */
  final case class InCarried(ref: Expr, listName: String,
                             negated: Boolean) extends Pred
  final case class InParam(ref: Expr, param: String,
                           negated: Boolean) extends Pred
  /** String predicate `l CONTAINS r` / `l STARTS WITH r` / `l ENDS WITH r`
    * / `l =~ r` (whole-string regex, like Neo4j). Both sides are scalar
    * string expressions (properties, projected columns, literals,
    * [[ScalarFn]] compositions like `toLower(n.name) CONTAINS $q`'s literal
    * form). Neo4j null semantics: a null operand makes the predicate
    * null, and the row is dropped. All four plan as ONE pushable scan
    * predicate — never a join or a UDF. */
  final case class StrPred(l: Expr, op: String, r: Expr) extends Pred
  /** General scalar comparison `expr <op> expr` in WHERE — the ColCmp /
    * PropCmp shape lifted to full expressions so function-wrapped refs
    * compare too (`size(n.name) > 5`, `toLower(c.name) = "x"`). */
  final case class ExprCmp(l: Expr, op: String, r: Expr) extends Pred
  /** `[NOT] v:Label` — Cypher's label test in WHERE (the post-bind twin
    * of the inline `(v:Label)` anchor; useful when the variable was
    * bound untyped). `_Entity_` matches every node. One pushable scan
    * predicate on the node frame's label column. */
  final case class LabelPred(varName: String, label: String,
                             negated: Boolean) extends Pred
  /** Cypher's list quantifiers `any/all/none/single(x IN xs WHERE cond)`
    * — fn ∈ {"any", "all", "none", "single"}. Lowered to Spark's
    * codegen'd higher-order functions (`exists` / `forall` /
    * `!exists` / `size(filter) = 1`) — never a UDF, never an explode.
    * Neo4j null semantics: a null list makes the quantifier null and the
    * row drops. Composes under OR/NOT like any scalar predicate. */
  final case class ListQuantPred(fn: String, varName: String, list: Expr,
                                 cond: Cond) extends Pred

  sealed trait Expr
  final case class PropRef(varName: String, prop: String) extends Expr
  /** A bare name: in WITH, carries a node variable forward (or passes an
    * earlier projection through); in RETURN / ORDER BY, references a
    * column a preceding WITH produced. */
  final case class ColRef(name: String) extends Expr
  final case class LabelsOf(varName: String) extends Expr
  final case class TypeOf(relVar: String) extends Expr
  final case class CountDistinct(varName: String) extends Expr
  /** `size([t IN collect(DISTINCT v) WHERE t.nodeId IN $param | t])` —
    * the A2 supervision aggregate (path_retriever.py:16). */
  final case class CountDistinctInParam(varName: String, param: String) extends Expr
  /** `collect(DISTINCT x.prop)` — Cypher's list aggregate (the A4
    * provenance shape through the dialect). Cypher's collect is an
    * unordered bag; the engine canonicalizes to a SORTED distinct list
    * (and, like Neo4j, skips nulls) so results are deterministic. */
  final case class CollectDistinct(varName: String, prop: String) extends Expr
  /** Plain `collect(x.prop)` — Neo4j's most common list aggregate: a BAG
    * that keeps duplicates (parallel edges / repeated values multiply)
    * and skips nulls; the reference's own provenance accumulation is the
    * non-distinct append (retrieval/retriever.py:83). Canonicalized to a
    * SORTED list (duplicates preserved) so results are deterministic. */
  final case class CollectAll(varName: String, prop: String) extends Expr
  /** `percentileCont(x.prop, p)` / `percentileDisc(x.prop, p)` — Neo4j's
    * percentile aggregates (null-skipping). `percentileCont` is the
    * linearly INTERPOLATED quantile (returns double); `percentileDisc`
    * returns an actual value from the group: the first value whose
    * cumulative fraction reaches `p` (sorted[ceil(p·n)], the SQL-standard
    * inverse distribution). `p` must be in [0, 1]. */
  final case class PercentileFn(fn: String, arg: Expr, p: Double) extends Expr
  /** Scalar function `fn(args…)`. String family: `toLower` / `toUpper` /
    * `trim` (1 string arg), `size` (string length — the
    * list-comprehension `size([…])` form parses separately to
    * [[CountDistinctInParam]]), `substring(s, start[, len])` (0-indexed
    * like Neo4j; start/len are integer literals),
    * `replace(s, find, repl)`. Numeric family: `abs`, `sign` (Cypher
    * integer −1/0/1), `toString`, `toInteger` (truncation toward zero,
    * like Neo4j), `toFloat`. All plan to codegen'd Spark built-ins —
    * never UDFs. */
  final case class ScalarFn(fn: String, args: Seq[Expr]) extends Expr
  /** `min(x.prop)` / `max(x.prop)` — Cypher's extremum aggregates
    * (null-skipping, like Neo4j). `fn` ∈ {"min", "max"}. */
  final case class MinMaxProp(fn: String, varName: String,
                              prop: String) extends Expr
  /** `count(*)` — the row count of the group (counts null-extended
    * OPTIONAL MATCH rows too, exactly like Neo4j). */
  case object CountStar extends Expr
  /** `count(x)` — non-distinct count of the rows where `x` is bound:
    * equal to `count(*)` for mandatory variables, but SKIPS rows where an
    * OPTIONAL MATCH left `x` null, exactly Neo4j's count(v) semantics. */
  final case class CountVar(varName: String) extends Expr
  final case class Cosine(varName: String, prop: String, param: String) extends Expr
  /** `length(p)` where `p` names the query's shortestPath — the hop count
    * of the shortest path found for the row's endpoint pair. */
  final case class PathLength(pathVar: String) extends Expr
  /** `nodes(p)` — the node list of the named path, in traversal order, as
    * the nodeId array (node OBJECTS have no columnar form; identity is
    * nodeId, and properties join back by id — the provenance shape of
    * retrieval/retriever.py:80-86). On an enumerated (fixed/var-length)
    * path the list is exact per row; on a shortestPath it is the
    * DETERMINISTIC minimum-predecessor path (ties at every hop break
    * toward the smallest nodeId), so results are reproducible and
    * oracle-expressible where Neo4j returns an arbitrary witness. */
  final case class PathNodes(pathVar: String) extends Expr
  /** `relationships(p)` — the relationship-type list of the named path in
    * traversal order (relationship identity is the (type, src, dst)
    * triple; the TYPE sequence is the provenance the reference's pattern
    * strings carry). Enumerated paths only — a shortestPath's BFS never
    * materializes its edges. */
  final case class PathRels(pathVar: String) extends Expr
  /** `count { (n)-[:T|U]-(:L) }` ≡ `size((n)-[:T|U]-(:L))` — Neo4j's
    * degree sugar: the number of pattern matches around the bound node
    * `n` (single hop, far node anonymous with an optional label). Plans
    * as ONE grouped degree aggregate per distinct (types, dir, farLabel)
    * shape left-joined back on nodeId — never a per-row subquery.
    * Canonical render is the `count { … }` form. */
  final case class DegreeOf(varName: String, relTypes: Seq[String],
                            dir: Int, farLabel: Option[String]) extends Expr
  /** Integer literal inside an expression (`x.qty * 2`). */
  final case class LongLitE(v: Long) extends Expr
  /** Double literal inside an expression — constructed by the PLANNER
    * when a map-parameter entry carries a fractional value
    * (`SET n += $props` with e.g. acctbal -> 99.9, advisor r14: the
    * Number->longValue arm silently truncated it); the surface grammar
    * itself has no float-literal spelling. */
  final case class DblLitE(v: Double) extends Expr {
    // the dialect has no literal spelling for NaN/Infinity (numLit reads
    // digits.digits only), so a planner-constructed non-finite double
    // would break render∘parse identity — reject it at construction
    // with the parameter-flavored message its one source site implies
    require(!v.isNaN && !v.isInfinite,
      s"non-finite double value $v cannot be spelled as a Cypher literal")
  }
  /** String literal inside an expression (CASE branches, coalesce
    * defaults). */
  final case class StrLitE(v: String) extends Expr
  /** The `null` literal — CASE defaults, coalesce tails, and the Neo4j
    * property-removal idiom `SET n.p = null` (≡ REMOVE n.p). */
  case object NullLitE extends Expr
  /** `$param` in EXPRESSION position (`coalesce(x, $fallback)`,
    * `CONTAINS $q`, `+ $suffix`) — resolved to a literal at plan time
    * like the anchor/comparison parameter forms, so filters stay
    * pushable. Scalar string/number/boolean parameters only. */
  final case class ParamE(name: String) extends Expr
  /** `keys(var)` — the node's property names with a NON-NULL value on
    * this row (sorted for determinism; Neo4j's order is arbitrary).
    * `label`/`labels` are label metadata, not properties, and are
    * excluded — `nodeId` IS a property here (the S2 key). */
  final case class KeysOf(varName: String) extends Expr
  /** `properties(var)` — the node's whole property bag as ONE canonical
    * STRUCT column: every union-of-keys property field, name-sorted for
    * determinism, label metadata excluded like [[KeysOf]] (`nodeId` IS a
    * property — the S2 key). An absent property is a NULL field — the
    * union-of-keys representation of absence — where Neo4j drops the
    * key; the fixed sorted-struct shape is what keeps the bag hashable,
    * groupable, and oracle-expressible (DuckDB struct_pack). The
    * whole-entity projection `RETURN v` plans to the SAME struct (a
    * node's columnar form IS its property bag; identity is the nodeId
    * field) — the reference's retrieved-record shape,
    * retrieval/retriever.py:79-86. A BOUND relationship variable
    * projects its identity triple {dst, relType, src} (name-sorted):
    * the data model stores no relationship properties
    * (stark_neo4j_loading.py:50-53), so the identity IS the observable
    * record — stored orientation, like Neo4j's fixed start/end under an
    * undirected match. OPTIONAL relationships carry only their relType
    * and are rejected with a targeted message. */
  final case class PropsOf(varName: String) extends Expr
  /** Map projection `v {.p1, .p2}` — the chosen properties as a struct
    * in the LISTED field order (Neo4j's `node {.name, .details}`,
    * the per-node dict records of retrieval/retriever.py:56-59). Every
    * field must exist in the union-of-keys schema; `.*`, computed
    * entries, and variable entries are outside the dialect. */
  final case class MapProj(varName: String, fields: Seq[String]) extends Expr
  /** `startNode(r)` / `endNode(r)` — the relationship's endpoint NODE
    * in STORED orientation (start = src, end = dst): the spelling that
    * recovers direction after an undirected match (round 15; pairs with
    * whole-entity `RETURN r`). Bare form projects the endpoint's
    * whole-entity struct; `startNode(r).prop` reads one property. Plans
    * as ONE equi-join of the node table per distinct (fn, rel) — never
    * a per-row lookup. Bound (stage/carried) rel variables only: an
    * OPTIONAL rel carries no endpoint ids. `fn` ∈ {"start", "end"}. */
  final case class EndpointOf(fn: String, relVar: String,
                              prop: Option[String] = None) extends Expr
  /** Map literal `{k1: expr, k2: expr}` in expression position
    * (round 15) — Cypher's record-shaping idiom (the reference's
    * retriever returns dict records, retrieval/retriever.py:56-59).
    * Plans as ONE struct column with the LISTED field order, like the
    * map projection; entries may nest (structs nest). Keys are
    * identifiers; the canonical render restores the same spelling.
    * Catalog entries returning one must serialize it to JSON text
    * (the driver hash surface — Queries.jsonSurface). */
  final case class MapLitE(entries: Seq[(String, Expr)]) extends Expr
  /** Dynamic property access `v[keyExpr]` — the property whose NAME is
    * the string key's runtime value (the lookup twin of [[KeysOf]]:
    * `UNWIND keys(n) AS k RETURN k, n[k]`). Planned as ONE codegen'd
    * CASE over the node's scalar property fields, each value
    * canonicalized to its STRING rendering (union-of-keys columns are
    * heterogeneous and a dynamic key has no static type — Neo4j's
    * dynamically typed value has no single columnar form). A key naming
    * no property, a non-scalar property (array), or a null-valued
    * property yields null, like Neo4j's missing-key lookup. A purely
    * NUMERIC literal key is unreachable (that spelling is the list
    * index [[ListIndex]]). */
  final case class DynProp(varName: String, key: Expr) extends Expr
  /** Binary arithmetic `l <op> r`, op ∈ {+, -, *, /, %} with standard
    * precedence and parentheses. `/` over two INTEGRAL operands is
    * Cypher/Neo4j integer division (truncation toward zero — DuckDB `//`);
    * any fractional operand makes it double division. Aggregates may not
    * nest inside arithmetic (rejected at parse time) — aggregate at a WITH
    * barrier and compute over the alias instead. */
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  /** `sum([DISTINCT] expr)` / `avg([DISTINCT] expr)` / `stDev[P]` /
    * `count([DISTINCT] v.prop)` — Cypher's numeric aggregates over an
    * arbitrary arithmetic/property argument (null-skipping, like
    * Neo4j); DISTINCT aggregates over the distinct value set. `avg`
    * returns double; `sum` keeps the argument's integral type. */
  final case class AggFn(fn: String, arg: Expr,
                         distinct: Boolean = false) extends Expr
  /** `coalesce(e1, e2, …)` — first non-null argument. */
  final case class CoalesceE(args: Seq[Expr]) extends Expr
  /** Searched CASE: `CASE WHEN cond THEN expr … [ELSE expr] END`
    * (no ELSE → null, like Cypher). */
  final case class CaseExpr(branches: Seq[(Cond, Expr)],
                            default: Option[Expr]) extends Expr
  /** `[e1, e2, …]` — a list VALUE in expression position (homogeneous;
    * the element type is the first item's static type). Distinct from the
    * predicate-side `IN [..]` literal list, which stays [[InList]]. */
  final case class ListLit(items: Seq[Expr]) extends Expr
  /** `xs[i]` — Cypher 0-based element access; a negative literal indexes
    * from the end (`xs[-1]` = last). Out of range → null (Neo4j). The
    * index is an integer LITERAL (like `substring`'s bounds — keeps the
    * cross-engine index arithmetic static). */
  final case class ListIndex(list: Expr, idx: Long) extends Expr
  /** `xs[a..b]` — Cypher slice: from `a` (inclusive, 0-based, default 0)
    * to `b` (exclusive, default size); negative literals count from the
    * end; out-of-range bounds clamp (Neo4j). Bounds are integer literals. */
  final case class ListSlice(list: Expr, from: Option[Long],
                             to: Option[Long]) extends Expr
  /** `reduce(acc = init, x IN xs | body)` — Cypher's list fold, lowered to
    * Spark's codegen'd `aggregate` higher-order function. `body` may
    * reference `acc` and `x` (lambda-bound, shadowing outer columns). */
  final case class ReduceExpr(accName: String, init: Expr, varName: String,
                              list: Expr, body: Expr) extends Expr
  /** `[x IN xs WHERE cond | proj]` — general list comprehension (either
    * part may be absent, not both): WHERE filters elements, `| proj` maps
    * them. Lowered to Spark's `filter`/`transform` higher-order functions
    * — stays inside whole-stage codegen, never a UDF. The A2 aggregate
    * comprehension `size([t IN collect(DISTINCT v) …])` keeps its
    * dedicated [[CountDistinctInParam]] node (aggregates cannot appear
    * inside expressions). */
  final case class ListComp(varName: String, list: Expr, cond: Option[Cond],
                            proj: Option[Expr]) extends Expr
  /** `[(n)-[:T]-(m) [WHERE pred (AND pred)*] | proj]` — Neo4j's PATTERN
    * comprehension: the list of `proj` values over every match of the
    * pattern around the row's bound variable(s) (fresh variables scope to
    * the comprehension). Planned like the marker EXISTS: the pattern is
    * enumerated ONCE, grouped by its shared keys into a canonical sorted
    * `collect_list`, and LEFT-joined back — never a per-row subquery; a
    * row with no matches gets the EMPTY list (Neo4j's []). */
  final case class PatternComp(path: MatchPath, preds: Seq[Pred],
                               proj: Expr) extends Expr
  /** `COUNT { (n)-[:A]-(m)-[:B]-(k) [WHERE …] }` — openCypher's COUNT
    * subquery beyond the 1-hop [[DegreeOf]] sugar (which keeps its own
    * node and owns the var-less far-node text): the number of pattern
    * matches around the row's bound variable(s). Planned as ONE grouped
    * COUNT per distinct shape LEFT-joined back (miss → 0) — never a
    * per-row subquery, and never a materialized list. */
  final case class PatternCount(path: MatchPath,
                                preds: Seq[Pred]) extends Expr

  /** Boolean condition inside CASE WHEN and list-comprehension WHERE. */
  sealed trait Cond
  final case class CmpCond(l: Expr, op: String, r: Expr) extends Cond
  final case class NullCond(e: Expr, negated: Boolean) extends Cond
  /** CONTAINS / STARTS WITH / ENDS WITH / `=~` in condition position —
    * the [[StrPred]] operators available inside CASE WHEN and
    * `[x IN xs WHERE …]`. */
  final case class StrCond(l: Expr, op: String, r: Expr) extends Cond
  /** A list quantifier in CONDITION position — `CASE WHEN any(x IN xs
    * WHERE …) THEN …`; same lowering as [[ListQuantPred]]. */
  final case class QuantCond(fn: String, varName: String, list: Expr,
                             cond: Cond) extends Cond

  final case class RetItem(expr: Expr, alias: Option[String]) {
    /** Output column name: explicit alias, else Cypher's expression text. */
    def name: String = alias.getOrElse(expr match {
      case CountDistinctInParam(_, _) => "correctCnt"
      case Cosine(_, _, _)            => "similarity"
      case e                          => exprText(e)
    })
  }

  /** Canonical Cypher text of an expression — shared by [[RetItem.name]]
    * and [[CypherQuery.render]], parenthesized so parse(exprText(e)) == e
    * (left-associative operators re-associate identically). */
  def exprText(e: Expr): String = exprText(e, 0, rightChild = false)
  private def exprText(e: Expr, parentPrec: Int, rightChild: Boolean): String =
    e match {
      case PropRef(v, p)              => s"$v.$p"
      case ColRef(n)                  => n
      case LabelsOf(v)                => s"labels($v)"
      case TypeOf(r)                  => s"type($r)"
      case CountDistinct(v)           => s"count(DISTINCT $v)"
      case CountDistinctInParam(v, p) =>
        s"size([t IN collect(DISTINCT $v) WHERE t.nodeId IN $$$p | t])"
      case CollectDistinct(v, p)      => s"collect(DISTINCT $v.$p)"
      case CollectAll(v, p)           => s"collect($v.$p)"
      case PercentileFn(f, a, p)      => s"$f(${exprText(a)}, $p)"
      case ScalarFn(f, args)             =>
        s"$f(${args.map(exprText(_)).mkString(", ")})"
      case MinMaxProp(f, v, p)        => s"$f($v.$p)"
      case CountStar                  => "count(*)"
      case CountVar(v)                => s"count($v)"
      case Cosine(v, pr, p)           => s"vector.similarity.cosine($v.$pr, $$$p)"
      case PathLength(p)              => s"length($p)"
      case PathNodes(p)               => s"nodes($p)"
      case PathRels(p)                => s"relationships($p)"
      case DegreeOf(v, ts, dir, fl)   =>
        val types = if (ts.isEmpty) "" else ts.mkString(":", "|", "")
        val far = s"(${fl.fold("")(l => s":$l")})"
        val hop = dir match {
          case 1  => s"-[$types]->$far"
          case -1 => s"<-[$types]-$far"
          case _  => s"-[$types]-$far"
        }
        s"count { ($v)$hop }"
      case LongLitE(v)                => v.toString
      case DblLitE(v)                 =>
        // plain-decimal render (Double.toString would emit 1.0E-5,
        // which numLit cannot read back); BigDecimal.valueOf uses the
        // double's shortest decimal form, so parse∘render is exact
        val s = java.math.BigDecimal.valueOf(v).toPlainString
        if (s.contains('.')) s else s + ".0"
      case MapLitE(es)                =>
        es.map { case (k, x) => s"$k: ${exprText(x)}" }
          .mkString("{", ", ", "}")
      case EndpointOf(fn, r, p)       =>
        s"${fn}Node($r)" + p.fold("")(x => s".$x")
      case StrLitE(v)                 =>
        "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case NullLitE                   => "null"
      case ParamE(nm)                 => s"$$$nm"
      case KeysOf(v)                  => s"keys($v)"
      case PropsOf(v)                 => s"properties($v)"
      case MapProj(v, fs)             =>
        s"$v {${fs.map("." + _).mkString(", ")}}"
      case DynProp(v, k)              => s"$v[${exprText(k)}]"
      case AggFn(fn, a, d)            =>
        s"$fn(${if (d) "DISTINCT " else ""}${exprText(a)})"
      case CoalesceE(args)            =>
        s"coalesce(${args.map(exprText(_)).mkString(", ")})"
      case CaseExpr(bs, d)            =>
        "CASE " + bs.map { case (c, x) =>
          s"WHEN ${condText(c)} THEN ${exprText(x)}" }.mkString(" ") +
          d.fold("")(x => s" ELSE ${exprText(x)}") + " END"
      case BinOp(op, l, r) =>
        val p = op match {
          case "+" | "-" => 1
          case "^"       => 3 // exponentiation binds tightest, right-assoc
          case _         => 2
        }
        val s = s"${exprText(l, p, rightChild = false)} $op " +
          exprText(r, p, rightChild = true)
        // left-associative ops re-parenthesize their RIGHT child at equal
        // precedence; the right-associative `^` its LEFT child
        val wrap =
          if (op == "^") p < parentPrec || (p == parentPrec && !rightChild)
          else p < parentPrec || (p == parentPrec && rightChild)
        if (wrap) s"($s)" else s
      case ListLit(items) =>
        items.map(exprText(_)).mkString("[", ", ", "]")
      case ListIndex(l, i)      => s"${postfixBase(l)}[$i]"
      case ListSlice(l, fr, to) =>
        s"${postfixBase(l)}[${fr.fold("")(_.toString)}..${to.fold("")(_.toString)}]"
      case ReduceExpr(acc, init, v, l, body) =>
        s"reduce($acc = ${exprText(init)}, $v IN ${exprText(l)} | ${exprText(body)})"
      case ListComp(v, l, c, pj) =>
        s"[$v IN ${exprText(l)}" + c.fold("")(cc => s" WHERE ${condText(cc)}") +
          pj.fold("")(p => s" | ${exprText(p)}") + "]"
      case PatternComp(p, prs, proj) =>
        val where =
          if (prs.isEmpty) "" else " WHERE " + prs.map(predText).mkString(" AND ")
        s"[${pathText(p)}$where | ${exprText(proj)}]"
      case PatternCount(p, prs) =>
        val where =
          if (prs.isEmpty) "" else " WHERE " + prs.map(predText).mkString(" AND ")
        s"COUNT { ${pathText(p)}$where }"
    }

  /** Postfix `[…]` binds to an ATOM on the parse side, so a non-atomic
    * base (arithmetic) re-renders parenthesized. */
  private def postfixBase(e: Expr): String = e match {
    case _: BinOp => s"(${exprText(e)})"
    case _        => exprText(e)
  }

  def condText(c: Cond): String = c match {
    case CmpCond(l, op, r) => s"${exprText(l)} $op ${exprText(r)}"
    case NullCond(e, neg)  => s"${exprText(e)} IS ${if (neg) "NOT " else ""}NULL"
    case StrCond(l, op, r) => s"${exprText(l)} $op ${exprText(r)}"
    case QuantCond(fn, v, l, cc) =>
      s"$fn($v IN ${exprText(l)} WHERE ${condText(cc)})"
  }

  // ---- shared canonical-text renderers (CypherQuery / DeleteQuery) ----

  private def anchorValueText(v: AnchorValue): String = v match {
    case StrLit(s) =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case LongLit(l)   => l.toString
    case VarRef(n)    => n
    case ParamRef(nm) => s"$$$nm"
  }

  private def anchorText(n: NodePat): String =
    (n.anchorProp, n.anchorValue) match {
      case (Some(p), Some(v)) =>
        val pairs = (p, v) +: n.extraAnchors
        pairs.map { case (pp, vv) => s"$pp: ${anchorValueText(vv)}" }
          .mkString(" {", ", ", "}")
      case _ => ""
    }

  def nodeText(n: NodePat): String =
    s"(${n.varName}${n.label.fold("")(l => s":$l")}${anchorText(n)})"

  def relText(r: RelPat): String = {
    val types = if (r.relTypes.isEmpty) "" else r.relTypes.mkString(":", "|", "")
    val body = s"[${r.varName.getOrElse("")}$types" +
      s"${r.range.fold("") { case (lo, hi) => s"*$lo..$hi" }}]"
    r.dir match {
      case 1  => s"-$body->"
      case -1 => s"<-$body-"
      case _  => s"-$body-"
    }
  }

  def pathText(p: MatchPath): String =
    p.name.fold("")(n => s"$n = ") +
      nodeText(p.nodes.head) + p.rels.zip(p.nodes.tail)
        .map { case (r, n) => relText(r) + nodeText(n) }.mkString

  def predText(p: Pred): String = p match {
    case VarNeq(a, b)   => s"$a <> $b"
    case NotIdIn(v, pm) => s"NOT $v.nodeId IN $$$pm"
    case ExistsPat(pt, neg, inner) =>
      val where =
        if (inner.isEmpty) ""
        else " WHERE " + inner.map(predText).mkString(" AND ")
      (if (neg) "NOT " else "") + s"EXISTS { ${pathText(pt)}$where }"
    case NormEqParam(c, pm) =>
      s"normalize(lower($c)) = normalize(lower($$$pm))"
    case ColCmp(c, op, StrLit(v)) =>
      val esc = v.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""$c $op "$esc""""
    case ColCmp(c, op, LongLit(v)) => s"$c $op $v"
    case ColCmp(c, op, VarRef(v))  => s"$c $op $v"
    case ColCmp(c, op, ParamRef(nm)) => s"$c $op $$$nm"
    case PropCmp(v, pr, op, StrLit(s)) =>
      val esc = s.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""$v.$pr $op "$esc""""
    case PropCmp(v, pr, op, LongLit(l)) => s"$v.$pr $op $l"
    case PropCmp(v, pr, op, VarRef(r))  => s"$v.$pr $op $r"
    case PropCmp(v, pr, op, ParamRef(nm)) => s"$v.$pr $op $$$nm"
    case IsNullPred(ref, neg) =>
      s"${exprText(ref)} IS ${if (neg) "NOT " else ""}NULL"
    case InList(ref, vs, neg) =>
      val lits = vs.map {
        case StrLit(s) =>
          "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        case LongLit(v) => v.toString
        case VarRef(v)  => v
        case ParamRef(nm) => s"$$$nm" // not parser-reachable in a list
      }.mkString(", ")
      s"${if (neg) "NOT " else ""}${exprText(ref)} IN [$lits]"
    case InParam(ref, pm, neg) =>
      s"${if (neg) "NOT " else ""}${exprText(ref)} IN $$$pm"
    case InCarried(ref, nm, neg) =>
      s"${if (neg) "NOT " else ""}${exprText(ref)} IN $nm"
    case StrPred(l, o, r) => s"${exprText(l)} $o ${exprText(r)}"
    case ExprCmp(l, o, r) => s"${exprText(l)} $o ${exprText(r)}"
    case LabelPred(v, l, neg) => s"${if (neg) "NOT " else ""}$v:$l"
    case ListQuantPred(fn, v, l, c) =>
      s"$fn($v IN ${exprText(l)} WHERE ${condText(c)})"
    // combinators render fully parenthesized so the flattened-AND
    // top level re-parses to the identical tree
    case OrPred(l, r)  => s"(${predText(l)} OR ${predText(r)})"
    case AndPred(l, r) => s"(${predText(l)} AND ${predText(r)})"
    case NotPred(p0)   => s"NOT (${predText(p0)})"
  }

  /** `UNWIND $param AS var` (literals = None) or the self-contained
    * `UNWIND [lit, …] AS var` (literals = Some(list), param unused) —
    * both anchor node frames downstream; the literal form needs no
    * parameter map. The third form `UNWIND xs AS x` (carried = true,
    * `param` holds the source alias) unwinds a CARRIED list alias — the
    * collect→UNWIND round trip: one `explode` on the carried frame
    * (empty/null lists drop the row, like Cypher), the unwound name
    * becoming a carried scalar usable in anchors, predicates, and
    * RETURN. */
  final case class Unwind(param: String, varName: String,
                          literals: Option[Seq[AnchorValue]] = None,
                          carried: Boolean = false)

  /** `OPTIONAL MATCH path [WHERE pred (AND pred)*]` after the final MATCH:
    * every solution of the mandatory pattern is preserved, and variables
    * bound only by the optional pattern come back null when it finds no
    * match — Cypher's left-outer-join clause. The WHERE belongs to the
    * optional pattern (it decides whether the optional side MATCHES, not
    * whether the preserved row survives), exactly like Neo4j. One path per
    * clause; chain clauses for more (each may share vars with anything
    * bound before it, including earlier optional clauses). */
  final case class OptionalMatch(path: MatchPath, preds: Seq[Pred])

  /** `CALL { [WITH var, …] MATCH … [WHERE …] RETURN item, …
    * [ORDER BY ref [DESC], …] [LIMIT n] }` — openCypher's correlated
    * subquery, restricted to the two shapes that matter:
    *  - non-aggregating with ORDER BY + LIMIT = PER-ROW TOP-K, planned
    *    as one window `row_number` partitioned by the imported keys
    *    (never a per-row re-execution); an outer row with no subquery
    *    rows is eliminated (openCypher), so the attach is an inner join;
    *  - aggregating = per-row aggregates, planned as one grouped
    *    aggregation. When EVERY item is an aggregate it is LEFT-joined
    *    back (openCypher: an ungrouped aggregation returns a row even on
    *    empty input — count→0, collect→[], others→null); when a
    *    non-aggregate GROUPING item is also returned, grouped
    *    aggregation over empty input yields zero rows, so the attach is
    *    an inner join and the outer row is eliminated.
    * Imports are bound node variables re-bound by nodeId; every RETURN
    * item must be an aliased scalar expression (node vars don't carry
    * out). Fresh pattern variables scope to the subquery. */
  final case class CallSubquery(imports: Seq[String], paths: Seq[MatchPath],
                                preds: Seq[Pred], items: Seq[RetItem],
                                orderBy: Seq[(String, Boolean)],
                                limit: Option[CountVal]) {
    def render: String = {
      val sb = new StringBuilder("CALL { ")
      if (imports.nonEmpty) sb ++= s"WITH ${imports.mkString(", ")} "
      sb ++= "MATCH " + paths.map(pathText).mkString(", ")
      if (preds.nonEmpty) sb ++= " WHERE " + preds.map(predText).mkString(" AND ")
      sb ++= " RETURN " + items.map(i =>
        exprText(i.expr) + i.alias.fold("")(a => s" AS $a")).mkString(", ")
      if (orderBy.nonEmpty)
        sb ++= " ORDER BY " + orderBy.map { case (r, d) =>
          r + (if (d) " DESC" else "") }.mkString(", ")
      limit.foreach(n => sb ++= s" LIMIT ${n.render}")
      sb ++= " }"
      sb.toString
    }
  }

  /** `MATCH p = shortestPath((a…)-[:T*lo..hi]-(b…))`: one row per
    * endpoint pair `(a, b)` connected within `hi` hops, with
    * `length(p)` = the minimum hop count. Planned as a source-keyed
    * frontier BFS (first discovery = min distance) — never a path
    * enumeration, so the cost is O(rounds · frontier), not O(degree^k).
    * A shortest walk is always a simple path, so trail semantics
    * coincide. Like Neo4j, the minimum bound must be 0 or 1: `*0..`
    * admits the zero-length pair (a, a); `*1..` (the default) excludes
    * it. Stands alone in its clause group (one path, two nodes) but MAY
    * follow WITH stages: a carried endpoint variable (spelled bare)
    * re-binds by nodeId and its distinct carried ids seed the BFS — the
    * anchor-from-a-prior-stage idiom; the result feeds RETURN directly
    * (ORDER BY/SKIP/LIMIT included), never a further WITH. */
  final case class ShortestPathClause(pathVar: String, path: MatchPath,
                                      all: Boolean = false)

  /** SKIP / LIMIT count: an integer literal, or a `$param` resolved at
    * plan time — Neo4j's parameterized paging (`SKIP $off LIMIT $k`,
    * round 15). The planner rejects anything but a non-negative
    * integral parameter, naming the parameter. */
  sealed trait CountVal { def render: String }
  final case class CountLit(n: Int) extends CountVal {
    def render: String = n.toString
  }
  final case class CountParam(name: String) extends CountVal {
    def render: String = s"$$$name"
  }

  /** One `MATCH … [WHERE …] WITH … [WHERE …]` link of a chained query —
    * the projection barrier the reference's procedure-call queries use
    * (`WITH node.name AS name WHERE … RETURN name`, retrieval/ner.py:112-114).
    * `withPreds` filter AFTER the projection (Cypher's WITH…WHERE). */
  final case class Stage(unwinds: Seq[Unwind], paths: Seq[MatchPath],
                         preds: Seq[Pred], withDistinct: Boolean,
                         withItems: Seq[RetItem], withPreds: Seq[Pred],
                         orderBy: Seq[(String, Boolean)] = Nil,
                         skip: Option[CountVal] = None,
                         limit: Option[CountVal] = None,
                         star: Boolean = false) // WITH * [, items] — carry
                         // every bound node AND relationship var +
                         // carried scalar forward (OPTIONAL rels excluded:
                         // no identity triple survives the null join)

  final case class CypherQuery(
      unwinds: Seq[Unwind],
      paths: Seq[MatchPath],
      preds: Seq[Pred],
      distinct: Boolean,
      items: Seq[RetItem],
      orderBy: Seq[(String, Boolean)], // (output column, descending) keys
      limit: Option[CountVal],
      prefixes: Seq[Stage] = Nil, // WITH-chained stages BEFORE the final MATCH
      optionals: Seq[OptionalMatch] = Nil, // OPTIONAL MATCH clauses after it
      shortest: Option[ShortestPathClause] = None, // MATCH p = shortestPath(…)
      skip: Option[CountVal] = None, // RETURN-level SKIP (applied before LIMIT)
      calls: Seq[CallSubquery] = Nil, // CALL { … } before RETURN
      star: Boolean = false) { // RETURN * [, items] — every bound node
      // var (whole-entity struct, OPTIONAL vars included) and BOUND/
      // carried rel var (identity-triple struct, round 15), carried
      // scalar, and carried-list-UNWIND name, name-sorted, ahead of any
      // explicit items (explicit names win); OPTIONAL rels excluded

    def isAggregating: Boolean = items.exists(i => i.expr match {
      case _: CountDistinct | _: CountDistinctInParam |
           _: CollectDistinct | _: CollectAll | _: MinMaxProp | CountStar |
           _: CountVar | _: AggFn | _: PercentileFn => true
      case _ => false
    })

    /** Render back to Cypher text — byte-compatible with the candidate
      * strings `create_query` emits (path_retriever.py:30-40), so the
      * corpus format round-trips: parse(render(q)) == q. */
    def render: String = {
      def path(p: MatchPath): String = pathText(p)
      def expr(e: Expr): String = exprText(e)
      def pred(p: Pred): String = predText(p)
      val sb = new StringBuilder
      def matchClause(us: Seq[Unwind], ps: Seq[MatchPath], prs: Seq[Pred]): Unit = {
        us.foreach { u =>
          val src = u.literals match {
            case Some(ls) => ls.map {
              case StrLit(s) =>
                "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
              case LongLit(v) => v.toString
              case VarRef(v)  => v
              case ParamRef(nm) => s"$$$nm" // not parser-reachable here
            }.mkString("[", ", ", "]")
            case None => if (u.carried) u.param else s"$$${u.param}"
          }
          sb ++= s"UNWIND $src AS ${u.varName} "
        }
        sb ++= "MATCH " + ps.map(path).mkString(", ")
        if (prs.nonEmpty) sb ++= " WHERE " + prs.map(pred).mkString(" AND ")
      }
      prefixes.foreach { st =>
        matchClause(st.unwinds, st.paths, st.preds)
        sb ++= " WITH " + (if (st.withDistinct) "DISTINCT " else "")
        val itemsTxt = st.withItems
          .map(i => expr(i.expr) + i.alias.fold("")(a => s" AS $a")).mkString(", ")
        sb ++= (if (st.star) { if (itemsTxt.isEmpty) "*" else s"*, $itemsTxt" }
                else itemsTxt)
        // openCypher sub-clause order: ORDER BY, SKIP, LIMIT, then WHERE
        // (the WITH…WHERE filter applies AFTER the trim, like Neo4j)
        if (st.orderBy.nonEmpty)
          sb ++= " ORDER BY " + st.orderBy.map { case (ref, desc) =>
            ref + (if (desc) " DESC" else "") }.mkString(", ")
        st.skip.foreach(n => sb ++= s" SKIP ${n.render}")
        st.limit.foreach(n => sb ++= s" LIMIT ${n.render}")
        if (st.withPreds.nonEmpty)
          sb ++= " WHERE " + st.withPreds.map(pred).mkString(" AND ")
        sb ++= " "
      }
      if (paths.nonEmpty) { matchClause(unwinds, paths, preds); sb ++= " " }
      shortest.foreach { sp =>
        val fn = if (sp.all) "allShortestPaths" else "shortestPath"
        sb ++= s"MATCH ${sp.pathVar} = $fn(${path(sp.path)})"
        if (preds.nonEmpty) sb ++= " WHERE " + preds.map(pred).mkString(" AND ")
        sb ++= " "
      }
      optionals.foreach { om =>
        sb ++= "OPTIONAL MATCH " + path(om.path)
        if (om.preds.nonEmpty) sb ++= " WHERE " + om.preds.map(pred).mkString(" AND ")
        sb ++= " "
      }
      calls.foreach { c => sb ++= c.render; sb ++= " " }
      sb ++= "RETURN " + (if (distinct) "DISTINCT " else "")
      val itemsTxt = items.map(i =>
        expr(i.expr) + i.alias.fold("")(a => s" AS $a")).mkString(", ")
      sb ++= (if (star) { if (itemsTxt.isEmpty) "*" else s"*, $itemsTxt" }
              else itemsTxt)
      if (orderBy.nonEmpty)
        sb ++= " ORDER BY " + orderBy.map { case (ref, desc) =>
          ref + (if (desc) " DESC" else "") }.mkString(", ")
      skip.foreach(n => sb ++= s" SKIP ${n.render}")
      limit.foreach(n => sb ++= s" LIMIT ${n.render}")
      sb.toString
    }

    /** The reference's retrieval rewrite (retriever.py:49-60): replace the
      * RETURN list of a candidate query with
      * `DISTINCT tgt.nodeId, props…, cosine(tgt.idx, $qEmb) AS similarity
      *  ORDER BY similarity DESC` — done structurally on the AST. */
    def widenForRetrieval(targetVar: String, props: Seq[String],
                          sortingIndex: String, embParam: String): CypherQuery =
      copy(
        distinct = true,
        items = RetItem(PropRef(targetVar, "nodeId"), Some("nodeId")) +:
          props.map(p => RetItem(PropRef(targetVar, p), Some(p))) :+
          RetItem(Cosine(targetVar, sortingIndex, embParam), Some("similarity")),
        orderBy = Seq(("similarity", true)),
        limit = limit)
  }

  /** One `n.prop = expr` assignment of a MERGE's SET list — the value is
    * a full scalar expression (literals, `$params`, and the merged
    * node's OWN properties: `ON MATCH SET n.cnt = n.cnt + 1`). All
    * values read the PRE-merge row (snapshot semantics, like
    * [[UpdateQuery]]); the last write per property wins. */
  final case class SetItem(varName: String, prop: String, value: Expr)

  /** Restricted graph mutation — the loader's upsert clause
    * (stark_neo4j_loading.py:20-41 is MERGE-per-row against Neo4j):
    * {{{
    *   MERGE (n:Label {nodeId: <int> | $param})
    *     [ON CREATE SET n.p = expr, …] [ON MATCH SET …] [SET …]
    * }}}
    * Matches on (label, nodeId) — the S2 unique key; the key may be a
    * scalar `$param` (the driver-API upsert the loader's per-row
    * parameters bind, stark_neo4j_loading.py:29-37). SET values are full
    * scalar expressions over literals, `$params`, and the node's own
    * pre-merge properties. When the node exists, ON MATCH SET + SET
    * apply; otherwise the node is created with the anchor, ON CREATE
    * SET + SET properties, and nulls elsewhere (the union-of-keys
    * dynamic schema). Lowers onto the lakehouse merge
    * ([[graft.operators.Lakehouse.mergeSnapshot]]): one anti-join against
    * a one-row changelog — and returns the POST-MERGE nodes table, so
    * the engine's immutable-snapshot model is preserved (persisting the
    * result is the caller's [[graft.graph.GraphStore]] write). MERGE
    * twice ≡ once when the SET values don't read the columns they write
    * (idempotent, like a replayed changelog). */
  final case class MergeQuery(node: NodePat, onCreate: Seq[SetItem],
                              onMatch: Seq[SetItem], set: Seq[SetItem]) {
    def render: String = {
      def sets(kw: String, items: Seq[SetItem]): String =
        if (items.isEmpty) ""
        else s" $kw " + items.map(s =>
          s"${s.varName}.${s.prop} = ${exprText(s.value)}").mkString(", ")
      val anchor = node.anchorValue match {
        case Some(v) => s" {${node.anchorProp.get}: ${anchorValueText(v)}}"
        case None    => ""
      }
      s"MERGE (${node.varName}${node.label.fold("")(l => s":$l")}$anchor)" +
        sets("ON CREATE SET", onCreate) + sets("ON MATCH SET", onMatch) +
        sets("SET", set)
    }
  }

  /** Bulk record-driven mutation — the loader's ENTIRE idiom
    * (stark_neo4j_loading.py:20-61) in-dialect:
    * {{{
    *   UNWIND $rows AS r
    *     MERGE (n:L {nodeId: r.<key>})
    *       [ON CREATE SET n.p = expr, …] [ON MATCH SET …] [SET …]
    *   UNWIND $rows AS r CREATE (n:L {nodeId: r.<key>}) [SET …]
    *   FOREACH (r IN $rows | MERGE … SET …)   -- sugar, same lowering
    * }}}
    * `$rows` is a LIST-OF-MAPS parameter; SET values are scalar
    * expressions over the row variable's fields (`r.name`), `$params`,
    * literals, and (MERGE) the node's own pre-merge properties. Lowered
    * as ONE changelog frame onto the lakehouse merge — the rows build
    * one driver-side frame (the parameter IS driver-resident, exactly
    * like Neo4j's `$rows`; the unbounded path is the S1/S3 DataFrame
    * loader), matched rows update, absent rows create, and
    * [[graft.operators.Lakehouse.mergeSnapshot]] applies the whole batch
    * with one key-partitioned anti-join — never a per-row loop. Keys
    * must be distinct within the batch (a loader batch upserts each key
    * once; duplicate keys would make the changelog ambiguous). CREATE
    * enforces the S2 unique-key constraint like [[CreateNodesQuery]].
    * `foreach` only changes the rendered spelling. */
  final case class BulkUpsertQuery(param: String, rowVar: String,
      node: NodePat, keyField: String,
      onCreate: Seq[SetItem], onMatch: Seq[SetItem], set: Seq[SetItem],
      create: Boolean, foreach: Boolean = false) {
    def render: String = {
      def sets(kw: String, items: Seq[SetItem]): String =
        if (items.isEmpty) ""
        else s" $kw " + items.map(s =>
          s"${s.varName}.${s.prop} = ${exprText(s.value)}").mkString(", ")
      val inner =
        s"${if (create) "CREATE" else "MERGE"} (${node.varName}" +
          s":${node.label.get} {nodeId: $rowVar.$keyField})" +
          sets("ON CREATE SET", onCreate) + sets("ON MATCH SET", onMatch) +
          sets("SET", set)
      if (foreach) s"FOREACH ($rowVar IN $$$param | $inner)"
      else s"UNWIND $$$param AS $rowVar $inner"
    }
  }

  /** Bulk relationship upsert — the reference loader's edge statement
    * (stark_neo4j_loading.py:52-56) verbatim:
    * {{{
    *   UNWIND $pairs AS pr
    *   MATCH (src:L1 {nodeId: pr[0]})
    *   MATCH (tgt:L2 {nodeId: pr[1]})
    *   MERGE (src)-[:T]->(tgt)      -- or CREATE; -> / <- / undirected
    * }}}
    * `$pairs` is a LIST of [srcId, dstId] integer pairs. MATCH-then-MERGE
    * semantics: a pair whose endpoint is MISSING is silently dropped
    * (exactly what the reference's per-row MATCH does), existence checked
    * with two semi-joins; MERGE inserts only pairs with no existing edge
    * of that type (one anti-join, both stored orientations probed when
    * undirected, symmetric batches canonicalized like
    * [[RelMutationQuery]]); CREATE appends unconditionally (parallel
    * edges, and requires a direction like Neo4j). The whole batch is ONE
    * frame — never a per-pair loop. Returns the post-mutation
    * relationships table. */
  final case class BulkRelQuery(param: String, rowVar: String,
      src: NodePat, tgt: NodePat, relType: String, dir: Int,
      merge: Boolean) {
    def render: String = {
      val arrow = dir match {
        case 1  => s"-[:$relType]->"
        case -1 => s"<-[:$relType]-"
        case _  => s"-[:$relType]-"
      }
      def anchored(n: NodePat, idx: Int): String =
        s"(${n.varName}${n.label.fold("")(l => s":$l")} " +
          s"{nodeId: $rowVar[$idx]})"
      s"UNWIND $$$param AS $rowVar " +
        s"MATCH ${anchored(src, 0)} MATCH ${anchored(tgt, 1)} " +
        s"${if (merge) "MERGE" else "CREATE"} " +
        s"(${src.varName})$arrow(${tgt.varName})"
    }
  }

  /** Restricted node deletion — the mutation companion of [[MergeQuery]]:
    * {{{
    *   MATCH (n:Label [{prop: lit}]) [WHERE pred (AND pred)*]
    *     [DETACH] DELETE n
    * }}}
    * One single-node pattern; the WHERE takes the full predicate grammar
    * (including EXISTS). `DETACH DELETE` also removes every incident
    * relationship; plain `DELETE` fails (like Neo4j) when a matched node
    * still has relationships. Lowers to anti-joins against the matched
    * nodeId set and returns the post-delete [[graft.graph.PropertyGraph]]
    * — snapshots stay immutable, persisting is the caller's store write. */
  final case class DeleteQuery(node: NodePat, preds: Seq[Pred],
                               detach: Boolean) {
    def render: String = {
      val where =
        if (preds.isEmpty) ""
        else " WHERE " + preds.map(predText).mkString(" AND ")
      s"MATCH ${nodeText(node)}$where " +
        s"${if (detach) "DETACH " else ""}DELETE ${node.varName}"
    }
  }

  /** One `n.prop = expr` assignment of a standalone SET clause — unlike
    * [[MergeQuery]]'s pre-bound literal [[SetItem]]s, the value is a full
    * scalar expression over the matched node's OWN properties
    * (`SET n.cnt = n.cnt + 1`). */
  final case class UpdateSet(varName: String, prop: String, value: Expr)

  /** Restricted bulk property update — the standalone mutation companion
    * of [[MergeQuery]]:
    * {{{
    *   MATCH (n:Label [{anchors}]) [WHERE pred (AND pred)*]
    *     SET [n += $props,] n.p = expr [, n.q = expr]*
    *   MATCH (n:Label [{anchors}]) [WHERE …] REMOVE n.p [, n.q]*
    * }}}
    * Applies to EVERY matched node (where MERGE touches one key) and
    * returns the post-update nodes table. `n += $props` is Neo4j's
    * map-merge SET: the scalar MAP parameter's entries each overwrite
    * that property, other properties keep their values (the loader's
    * record-shaped update); explicit `n.p = expr` items written after
    * it win on the same key, like Neo4j's left-to-right SET. REMOVE
    * nulls the property — the union-of-keys schema keeps the column,
    * exactly how an absent property is represented. Identity columns
    * (nodeId / label / labels) are not assignable as properties; the
    * label-mutation items `SET n:Label` / `REMOVE n:Label` (round 15)
    * instead rewrite the `labels` ARRAY — the queryable label set that
    * label tests and anchors consult — while the primary `label` column
    * stays the storage/merge key, fixed at MERGE time like the
    * reference loader's (stark_neo4j_loading.py:35). */
  final case class UpdateQuery(node: NodePat, preds: Seq[Pred],
                               sets: Seq[UpdateSet],
                               removes: Seq[(String, String)],
                               plusParam: Option[String] = None,
                               setLabels: Seq[String] = Nil,
                               removeLabels: Seq[String] = Nil) {
    def render: String = {
      val where =
        if (preds.isEmpty) ""
        else " WHERE " + preds.map(predText).mkString(" AND ")
      // SET and REMOVE clauses CHAIN in one statement (Neo4j; round 15)
      // — both tails render so a mixed AST round-trips
      val setTail =
        if (sets.nonEmpty || plusParam.nonEmpty || setLabels.nonEmpty)
          " SET " + (plusParam.toSeq.map(pm =>
            s"${node.varName} += $$$pm") ++
            setLabels.map(l => s"${node.varName}:$l") ++
            sets.map(s =>
              s"${s.varName}.${s.prop} = ${exprText(s.value)}")).mkString(", ")
        else ""
      val removeTail =
        if (removes.nonEmpty || removeLabels.nonEmpty)
          " REMOVE " + (removeLabels.map(l => s"${node.varName}:$l") ++
            removes.map { case (v, p) => s"$v.$p" }).mkString(", ")
        else ""
      s"MATCH ${nodeText(node)}$where$setTail$removeTail"
    }
  }

  /** Restricted node creation `CREATE (n:L {nodeId: <int>[, p: lit]*})
    * [, (m:L2 {…})]*`. This engine enforces the S2 unique-key constraint,
    * so creating an existing (label, nodeId) FAILS — the behavior of
    * Neo4j WITH the uniqueness constraint the loader declares
    * (stark_neo4j_loading.py:15-18), not of bare Neo4j (which would
    * create an indistinguishable duplicate). Returns the post-create
    * nodes table. */
  final case class CreateNodesQuery(pats: Seq[NodePat]) {
    def render: String = "CREATE " + pats.map(nodeText).mkString(", ")
  }

  /** Restricted relationship mutation between two matched anchors:
    * {{{
    *   MATCH (a:…), (b:…) [WHERE …] CREATE (a)-[:T]->(b)
    *   MATCH (a:…), (b:…) [WHERE …] MERGE (a)-[:T]-(b)
    * }}}
    * One edge pattern over the two bound variables. CREATE appends one
    * relationship PER MATCHED PAIR (parallel edges allowed, like Neo4j)
    * and requires a direction (Neo4j rejects undirected CREATE). MERGE
    * is the loader's idempotent edge upsert
    * (stark_neo4j_loading.py:43-61): only pairs with no existing edge of
    * that type are inserted — the undirected form treats either stored
    * orientation as existing and, like Neo4j, creates ONE edge per
    * unordered pair even when the match is symmetric (both (x,y) and
    * (y,x) rows in one statement), stored in the deterministic
    * (least, greatest) orientation. `dir` is
    * 1 for `->`, -1 for `<-`, 0 undirected. Returns the post-mutation
    * relationships table. */
  final case class RelMutationQuery(a: NodePat, b: NodePat, preds: Seq[Pred],
                                    relType: String, dir: Int,
                                    merge: Boolean) {
    def render: String = {
      val where =
        if (preds.isEmpty) ""
        else " WHERE " + preds.map(predText).mkString(" AND ")
      val arrow = dir match {
        case 1  => s"-[:$relType]->"
        case -1 => s"<-[:$relType]-"
        case _  => s"-[:$relType]-"
      }
      s"MATCH ${nodeText(a)}, ${nodeText(b)}$where " +
        s"${if (merge) "MERGE" else "CREATE"} " +
        s"(${a.varName})$arrow(${b.varName})"
    }
  }

  /** `q1 UNION [ALL] q2 [UNION [ALL] q3 …]` — Cypher's set union of full
    * queries. Every part must RETURN the same column names in the same
    * order (checked at plan time, like Neo4j); `UNION` dedups rows ACROSS
    * parts, `UNION ALL` concatenates. Mixing the two forms in one query
    * is rejected at parse time, also like Neo4j. A single-part union is
    * the plain query (no implicit dedup). */
  final case class UnionQuery(parts: Seq[CypherQuery], all: Boolean) {
    require(parts.nonEmpty, "at least one query part")
    def render: String =
      parts.map(_.render).mkString(if (all) " UNION ALL " else " UNION ")
  }
}
