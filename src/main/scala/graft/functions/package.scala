package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level functions shared by the operators.
  *
  * Everything here composes codegen'd Spark built-ins (higher-order array
  * functions, string functions) — no Scala UDFs in hot paths, so the
  * expressions stay inside whole-stage codegen (SURVEY §2.10). The single
  * UDF (`nfc_normalize`) is used only on tiny anchor-lookup paths.
  */
package object functions {

  /** V1 — cosine similarity between two `array<double>` columns
    * (reference: `vector.similarity.cosine`, retrieval/retriever.py:59).
    * A native codegen'd Catalyst expression ([[graft.expr.CosineSimilarity]]):
    * the higher-order-function composition is CodegenFallback (interpreted,
    * allocating) and measured ~7× slower on pairwise-similarity joins.
    * Zero-norm / mismatched / null inputs → null (DuckDB-compatible).
    */
  def cosineSim(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(graft.expr.CosineSimilarity(
      bridge.expression(x.cast("array<double>")),
      bridge.expression(y.cast("array<double>"))))
  }

  /** Dot product for pre-normalized vectors (preferred at scale: normalize
    * once at load, then cosine == dot — SURVEY §4 physical notes). */
  def dotProduct(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a * b), lit(0.0), (acc, v) => acc + v)

  /** L2-normalize an `array<double>` column; zero vectors → null elements
    * (nullif guards ANSI divide-by-zero, Spark 4 default). */
  def l2Normalize(x: Column): Column = {
    val n = nullif(sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v)), lit(0.0))
    transform(x, v => v / n)
  }

  /** P6 — Unicode NFC normalization (reference: Cypher `normalize()`,
    * retrieval/ner.py:111-114; DuckDB oracle: `nfc_normalize`). A codegen'd
    * Catalyst expression ([[graft.expr.NormalizeNFC]]) — the former UDF
    * broke whole-stage codegen on the lookup path. The SQL-name
    * registration is kept for spark.sql string queries. */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.registerFunction(spark, "graft_nfc",
      classOf[graft.expr.NormalizeNFC].getName,
      children => graft.expr.NormalizeNFC(children.head))
    bridge.registerFunction(spark, "graft_cosine",
      classOf[graft.expr.CosineSimilarity].getName,
      children => graft.expr.CosineSimilarity(children(0), children(1)))
    bridge.registerFunction(spark, "graft_token_estimate",
      classOf[graft.expr.TokenEstimate].getName,
      children => graft.expr.TokenEstimate(children.head))
  }

  /** Truncating int64 division — Java/Neo4j/Cypher integer-division
    * semantics (toward zero, so -7/2 = -3), matching DuckDB's `//` (the
    * repo's oracle-verified convention). Catalyst's native IntegralDivide
    * (`div`), codegen'd; exact at any magnitude, unlike a
    * double-divide-then-cast. Division by zero → null (non-ANSI mode). */
  def longDiv(l: Column, r: Column): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      bridge.expression(l), bridge.expression(r)))
  }

  /** NFC normalize a string column (codegen'd). */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(graft.expr.NormalizeNFC(bridge.expression(c)))
  }

  /** Normalized-name expression used by the fulltext-exact lookup path
    * (`lower(nfc(s))` — retrieval/ner.py:113). */
  def normName(c: Column): Column = lower(nfc(c))

  /** Whitespace word tokenizer shared by the text-analysis operators.
    * Deliberately the `filter` lambda, NOT `array_remove(split(…), "")`:
    * the values are identical, but expressions that reference words(…)
    * several times inside conditional folds (language-ID argmax) rely on
    * interpreted-mode subexpression elimination to evaluate the split once
    * per row — the codegen'd array_remove form defeats that CSE inside
    * `when` branches and measured 3× SLOWER end-to-end (corpus_clean
    * 2.6 s → 7.6 s at sf0.1). The per-element work that used to dominate
    * lives in codegen'd [[graft.expr.CountIn]]/[[graft.expr.TokenEstimate]]
    * instead. */
  def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** Count of array elements contained in a literal set (codegen'd;
    * the stopword-hit primitive — [[graft.expr.CountIn]]). */
  def countIn(arr: Column, needles: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(graft.expr.CountIn(bridge.expression(arr), needles))
  }

  /** Deterministic token count with a BPE-ish sub-word estimate: words plus
    * an extra token per 4 chars of long words (reference's budget tokenizer
    * is an HF tokenizer, retrieval/retriever.py:67-69 — pluggable; this is
    * the deterministic default, SURVEY §2.10). Codegen'd
    * ([[graft.expr.TokenEstimate]]) — this runs per event in T3 budget
    * accounting and per row in corpus token stats. */
  def tokenCountEstimate(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(graft.expr.TokenEstimate(bridge.expression(words(text))))
  }

  /** 2-D Hilbert-curve index of (x, y) on the 2^bits grid (codegen'd,
    * [[graft.expr.HilbertIndex]]) — the continuous space-filling key the
    * clustered-layout writer orders by. */
  def hilbertIndex(x: Column, y: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftbridge.bridge
    bridge.column(graft.expr.HilbertIndex(
      bridge.expression(x.cast("long")), bridge.expression(y.cast("long")), bits))
  }

  /** Word n-gram shingles (dedup/minhash building block). Empty array when
    * the document has fewer than `n` words.
    *
    * Built with `zip_with` over shifted copies of the word array rather than
    * `transform(sequence(...), i => element_at(w, i+j))`: `element_at` inside
    * a lambda re-evaluates its array operand per element, which measured 13×
    * slower. `zip_with` pads the shorter (shifted) side with nulls; `concat`
    * null-propagates, so the trailing `n-1` null shingles are cut by the
    * final `slice`. */
  def wordShingles(text: Column, n: Int): Column = wordShinglesOf(words(text), n)

  /** Same, over an already-materialized words-array column. */
  def wordShinglesOf(w: Column, n: Int): Column = {
    val zipped = (1 until n).foldLeft(w) { (acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), greatest(size(w) - j, lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(slice(zipped, lit(1), size(w) - (n - 1)))
  }

  /** Loader name mangling (reference stark_neo4j_loading.py:11-18):
    * node-type labels are CamelCased snake_case with '/' → '_or_'
    * ("field_of_study" → "FieldOfStudy", "exposure/phenotype" →
    * "Exposure_or_Phenotype" ... per the reference: split on '_', initcap
    * each part, join). */
  def camelLabel(c: Column): Column =
    array_join(transform(split(regexp_replace(c, "/", "_or_"), "_"),
      w => initcap(w)), "")

  /** Edge types: the segment after '___' upper-cased
    * ("author___writes___paper" → "WRITES"). */
  def upperSnakeRelType(c: Column): Column =
    upper(element_at(split(c, "___"), 2))

  /** Engine-portable hash for MinHash: lowercase hex md5 of `seed|value`.
    * Lexicographic `min` over these strings is identical in Spark and
    * DuckDB, which makes the LSH oracle exactly reproducible — no reliance
    * on engine-specific integer hash functions. */
  def seededMd5(seed: Int, value: Column): Column =
    md5(concat(lit(seed.toString), lit("|"), value))
}
