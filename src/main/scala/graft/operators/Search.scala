package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index fulltext search — the batch-retrieval half of the
  * reference's fulltext lookup (retrieval/ner.py fulltext index call),
  * re-expressed as a distributed index build + ranked probe instead of a
  * per-query index server call.
  *
  * Scoring is TF-IDF with the idf kept LOG-FREE and in exact integer
  * micro-units: contrib(term, doc) = (tf * 1e6 * N) div df. Integer
  * division is bit-identical across engines and summation order cannot
  * perturb it, so ranked results hash-match a SQL oracle exactly — no
  * float drift. (A log-scaled idf changes ranking only when df ratios
  * invert across terms; the rational idf preserves the dominant ordering
  * and keeps the whole operator hash-checkable.)
  *
  * Scale shape: the index build is one explode + one groupBy (map-side
  * combined); a query probes with a broadcast IN-filter on the term
  * column — pushed to the posting scan — so only matching postings ever
  * shuffle, and the df/N sides are broadcast. Nothing is proportional to
  * corpus size except the one index-build pass.
  */
object Search {

  /** Inverted index: one posting per (term, doc) with its term frequency.
    * At 100 TB this is the write-once artifact you'd persist bucketed by
    * term; every later query is a pruned probe of it. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.words(lower(col("text")))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Ranked top-k fulltext search for a bag of query terms. Returns
    * (doc_id, n_terms, score_micro) — matched-term count and the exact
    * integer TF-IDF score — deterministically ordered (score desc, doc_id)
    * and truncated via TakeOrderedAndProject (no global sort).
    *
    * Operating range: the Long product `tf * 1e6 * n_docs` is exact while
    * `tf * n_docs < 9.2e12` — e.g. a 1e9-doc corpus with per-doc term
    * frequency up to ~9,000. Past that (a full 1e13-token crawl in ONE
    * index), widen the product to decimal(38,0) in this expression AND the
    * oracle together; reordering the multiply/divide instead would change
    * the exact quotient and break score parity. */
  def tfidfTopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val qp = postings(docs).where(col("term").isin(terms: _*))
    val dfreq = qp.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    qp.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("contrib", expr("(tf * 1000000 * n_docs) div df"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Harman S-stemmer (the conservative three-rule plural stripper —
    * "Harman, How effective is suffixing?", JASIS 1991) as a SQL CASE in
    * the LIKE/substr/concat dialect subset BOTH engines parse verbatim:
    * ies→y (not eies/aies), -es drops s (not aes/ees/oes), -s drops
    * (not us/ss). One codegen'd expression per posting — no dictionary,
    * no UDF. */
  val sStemSql: String =
    """CASE
      |WHEN term LIKE '%ies' AND term NOT LIKE '%eies' AND term NOT LIKE '%aies'
      |  THEN concat(substr(term, 1, length(term) - 3), 'y')
      |WHEN term LIKE '%es' AND term NOT LIKE '%ies' AND term NOT LIKE '%aes'
      |  AND term NOT LIKE '%ees' AND term NOT LIKE '%oes'
      |  THEN substr(term, 1, length(term) - 1)
      |WHEN term LIKE '%s' AND term NOT LIKE '%es' AND term NOT LIKE '%us'
      |  AND term NOT LIKE '%ss'
      |  THEN substr(term, 1, length(term) - 1)
      |ELSE term END""".stripMargin

  /** Driver-side twin of [[sStemSql]] for stemming literal query terms.
    * Each ending class is handled by exactly one rule — an exception word
    * ("shoes", "eies") stays UNCHANGED rather than falling through to a
    * weaker rule, per Harman's formulation. */
  def sStem(term: String): String = {
    def e(s: String) = term.endsWith(s)
    if (e("ies")) { if (!e("eies") && !e("aies")) term.dropRight(3) + "y" else term }
    else if (e("es")) {
      if (!e("aes") && !e("ees") && !e("oes")) term.dropRight(1) else term
    }
    else if (e("s")) { if (!e("us") && !e("ss")) term.dropRight(1) else term }
    else term
  }

  /** Stemmed inverted index: postings keyed by the S-stem, so plural and
    * singular surface forms share one posting list. Same build shape as
    * [[postings]] plus one codegen'd CASE per token. */
  def stemmedPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.words(lower(col("text")))).as("term"))
      .select(col("doc_id"), expr(sStemSql).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** [[tfidfTopK]] over the stemmed index, query terms stemmed with the
    * same rules — "queries" finds "query", "vectors" finds "vector". */
  def stemmedTfidfTopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val stemmed = terms.map(sStem).distinct
    val qp = stemmedPostings(docs).where(col("term").isin(stemmed: _*))
    val dfreq = qp.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    qp.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("contrib", expr("(tf * 1000000 * n_docs) div df"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion — the hybrid-search combiner: each input
    * ranking contributes `1e6 div (c + rank)` per doc (c = 60, the
    * Cormack/Clarke constant), summed across lists. Rank-based, so
    * incomparable score scales (lexical vs vector) fuse without
    * normalization, and the integer quotient is hash-exact.
    *
    * Inputs are top-k PAGES (bounded — each ranking is already the output
    * of a TakeOrderedAndProject), so the unpartitioned rank window and the
    * fusion groupBy run on k·lists rows, never the corpus. */
  def rrfFuse(rankings: Seq[(DataFrame, String)], idCol: String, c: Int,
              k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = rankings.map { case (df, scoreCol) =>
      df.select(col(idCol), row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("rnk"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lists"),
        sum(expr(s"1000000 div ($c + rnk)")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }

  /** BM25 top-k (k1=1.2, b=0.75), exact-integer micro-units throughout.
    *
    * Both BM25 fractions are cleared of decimals so every division is ONE
    * integer `div` in a fixed position, hash-identical across engines:
    *   idf  = (N-df+0.5)/(df+0.5)            → ((2(N-df)+1)·1e6) div (2df+1)
    *   sat  = tf(k1+1)/(tf+k1(1-b+b·dl/avgdl)), avgdl = L/N; multiply
    *          num and den by 10L →  (22·tf·L·1e6) div (10·tf·L+3L+9·dl·N)
    *   contrib = (idfM · satM) div 1e6
    * (log-free Robertson idf: rational instead of ln, same monotonicity).
    *
    * Operating range (Long-exact): `22e6·tf·L < 9.2e18` → tf·L < 4.1e11,
    * and `idfM·satM < 9.2e18` → N < ~1.9e6 docs per index shard; past
    * that, shard the index (the natural 100 TB layout anyway) or widen
    * both engines to decimal(38,0) together.
    *
    * Scale shape: `dl` is a narrow map over docs (at 100 TB, the persisted
    * doc-length column of the index); the probe side joins only pruned
    * postings to it; df/N/L are two broadcast scalars. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(graft.functions.words(lower(col("text")))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("corpus_len"))
    val qp = postings(docs).where(col("term").isin(terms: _*))
    val dfreq = qp.groupBy("term").agg(count(lit(1)).as("df"))
    qp.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_micro",
        expr("((2 * (n_docs - df) + 1) * 1000000) div (2 * df + 1)"))
      .withColumn("sat_micro",
        expr("(22 * tf * corpus_len * 1000000) div " +
          "(10 * tf * corpus_len + 3 * corpus_len + 9 * dl * n_docs)"))
      .withColumn("contrib", expr("(idf_micro * sat_micro) div 1000000"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** POSITIONAL inverted index: one posting per term OCCURRENCE with its
    * 0-based word position — the index layout that makes phrase and
    * proximity queries joins instead of rescans. The reference's fulltext
    * backend (Lucene behind `db.index.fulltext.queryNodes`,
    * retrieval/ner.py:99-103) is phrase-capable precisely because Lucene
    * stores positions; this is the same trade — a wider write-once index
    * for adjacency-join reads. At 100 TB: persisted bucketed by term,
    * like [[postings]]. */
  def posPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(
      graft.functions.words(lower(col("text")))).as(Seq("pos", "term")))

  /** Exact-phrase top-k: multi-word entity names ("Applications of
    * nanotechnology") are the common case in the reference's corpus, and
    * bag-of-words TF-IDF cannot distinguish them from scattered term
    * hits. A phrase occurrence is an anchor position of the FIRST word
    * whose i-th successor word sits at pos+i for every following phrase
    * term — checked with one position-adjacency SEMI-join per extra term,
    * all on pruned postings (only the phrase's terms ever leave the index
    * scan), keyed by (doc_id, pos) so candidates stay co-partitioned
    * across the chain. Scored with the same integer TF-IDF as
    * [[tfidfTopK]], with the PHRASE as the unit: tf = occurrences, df =
    * docs containing the phrase. Returns (doc_id, tf, score_micro),
    * deterministic (score desc, doc_id), TakeOrderedAndProject. */
  def phraseTopK(docs: DataFrame, phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val pp = posPostings(docs).where(col("term").isin(phrase.distinct: _*))
    val anchor = pp.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matches = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        acc.join(
          pp.where(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"), "left_semi")
    }
    val ph = matches.groupBy("doc_id").agg(count(lit(1)).as("tf"))
    val dfq = ph.agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    ph.crossJoin(broadcast(dfq)).crossJoin(broadcast(n))
      .select(col("doc_id"), col("tf"),
        expr("(tf * 1000000 * n_docs) div df").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** SLOPPY-phrase top-k — the proximity rung Lucene (the reference's
    * fulltext backend, retrieval/ner.py:99-103) exposes as `"..."~slop`
    * and [[phraseTopK]]'s exact adjacency cannot express. Semantics
    * (anchored proximity, precisely specified rather than Lucene's
    * edit-distance heuristic): an occurrence is an anchor position p of
    * the FIRST term such that every following term i is found within
    * ±slop of its exact-phrase slot p+i; slop = 0 degenerates to the
    * exact phrase. Each anchor is weighted by how tight its match is —
    * 10^6 div (1 + Σᵢ devᵢ) where devᵢ is term i's MINIMAL deviation
    * from its slot — so exact occurrences dominate loose ones, and
    * score_micro = (prox_micro · n_docs) div df ranks by
    * proximity-weighted tf·idf.
    *
    * Scale shape: the slop window is EXPLODED (2·slop+1 candidate
    * anchors per posting, slop is single-digit) so every join in the
    * chain stays a co-partitioned EQUI-join on (doc_id, pos) — the same
    * shape as [[phraseTopK]], never a range join, never a rescan; only
    * the phrase's terms leave the index scan, and the per-term min-dev
    * pre-aggregation dedups candidates before the join. */
  def sloppyPhraseTopK(docs: DataFrame, phrase: Seq[String], slop: Int,
                       k: Int): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    require(slop >= 0, s"negative slop: $slop")
    val pp = posPostings(docs).where(col("term").isin(phrase.distinct: _*))
    val anchor = pp.where(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val devCols = phrase.zipWithIndex.tail.map { case (_, i) => s"dev_$i" }
    val joined = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        val cand = pp.where(col("term") === t)
          .select(col("doc_id"), col("pos"),
            explode(sequence(lit(-slop), lit(slop))).as("d"))
          .select(col("doc_id"), (col("pos") - i + col("d")).as("pos"),
            abs(col("d")).as("dev"))
          .groupBy("doc_id", "pos").agg(min("dev").as(s"dev_$i"))
        acc.join(cand, Seq("doc_id", "pos"))
    }
    val devSum =
      if (devCols.isEmpty) lit(0L) else devCols.map(col).reduce(_ + _)
    val ph = joined
      .select(col("doc_id"), devSum.cast("long").as("devsum"))
      .groupBy("doc_id").agg(count(lit(1)).as("tf"),
        sum(expr("1000000 div (1 + devsum)")).as("prox_micro"))
    val dfq = ph.agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    ph.crossJoin(broadcast(dfq)).crossJoin(broadcast(n))
      .select(col("doc_id"), col("tf"), col("prox_micro"),
        expr("(prox_micro * n_docs) div df").as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }
}
