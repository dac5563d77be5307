package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** V1/V2 cosine + KNN, ANN bucketing (reference retriever.py:14-25,49-60). */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Seq(1.0, 0.0, 0.0, 0.0)),
    (1L, Seq(1.0, 0.0, 0.0, 0.0)),    // identical to query
    (2L, Seq(0.0, 1.0, 0.0, 0.0)),    // orthogonal
    (3L, Seq(-1.0, 0.0, 0.0, 0.0)),   // opposite
    (4L, Seq(1.0, 1.0, 0.0, 0.0)),    // 45°
    (5L, Seq(0.6, 0.1, 0.0, 0.0)))
    .toDF("id", "v")

  test("V1 cosine similarity exact values") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val m = Vectors.scored(emb, "v", q).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("similarity")).toMap
    assert(math.abs(m(1L) - 1.0) < 1e-12)
    assert(math.abs(m(2L)) < 1e-12)
    assert(math.abs(m(3L) + 1.0) < 1e-12)
    assert(math.abs(m(4L) - math.sqrt(0.5)) < 1e-12)
  }

  test("V2 top-k with exclusion, similarity-desc id-asc order") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val out = Vectors.bruteForceTopK(emb, "id", "v", q, 3, exclude = Seq(0L))
      .collect().map(_.getAs[Long]("id")).toSeq
    // sims: 1→1.0, 4→0.707, 5→0.986, 2→0, 3→-1 ⇒ top3 = 1, 5, 4
    assert(out === Seq(1L, 5L, 4L))
  }

  test("cosine symmetry and self-similarity (property)") {
    val rnd = new scala.util.Random(11)
    val vs = (0L until 20L).map(i =>
      (i, Seq.fill(4)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
    val self = vs.select(graft.functions.cosineSim(col("v"), col("v")).as("s"))
      .collect().map(_.getDouble(0))
    assert(self.forall(s => math.abs(s - 1.0) < 1e-9))
    val pairs = vs.as("x").crossJoin(vs.as("y"))
      .select(graft.functions.cosineSim(col("x.v"), col("y.v")).as("xy"),
        graft.functions.cosineSim(col("y.v"), col("x.v")).as("yx"))
      .collect()
    assert(pairs.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    assert(pairs.forall(r => r.getDouble(0) >= -1 - 1e-9 && r.getDouble(0) <= 1 + 1e-9))
  }

  test("l2Normalize makes cosine equal dot product") {
    val rnd = new scala.util.Random(13)
    val vs = (0L until 10L).map(i =>
      (i, Seq.fill(4)(rnd.nextDouble() * 2 - 1))).toDF("id", "v")
      .withColumn("nv", graft.functions.l2Normalize(col("v")))
    val rows = vs.as("x").crossJoin(vs.as("y"))
      .select(graft.functions.cosineSim(col("x.v"), col("y.v")).as("cos"),
        graft.functions.dotProduct(col("x.nv"), col("y.nv")).as("dot"))
      .collect()
    assert(rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("ANN LSH bucket prunes to the query's sign bucket") {
    val q = Seq(1.0, 0.0, 0.0, 0.0) // bucket of sign-bits: 1,1,1,1 (0 counts as >=0)
    val out = Vectors.lshTopK(emb, "id", "v", q, 10, bits = 4)
      .collect().map(_.getAs[Long]("id")).toSet
    // all vectors with non-negative first 4 dims: 0,1,2,4,5 (3 has -1)
    assert(out === Set(0L, 1L, 2L, 4L, 5L))
  }

  test("ANN LSH multi-probe reaches Hamming-1 buckets") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    // id 3's bucket 0111 is one flipped bit from the query's 1111 — single
    // probe misses it (test above), radius-1 multi-probe recovers it
    val out = Vectors.lshTopK(emb, "id", "v", q, 10, bits = 4, probeRadius = 1)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out === Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("cross-group pairs: best partner per id, never same group") {
    // all in one bucket (first 2 dims >= 0); groups A={1,2}, B={3,4}
    val pts = Seq(
      (1L, "A", Seq(1.0, 0.0)), (2L, "A", Seq(0.8, 0.6)),
      (3L, "B", Seq(0.99, 0.1)), (4L, "B", Seq(0.0, 1.0)))
      .toDF("id", "grp", "v")
    val out = Vectors.crossGroupPairs(pts, "id", "v", "grp", bits = 2,
        threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getString(3)))).toMap
    // 1's best B partner is 3 (cos ~0.995); 3's best A partner is 1
    assert(out(1L)._1 === 3L)
    assert(out(3L)._1 === 1L)
    // every kept pair crosses groups
    assert(out.values.forall(p => p._2 != p._3))
    // 4 (y-axis) vs A: cos(4,2)=0.6 >= 0.5 → partner 2
    assert(out(4L)._1 === 2L)
  }

  test("matryoshka recall: full width is exact, prefixes are quantified") {
    val r = Queries.embMatryoshkaRecall(spark, "/root/testdata/sf0.001")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(64) === 1.0, "full-width truncation must reproduce brute force")
    assert(r.keySet === Set(8, 16, 32, 64))
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
    // hand-check on a constructed set: prefix-2 search over 4-dim vectors
    // where the tail dominates — v1 beats v2 at full width, loses at d=2
    val pts = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),             // query
      (1L, Seq(0.1, 0.0, 0.99, 0.0)),            // full-width near (via tail)
      (2L, Seq(0.9, 0.43, 0.0, 0.0))).toDF("id", "v")
    val m = Vectors.matryoshkaRecall(pts, "id", "v", Seq(1.0, 0.0, 0.0, 0.0),
      k = 2, dims = Seq(2, 4))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(m(4) === 1.0)
    // at d=2 the candidate set is the same {0,1,2} minus none (k=2 of 3):
    // prefix ranking still finds 2 of the full-width top-2 only if overlap;
    // v1's prefix (0.1,0) normalizes to cos 1.0 — ties are deterministic
    assert(m(2) >= 0.5)
  }

  test("ANN recall floors vs brute force on the driver embeddings") {
    // the report that catches silent recall collapse: EVERY ANN path must
    // hold >= 0.9 at catalog settings (lsh holds it via Hamming-2
    // multi-probe — radius 1 measured 0.7, the round-6 unquantified gap)
    val r = Queries.annRecallReport(spark, "/root/testdata/sf0.001")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    for (m <- Seq("ivf", "ivf_kmeans", "ivfpq", "pq", "sq8", "lsh"))
      assert(r(m) >= 0.9, s"$m recall ${r(m)} below 0.9 floor")
  }

  test("IVF k-means: Lloyd iterations recover the true clusters") {
    // two tight clusters around x-axis and y-axis; seeded centroids are the
    // first 2 ids (0, 1) — BOTH in the x cluster, so the seed split is
    // wrong and only the Lloyd refinement can separate the clusters
    val pts = Seq(
      (0L, Seq(1.0, 0.01, 0.0, 0.0)), (1L, Seq(1.0, -0.01, 0.0, 0.0)),
      (2L, Seq(1.0, 0.02, 0.0, 0.0)), (3L, Seq(0.99, 0.0, 0.0, 0.0)),
      (10L, Seq(0.01, 1.0, 0.0, 0.0)), (11L, Seq(-0.01, 1.0, 0.0, 0.0)),
      (12L, Seq(0.0, 0.99, 0.0, 0.0))).toDF("id", "v")
    // query along y: with nProbe=1 the probed cell must be the y cluster,
    // and all three y points must rank above any x point
    val out = Vectors.ivfKmeansTopK(pts, "id", "v", Seq(0.0, 1.0, 0.0, 0.0),
      k = 5, nCentroids = 2, nProbe = 1, lloydIters = 2)
      .collect().map(_.getLong(0))
    assert(out.toSet === Set(10L, 11L, 12L))
    // untrained IVF with the same degenerate seeds probes a cell that still
    // mixes clusters — training is what makes the cell pure
    val untrained = Vectors.ivfTopK(pts, "id", "v", Seq(0.0, 1.0, 0.0, 0.0),
      k = 5, nCentroids = 2, nProbe = 1)
      .collect().map(_.getLong(0))
    assert(untrained.toSet !== Set(10L, 11L, 12L))
  }

  test("PQ with full-coverage ef equals exact brute force after re-rank") {
    // 24 deterministic 8-dim vectors; ef covers the whole set, so the ADC
    // candidate stage cannot lose the true top-k and the exact re-rank must
    // reproduce brute force ranking bit-for-bit
    val rnd = new scala.util.Random(11)
    val vs = (0L until 24L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vs.toDF("id", "v")
    val q = vs(1)._2
    val pq = Vectors.pqTopK(df, "id", "v", q, k = 5, m = 4, kCodes = 4,
      lloydIters = 1, ef = 24).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bf = Vectors.bruteForceTopK(df, "id", "v", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.toSeq === bf.toSeq)
    assert(pq.head._1 === 1L) // the query's own row ranks first
  }

  test("IVF-PQ: full-probe full-ef equals brute force; pruning stays ranked") {
    // probing every cell with ef covering the whole set means neither the
    // coarse quantizer nor the ADC stage can lose the true top-k — the
    // exact re-rank must reproduce brute force bit-for-bit
    val rnd = new scala.util.Random(29)
    val vs = (0L until 24L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vs.toDF("id", "v")
    val q = vs(1)._2
    val full = Vectors.ivfPqTopK(df, "id", "v", q, k = 5, nCells = 3,
      nProbe = 3, m = 4, kCodes = 4, lloydIters = 1, ef = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bf = Vectors.bruteForceTopK(df, "id", "v", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq === bf.toSeq)
    assert(full.head._1 === 1L)
    // pruned probe: subset of the corpus, still ranked by exact cosine
    // desc, and deterministic across runs
    val pruned = Vectors.ivfPqTopK(df, "id", "v", q, k = 5, nCells = 4,
      nProbe = 2, m = 4, kCodes = 4, lloydIters = 1, ef = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pruned.length === 5)
    assert(pruned.map(_._2).toSeq === pruned.map(_._2).sortBy(-_).toSeq)
    val again = Vectors.ivfPqTopK(df, "id", "v", q, k = 5, nCells = 4,
      nProbe = 2, m = 4, kCodes = 4, lloydIters = 1, ef = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === pruned.toSeq)
  }

  test("ABTT removes the dominant axis: rank flip vs raw cosine") {
    // corpus variance is concentrated on e1 (the anisotropic axis); the
    // retrieval signal lives in e2/e3. Raw cosine ranks the e1-aligned
    // confounder above the true neighbor; after centering + top-PC
    // removal the ordering flips.
    val filler = (10L to 17L).map(i =>
      (i, Seq((i - 9) * 0.1, 0.01, -0.01, 0.0)))
    val pts = Seq(
      (0L, Seq(0.5, 0.1, 0.0, 0.0)),  // query
      (1L, Seq(0.05, 0.1, 0.0, 0.0)), // same signal, tiny e1 weight
      (2L, Seq(0.5, 0.0, 0.1, 0.0))   // orthogonal signal, query's e1
    ) ++ filler
    val df = pts.toDF("id", "v")
    val raw = Vectors.bruteForceTopK(df, "id", "v", Seq(0.5, 0.1, 0.0, 0.0),
      k = 11, exclude = Seq(0L)).collect().map(_.getLong(0))
    assert(raw.indexOf(2L) < raw.indexOf(1L),
      "raw cosine must prefer the e1-aligned confounder")
    val ab = Vectors.abttTopK(df, "id", "v", queryId = 0L, k = 11)
      .collect().map(_.getLong(0)).filter(_ != 0L)
    assert(ab.head === 1L, s"ABTT must surface the true neighbor: ${ab.toSeq}")
    assert(ab.indexOf(1L) < ab.indexOf(2L))
    // deterministic end to end
    val again = Vectors.abttTopK(df, "id", "v", queryId = 0L, k = 11)
      .collect().map(_.getLong(0)).filter(_ != 0L)
    assert(again.toSeq === ab.toSeq)
  }

  test("SQ8 with full-coverage ef equals exact brute force after re-rank") {
    val rnd = new scala.util.Random(13)
    val vs = (0L until 24L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vs.toDF("id", "v")
    val q = vs(2)._2
    val sq = Vectors.sq8TopK(df, "id", "v", q, k = 5, ef = 24)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val bf = Vectors.bruteForceTopK(df, "id", "v", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sq.toSeq === bf.toSeq)
    assert(sq.head._1 === 2L)
  }

  test("SQ8 quantization error is bounded: ADC ranks the query's own row first") {
    // tight ef: the dequantized codes must still put the query row (exact
    // self-match) through the candidate stage — per-dim error <= rng/510
    // keeps the self squared-distance far below any other vector's
    val rnd = new scala.util.Random(17)
    val vs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vs.toDF("id", "v")
    val out = Vectors.sq8TopK(df, "id", "v", vs(7)._2, k = 3, ef = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.head._1 === 7L)
    assert(out.head._2 === 1.0)
    // constant dimension (rng = 0) must not divide by zero
    val const = (0L until 6L).map(i => (i, Seq(1.0, rnd.nextGaussian())))
    val cOut = Vectors.sq8TopK(const.toDF("id", "v"), "id", "v",
      const(1)._2, k = 2, ef = 6).collect()
    assert(cOut.length === 2)
  }

  test("PQ with selective ef returns a subset ranked by exact cosine") {
    val rnd = new scala.util.Random(5)
    val vs = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val df = vs.toDF("id", "v")
    val out = Vectors.pqTopK(df, "id", "v", vs(3)._2, k = 6, m = 2, kCodes = 6,
      lloydIters = 2, ef = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length === 6)
    // ranking within the returned rows is by exact similarity desc
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(-_).toSeq)
    // repeatable: deterministic tie-breaks end to end
    val again = Vectors.pqTopK(df, "id", "v", vs(3)._2, k = 6, m = 2, kCodes = 6,
      lloydIters = 2, ef = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === out.toSeq)
  }

  test("semanticDedup drops higher ids within clusters, never across") {
    // seeds are the first nClusters ids, so ids 0/1/2 span the three
    // orthogonal cluster directions; later ids join those clusters
    val pts = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.01)),   // seed: x cluster
      (1L, Seq(0.0, 1.0, 0.0, 0.01)),   // seed: y cluster
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),    // seed: z cluster (stays singleton)
      (3L, Seq(1.0, 0.0, 0.0, 0.02)),   // ~dup of 0 → dropped
      (4L, Seq(0.9, 0.1, 0.0, 0.5)),    // x cluster, below threshold
      (10L, Seq(0.0, 1.0, 0.0, 0.02)))  // ~dup of 1 → dropped
      .toDF("id", "v")
    val out = graft.operators.Dedup.semanticDedup(pts, "id", "v",
        nClusters = 3, lloydIters = 1, threshold = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // membership counts (3, 2, 1); exactly one drop in each 2+-cluster
    assert(out === Set((3L, 1L), (2L, 1L), (1L, 0L)))
  }

  test("near-dup pairs via shared bucket, ordered ids, threshold") {
    val out = Vectors.nearDupPairs(emb, "id", "v", bits = 4, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("cos_sim")))
    out.foreach { case (a, b, _) => assert(a < b) }
    // identical pair (0,1) must be present with sim 1.0
    assert(out.exists { case (a, b, s) => a == 0L && b == 1L && math.abs(s - 1.0) < 1e-9 })
    // orthogonal (0,2) must not pass 0.9
    assert(!out.exists { case (a, b, _) => a == 0L && b == 2L })
  }

  test("hard negatives: different label only, same bucket only, top-k") {
    val pts = Seq(
      (0L, Seq(1.0, 0.1, 0.0, 0.0), 0),   // anchor, bucket 11
      (1L, Seq(1.0, 0.2, 0.0, 0.0), 0),   // same label → excluded
      (2L, Seq(1.0, 0.3, 0.0, 0.0), 1),   // neg, close
      (3L, Seq(0.1, 1.0, 0.0, 0.0), 1),   // neg, farther
      (4L, Seq(-1.0, 0.5, 0.0, 0.0), 1))  // different bucket → excluded
      .toDF("vec_id", "embedding", "label")
    val out = Vectors.hardNegatives(pts, "vec_id", "embedding", "label",
        anchorIds = Seq(0L), bits = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((0L, 2L), (0L, 3L)))
  }

  test("random projection: linear on micro-exact inputs, zero maps to zero") {
    val a = Seq(0.5, -0.25, 1.0, 0.125)
    val b = Seq(1.5, 0.75, -2.0, 0.0)
    val in = Seq((1L, a), (2L, b), (3L, a.zip(b).map { case (x, y) => x + y }),
      (4L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v")
    val out = Vectors.randomProjection(in, "id", "v", dIn = 4, dOut = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size === 4 * 6)
    // all inputs are exact 1e-6 multiples → quantization commutes with +
    (0 until 6).foreach { d =>
      assert(out((3L, d)) === out((1L, d)) + out((2L, d)))
      assert(out((4L, d)) === 0L)
    }
    // the sign matrix is sparse but not empty: some component is nonzero
    assert(out.values.exists(_ != 0L))
  }

  // unit vectors at signed angles from the query axis: relevance = cos(angle),
  // pairwise sim = cos(angle difference) — diversity is controllable exactly
  private def ang(id: Long, deg: Double): (Long, Seq[Double]) = {
    val r = math.toRadians(deg)
    (id, Seq(math.cos(r), math.sin(r), 0.0, 0.0))
  }
  private lazy val fan = Seq(ang(1L, 20), ang(2L, 25), ang(3L, -30))
    .toDF("id", "v")

  test("power iteration: converges onto a planted dominant direction") {
    import spark.implicits._
    // 20 vectors: ±8.0 along dim 0 (variance 64) plus tiny off-axis
    // noise (variance ≤ 0.01) → the top principal direction is ±e0;
    // after 3 rounds the milli vector must peak at |1000| on dim 0 and
    // stay an order of magnitude smaller elsewhere
    val vecs = (0 until 20).map { k =>
      val s = if (k % 2 == 0) 1.0f else -1.0f
      (k.toLong, Array(8.0f * s, 0.1f * (k % 3), 0.05f * (k % 5), 0.0f))
    }.toDF("vec_id", "embedding")
    val v = Vectors.powerIterationTopDir(vecs, "vec_id", "embedding", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(v(0L)) === 1000L, s"dominant axis: $v")
    assert((1L to 3L).forall(d => math.abs(v(d)) < 100L), s"off-axis: $v")
  }

  test("MMR: diversity demotes the near-dup second hit") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    // relevance: 1 (cos20=.940) > 2 (cos25=.906) > 3 (cos30=.866), but
    // sim(2,1)=cos5=.996 while sim(3,1)=cos50=.643 — at λ=0.7 the second
    // pick must be the diverse 3: 7*.866-3*.643 > 7*.906-3*.996
    val mmr = Vectors.mmrRerank(fan, "id", "v", q, poolSize = 3, k = 3,
        lambdaTenths = 7)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(mmr.map(_._2) === Seq(1L, 3L, 2L))
    assert(mmr.map(_._1) === Seq(1, 2, 3))
  }

  test("MMR at λ=1 (lambdaTenths=10) degenerates to relevance top-k") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val mmr = Vectors.mmrRerank(fan, "id", "v", q, poolSize = 3, k = 3,
        lambdaTenths = 10)
      .collect().map(_.getLong(1)).toSeq
    assert(mmr === Seq(1L, 2L, 3L))
  }

  test("kmeans quality report: members partition the corpus, Lloyd helps") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count()
    def report(iters: Int) =
      Vectors.kmeansQualityReport(emb, "vec_id", "embedding",
        nCentroids = 8, lloydIters = iters)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    val trained = report(2)
    assert(trained.map(_._1).sum === n, "every vector assigned exactly once")
    assert(trained.forall(_._2 >= 0L), "angular inertia is nonnegative")
    // training on the data must not be worse than the raw first-n seeds
    val seeded = report(0)
    assert(trained.map(_._2).sum <= seeded.map(_._2).sum,
      s"Lloyd rounds should not increase total inertia: " +
        s"${trained.map(_._2).sum} vs ${seeded.map(_._2).sum}")
  }
}
