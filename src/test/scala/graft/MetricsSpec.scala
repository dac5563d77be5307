package graft

import org.apache.spark.sql.functions._
import graft.operators.Metrics

/** A5 — IR metric suite vs hand-computed values (reference
  * compute_metrics.py:3-64) plus the metric identities from SURVEY §5.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private def run(preds: Seq[Long], labels: Seq[Long]) =
    Metrics.perRow(Seq((preds, labels)).toDF("p", "l"), col("p"), col("l"))
      .collect().head

  test("hand-computed row: preds [1,2,3] labels [2,9]") {
    val r = run(Seq(1L, 2L, 3L), Seq(2L, 9L))
    assert(math.abs(r.getAs[Double]("precision") - 1.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 0.4) < 1e-12)
    assert(math.abs(r.getAs[Double]("mrr") - 0.5) < 1e-12)
    assert(r.getAs[Double]("hit_1") === 0.0)
    assert(r.getAs[Double]("hit_5") === 1.0)
    assert(math.abs(r.getAs[Double]("recall_20") - 0.5) < 1e-12)
  }

  test("empty preds → all zeros; empty labels → recall 0") {
    val r = run(Nil, Seq(1L))
    Seq("precision", "recall", "f1", "mrr", "hit_1", "hit_5", "recall_20")
      .foreach(m => assert(r.getAs[Double](m) === 0.0, m))
    val r2 = run(Seq(1L), Nil)
    assert(r2.getAs[Double]("recall") === 0.0)
    assert(r2.getAs[Double]("precision") === 0.0)
  }

  test("metric identities: F1 harmonic bound, MRR range, hit@k monotone") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 60).map { _ =>
      (Seq.fill(rnd.nextInt(8))(rnd.nextInt(10).toLong),
       Seq.fill(rnd.nextInt(5))(rnd.nextInt(10).toLong))
    }
    val rows = Metrics.perRow(cases.toDF("p", "l"), col("p"), col("l")).collect()
    rows.foreach { r =>
      val (p, rc, f1, mrr) = (r.getAs[Double]("precision"), r.getAs[Double]("recall"),
        r.getAs[Double]("f1"), r.getAs[Double]("mrr"))
      assert(f1 <= math.min(2 * p, 2 * rc) + 1e-12)       // harmonic ≤ 2·min
      assert(f1 >= 0 && f1 <= 1 && mrr >= 0 && mrr <= 1)
      assert(r.getAs[Double]("hit_1") <= r.getAs[Double]("hit_5"))
    }
  }

  test("macroAvg averages per-question metrics") {
    val df = Seq(
      (Seq(1L), Seq(1L)),      // precision 1
      (Seq(2L), Seq(9L)))      // precision 0
      .toDF("p", "l")
    val r = Metrics.macroAvg(df, col("p"), col("l")).collect().head
    assert(r.getAs[Long]("n_questions") === 2L)
    assert(r.getAs[Double]("avg_precision") === 0.5)
  }

  test("bootstrap CI brackets the point estimate; degenerate set collapses") {
    // mixed question set: CI must contain the mean and be a proper order
    val rnd = new scala.util.Random(3)
    val df = (1L to 40L).map { i =>
      val hit = rnd.nextInt(3) // 0, 1 or 2 of the 2 labels retrieved
      (i, Seq(100L, 200L, 300L, 400L).take(2 + hit),
        Seq(300L, 400L))
    }.toDF("qid", "p", "l")
    val r = Metrics.bootstrapCi(df, col("qid"), col("p"), col("l"), b = 64)
      .collect().head
    val (mean, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(lo <= mean && mean <= hi, s"CI [$lo,$hi] must bracket $mean")
    assert(lo < hi, "a mixed question set has sampling spread")
    assert(r.getLong(0) === 40L)
    // identical questions → every resample identical → CI width zero
    val same = (1L to 12L).map(i => (i, Seq(1L, 2L), Seq(2L, 9L)))
      .toDF("qid", "p", "l")
    val s = Metrics.bootstrapCi(same, col("qid"), col("p"), col("l"), b = 64)
      .collect().head
    assert(s.getLong(2) === s.getLong(3))
    assert(s.getLong(2) === s.getLong(1)) // = the point estimate (500000)
    assert(s.getLong(1) === 500000L)
    // deterministic end to end
    val again = Metrics.bootstrapCi(df, col("qid"), col("p"), col("l"), b = 64)
      .collect().head
    assert(again.toSeq === r.toSeq)
    // EMPTY question set: still exactly one (all-zero) summary row — not
    // zero rows, not a divide-by-zero
    val e = Metrics.bootstrapCi(df.where(col("qid") < 0L),
      col("qid"), col("p"), col("l"), b = 64).collect()
    assert(e.length === 1)
    assert(e.head.toSeq === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }
}
