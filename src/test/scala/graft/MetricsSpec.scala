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
}
