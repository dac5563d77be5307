package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IR metric suite (SURVEY §2.5 A5; reference compute_metrics.py:3-64):
  * per-question precision / recall / F1 / hit@k / recall@k / MRR over
  * predicted vs gold id lists, macro-averaged. Pure array built-ins — one
  * narrow map over the rows, one tiny final aggregate.
  */
object Metrics {

  /** Per-row metric columns. `preds` is ranked (best first); `labels` gold.
    * Semantics match compute_metrics.py: precision/recall over the *set*
    * intersection; empty preds → precision 0; MRR = 1/rank of the first
    * gold item in preds, 0 if absent; hit@k = any gold in first k;
    * recall@k over first k. */
  def perRow(df: DataFrame, preds: Column, labels: Column,
             hitKs: Seq[Int] = Seq(1, 5), recallKs: Seq[Int] = Seq(20)): DataFrame = {
    val p = array_distinct(preds)
    val l = array_distinct(labels)
    val inter = size(array_intersect(p, l)).cast("double")
    val np = size(p).cast("double")
    val nl = size(l).cast("double")
    val precision = when(np > 0, inter / np).otherwise(lit(0.0))
    val recall = when(nl > 0, inter / nl).otherwise(lit(0.0))
    val f1 = when(precision + recall > 0,
      lit(2.0) * precision * recall / (precision + recall)).otherwise(lit(0.0))
    // first position (1-based) of any gold item in preds; 0 if none
    val positions = filter(transform(p, x => when(array_contains(l, x),
      array_position(p, x)).otherwise(lit(null))), x => x.isNotNull)
    val mrr = when(size(positions) > 0,
      lit(1.0) / array_min(positions).cast("double")).otherwise(lit(0.0))
    val hitCols = hitKs.map(k =>
      when(size(array_intersect(slice(p, 1, k), l)) > 0, lit(1.0)).otherwise(lit(0.0))
        .as(s"hit_$k"))
    val recallCols = recallKs.map(k =>
      when(nl > 0, size(array_intersect(slice(p, 1, k), l)).cast("double") / nl)
        .otherwise(lit(0.0)).as(s"recall_$k"))
    df.select(Seq(
      precision.as("precision"), recall.as("recall"), f1.as("f1"),
      mrr.as("mrr"), np.as("num_preds")) ++ hitCols ++ recallCols: _*)
  }

  /** Macro-averaged suite (compute_metrics.py:3-29 averages per-question). */
  def macroAvg(df: DataFrame, preds: Column, labels: Column,
               hitKs: Seq[Int] = Seq(1, 5), recallKs: Seq[Int] = Seq(20)): DataFrame = {
    val rows = perRow(df, preds, labels, hitKs, recallKs)
    val metricCols = Seq("precision", "recall", "f1", "mrr", "num_preds") ++
      hitKs.map(k => s"hit_$k") ++ recallKs.map(k => s"recall_$k")
    rows.agg(
      count(lit(1)).as("n_questions"),
      metricCols.map(m => round(avg(col(m)), 6).as(s"avg_$m")): _*)
  }
}
