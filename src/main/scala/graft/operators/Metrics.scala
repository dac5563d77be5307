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

  /** Deterministic bootstrap confidence intervals for the macro
    * precision/recall — the eval-rigor companion to [[macroAvg]]: a point
    * estimate alone cannot say whether a retrieval change is signal or
    * question-sampling noise. `b` resamples of the question set are drawn
    * WITH replacement from the portable md5 hash (seeded per (resample,
    * draw) — the derandomized-bootstrap trick, so both engines draw the
    * identical resamples), each resample's mean recomputes over its drawn
    * questions, and the CI is the [⌊0.05b⌋+1, ⌈0.95b⌉] order statistics
    * of the `b` means. Per-question metrics are integer micro-units
    * (truncating division) and resample means are integer sums div n, so
    * every value — point, low, high — is hash-exact cross-engine; the
    * float-sum ordering problem of a naive bootstrap never arises.
    *
    * Scale shape: the per-question table is the eval set (always modest —
    * bootstrap is an eval-side tool); draws are b·n rows through one
    * equi-join on the question index and one map-side-combinable per-b
    * aggregate. The single-partition index window is over the eval set
    * only, never corpus data. */
  def bootstrapCi(df: DataFrame, qid: Column, preds: Column, labels: Column,
                  b: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = array_distinct(preds)
    val l = array_distinct(labels)
    val per = df.select(qid.as("qid"),
        size(array_intersect(p, l)).cast("long").as("inter"),
        size(p).cast("long").as("np"), size(l).cast("long").as("nl"))
      .select(col("qid"),
        expr("CASE WHEN np > 0 THEN (inter * 1000000) div np ELSE 0 END")
          .as("prec_micro"),
        expr("CASE WHEN nl > 0 THEN (inter * 1000000) div nl ELSE 0 END")
          .as("rec_micro"))
      .withColumn("rn",
        row_number().over(Window.orderBy("qid")).cast("long") - 1)
      .localCheckpoint(true)
    val nf = per.agg(count(lit(1)).as("n"))
    val bs = spark.range(b).select(col("id").as("b"))
    val draws = per.select(col("rn").as("j")).crossJoin(broadcast(bs))
      .select(col("b"), expr(
        "cast(substr(concat(regexp_replace(md5(concat('bs|', " +
          "cast(b as string), '|', cast(j as string))), '[a-f]', ''), " +
          "'000000'), 1, 6) as bigint)").as("u"))
      .crossJoin(broadcast(nf))
      .select(col("b"), expr("(u * n) div 1000000").as("idx"))
    val res = draws
      .join(per.select(col("rn").as("idx"), col("prec_micro"), col("rec_micro")), "idx")
      .groupBy("b")
      .agg(sum("prec_micro").as("sp"), sum("rec_micro").as("sr"))
      .crossJoin(broadcast(nf))
      .select(col("b"), expr("sp div n").as("mp"), expr("sr div n").as("mr"))
    val loRank = b * 5 / 100 + 1
    val hiRank = (b * 95 + 99) / 100
    def stat(c: String, rank: Int, out: String): DataFrame =
      res.withColumn("r", row_number().over(Window.orderBy(col(c), col("b"))))
        .where(col("r") === rank).select(col(c).as(out))
    val point = per.agg(count(lit(1)).as("n_questions"),
      sum("prec_micro").as("tp"), sum("rec_micro").as("tr"))
      .select(col("n_questions"),
        expr("tp div n_questions").as("mean_prec_micro"),
        expr("tr div n_questions").as("mean_rec_micro"))
    point
      .crossJoin(broadcast(stat("mp", loRank, "lo_prec_micro")))
      .crossJoin(broadcast(stat("mp", hiRank, "hi_prec_micro")))
      .crossJoin(broadcast(stat("mr", loRank, "lo_rec_micro")))
      .crossJoin(broadcast(stat("mr", hiRank, "hi_rec_micro")))
      .select(col("n_questions"), col("mean_prec_micro"),
        col("lo_prec_micro"), col("hi_prec_micro"),
        col("mean_rec_micro"), col("lo_rec_micro"), col("hi_rec_micro"))
  }
}
