package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the engine's codegen'd expressions available to plain `spark.sql`
  * (SQL users get `graft_cosine` / `graft_nfc` without touching the Scala
  * API). [[graft.functions.registerAll]] does the same for an
  * already-constructed session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[graft.expr.CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expr.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[graft.expr.NormalizeNFC].getName, "graft_nfc"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expr.NormalizeNFC(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_token_estimate"),
      new ExpressionInfo(classOf[graft.expr.TokenEstimate].getName, "graft_token_estimate"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expr.TokenEstimate(children.head)))
    // the whole-operator extension: plans AsOfJoinNode as the native
    // sort-merge AsOfJoinExec (graft.plans.AsOfJoin also self-registers
    // through SparkSession.experimental for pre-built sessions)
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftbridge.AsOfJoinStrategy)
    // algebraic simplification of the graft expressions (NFC idempotence)
    ext.injectOptimizerRule(_ => GraftOptimizations)
  }
}
