package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]`; custom codegen'd expressions (graft.expr.*) still need
  * them, so this is the one (tiny, documented) reach into Spark's package —
  * same technique Spark connector libraries use. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder into an EXISTING session's registry
    * (for fresh sessions, prefer `spark.sql.extensions=graft.GraftExtensions`
    * — the public extension point). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       clazz: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(clazz, name),
      builder)
}
