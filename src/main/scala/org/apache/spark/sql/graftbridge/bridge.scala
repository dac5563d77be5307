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
}
