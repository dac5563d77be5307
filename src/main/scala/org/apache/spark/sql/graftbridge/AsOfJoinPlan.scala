package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** A whole-operator Catalyst extension — the (c) rung of the build plan's
  * custom-operator ladder (compose > Expression > LogicalPlan+Strategy+
  * SparkPlan > mapPartitions): a NATIVE sort-merge as-of join, the
  * operator Spark itself lacks (its own pandas layer, like
  * [[graft.operators.Joins.asofJoin]], simulates as-of with union+window).
  *
  * The physical node declares `ClusteredDistribution` on the key for both
  * children and `(key, ts)` ascending child orderings, so EnsureRequirements
  * provisions the SAME co-partitioned shuffle + sort a SortMergeJoin gets —
  * at 100 TB the operator inherits all of Spark's shuffle machinery (AQE
  * coalescing included) and the merge itself is a single streaming pass
  * per partition holding ONE buffered right row and ONE last-match row:
  * O(1) memory regardless of key history, where the union+window
  * formulation materializes a sort frame.
  *
  * Semantics (the [[graft.operators.Joins.asofJoin]] contract, equal to
  * DuckDB's native ASOF JOIN on a pre-deduped right side): every left row
  * picks the right row of the same key with the greatest ts AT OR BEFORE
  * its own; no match → nulls. Key and ts must be int64 (the engine's
  * id/epoch-micros shape); null keys/timestamps never match.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        rightValues: Seq[Attribute]) extends BinaryNode {
  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTs.dataType == LongType && rightTs.dataType == LongType,
    "as-of key/ts must be int64")
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        rightValues: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val rvAttrs = rightValues
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkB = BindReferences.bindReference(leftKey: Expression, lOut)
      val ltB = BindReferences.bindReference(leftTs: Expression, lOut)
      val rkB = BindReferences.bindReference(rightKey: Expression, rOut)
      val rtB = BindReferences.bindReference(rightTs: Expression, rOut)
      val rvProj = UnsafeProjection.create(rvAttrs.map(a => a: Expression), rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression), outAttrs)
      val nullRow = new GenericInternalRow(rvAttrs.length)
      val joined = new JoinedRow

      // one-row lookahead over the right side; the value projection is
      // copied because shuffle iterators reuse row objects
      var has = false
      var nextKey = 0L
      var nextTs = 0L
      var nextVal: UnsafeRow = null
      def pull(): Unit = {
        has = false
        while (!has && rIter.hasNext) {
          val r = rIter.next()
          val kv = rkB.eval(r)
          val tv = rtB.eval(r)
          if (kv != null && tv != null) {
            nextKey = kv.asInstanceOf[Long]
            nextTs = tv.asInstanceOf[Long]
            nextVal = rvProj(r).copy()
            has = true
          }
        }
      }
      pull()

      var lastKey = 0L
      var hasLast = false
      var lastVal: UnsafeRow = null

      lIter.map { l =>
        val kv = lkB.eval(l)
        val tv = ltB.eval(l)
        if (kv == null || tv == null) {
          resultProj(joined(l, nullRow))
        } else {
          val k = kv.asInstanceOf[Long]
          val t = tv.asInstanceOf[Long]
          while (has && (nextKey < k || (nextKey == k && nextTs <= t))) {
            lastKey = nextKey
            lastVal = nextVal
            hasLast = true
            pull()
          }
          if (hasLast && lastKey == k) resultProj(joined(l, lastVal))
          else resultProj(joined(l, nullRow))
        }
      }
    }
  }
}

/** Session plumbing + plan construction for the custom operator (the
  * same documented package-reach as [[bridge]]: Dataset.ofRows and the
  * planner-strategy registry are `private[sql]`). */
object AsOfJoinSupport {
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
           values: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias every right column to a FRESH exprId: when both sides
    // derive from the same base relation they share attribute ids, and
    // the analyzer's relation dedup would re-number the right subtree
    // underneath us, leaving the node's captured right attributes
    // dangling (they would silently bind to the LEFT child)
    val rPlan = right.select(right.columns.toSeq.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, ts), attr(rPlan, ts),
      values.map(attr(rPlan, _)))
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
