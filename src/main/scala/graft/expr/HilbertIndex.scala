package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 2-D Hilbert-curve index: maps a (x, y) cell of the
  * 2^bits × 2^bits grid to its distance along the Hilbert space-filling
  * curve (Wikipedia's iterative xy2d: per-level quadrant code
  * (3·rx) xor ry, then the reflect-and-swap quadrant rotation). Unlike
  * the Morton/Z-order interleave ([[graft.sources.Layout.mortonKey]]),
  * the Hilbert curve is CONTINUOUS — consecutive keys are always
  * grid-adjacent, so file min/max envelopes along the curve are tighter
  * for the same data, the reason lakehouse OPTIMIZE implementations offer
  * it next to Z-order.
  *
  * A native expression rather than a composed Column because the per-level
  * rotation mutates (x, y): a Column formulation either nests 15 levels of
  * self-referencing CASE trees (exponential analyzed-plan blowup) or folds
  * through a non-codegen lambda. Here it is one fused integer loop in both
  * interpreted and generated code. Inputs are masked to the low `bits`
  * bits; callers scale real columns into the grid first.
  */
final case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex.xy2d(bits, xv.asInstanceOf[Long], yv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val n = 1L << bits
      s"""
         |long $x = $xv & ${n - 1}L;
         |long $y = $yv & ${n - 1}L;
         |long $d = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $rx = ($x >> $i) & 1L;
         |  long $ry = ($y >> $i) & 1L;
         |  $d += ((3L * $rx) ^ $ry) << (2 * $i);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n - 1}L - $x; $y = ${n - 1}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Scalar xy2d — the single source of truth the interpreted path uses
    * and the generated loop mirrors. */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += ((3L * rx) ^ ry) << (2 * i)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }
}
