package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression (SURVEY
  * §2.10; reference: Cypher `normalize()`, retrieval/ner.py:111-114 —
  * DuckDB oracle: `nfc_normalize`). Replaces the Scala UDF on the lookup
  * path: stays inside whole-stage codegen, no SerDe row boundary.
  */
final case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNFC.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.NormalizeNFC.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}

object NormalizeNFC {
  /** Static helper shared by interpreted and generated code paths. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: ASCII (or already-composed) strings need no work
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
