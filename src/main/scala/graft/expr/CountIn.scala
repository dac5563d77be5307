package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd "how many array elements are in this literal set" — the
  * stopword-hit primitive behind language ID and quality scoring (SURVEY
  * §2.8). The `size(filter(arr, x => x.isin(...)))` formulation is
  * CodegenFallback: one interpreted lambda pass per language per row, which
  * multiplies into the dominant cost of every corpus-wide text scan. This
  * native expression is a single fused loop over the array against a
  * prebuilt hash set.
  *
  * Semantics match the HOF form: null array → null; null elements never
  * match; duplicates count once per occurrence.
  */
final case class CountIn(child: Expression, needles: Seq[String])
  extends UnaryExpression {

  @transient private lazy val needleSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](needles.size * 2)
    needles.foreach(n => s.add(UTF8String.fromString(n)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_count_in"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0; var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && needleSet.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("needleSet", needleSet,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}
