package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd BPE-ish token estimate over a word array: Σ (1 + ⌊chars/4⌋)
  * — the deterministic default budget tokenizer (SURVEY §2.10; the
  * reference's is a pluggable HF tokenizer, retrieval/retriever.py:67-69).
  * Replaces the `aggregate(words, …)` higher-order formulation, which is
  * CodegenFallback and interpreted per row on every corpus-wide token
  * count and every T3 budget marginal.
  *
  * Char counts (not bytes) — matches `length()` and the DuckDB oracle's
  * `length()`. Null array → null; null elements contribute 0 (the HOF's
  * null-propagating `+` would null the whole sum, but word arrays from
  * `split` never contain nulls).
  */
final case class TokenEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_token_estimate"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var tok = 0L; var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) tok += 1L + a.getUTF8String(i).numChars() / 4
      i += 1
    }
    tok
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val tok = ctx.freshName("tok")
      s"""
         |int $n = $a.numElements();
         |long $tok = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) $tok += 1L + $a.getUTF8String($i).numChars() / 4;
         |}
         |${ev.value} = $tok;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenEstimate =
    copy(child = newChild)
}
