package graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Algebraic simplification for the graft expression family, injected as
  * an optimizer `Rule[LogicalPlan]` via [[GraftExtensions]] — the Rule
  * rung of the custom-operator ladder beside the codegen'd Expressions
  * and the AsOfJoin plan/strategy/exec.
  *
  * NFC normalization is idempotent (Unicode guarantees NFC(NFC(s)) =
  * NFC(s), nulls propagate identically), so nested normalizations
  * collapse to one. The nesting arises naturally in layered pipelines:
  * a caller defensively normalizes a column that a view or stored
  * projection already normalized — without the rule every row pays the
  * second normalization pass; with it the inner call is the whole plan. */
object GraftOptimizations extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case graft.expr.NormalizeNFC(inner @ graft.expr.NormalizeNFC(_)) =>
        inner
    }
}
