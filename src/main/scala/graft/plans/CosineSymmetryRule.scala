package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: canonicalize the argument order of the symmetric
  * `cosine_sim(a, b)` by the children's canonicalized hash. Cosine is
  * exactly symmetric at the bit level (element products and the two
  * norm factors commute), so the swap is semantics-preserving — and once
  * both spellings normalize to one form, Catalyst's common-subexpression
  * elimination and plan-level dedup can collapse `cosine_sim(a, b)`
  * with `cosine_sim(b, a)` instead of computing both.
  *
  * Injected by [[graft.functions.GraftExtensions]] — the engine's one
  * custom `Rule[LogicalPlan]`; every other §2 operator is served by
  * Catalyst's built-ins (SURVEY.md §4).
  */
object CosineSymmetryRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ CosineSimilarity(l, r)
          if l.canonicalized.hashCode() > r.canonicalized.hashCode() =>
        CosineSimilarity(r, l)
      case c => c
    }
}
