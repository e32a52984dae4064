package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col

/** RELY-constraint registry: referential integrity VALIDATED FROM DATA
  * (the q407 audit — fk total: no nulls; no orphans; pk unique), then
  * registered so the optimizer can consume it. Spark has no constraint
  * catalog; warehouses eliminate PK-FK joins only because a RELY
  * constraint vouches for the data — this object is that catalog. A
  * constraint is keyed by column names but carries the CANONICALIZED
  * LEAF PLAN of the validated dim, so the rule can only fire against
  * the exact relation the audit saw — a same-named column over a
  * different table, a cached/checkpointed SUBSET of the dim (which
  * collapses to a leaf and would defeat a plan-shape Filter check), or
  * another scale factor's copy all fail the source comparison.
  */
object RiConstraints {
  private val validated =
    new java.util.concurrent.ConcurrentHashMap[(String, String), LogicalPlan]()

  /** Run the audit and register the (fk, pk) pair on success: every fact
    * fk is non-null, matches exactly one dim pk (no orphans — counted
    * over non-null keys on both sides, the q407/q412 convention), and
    * the pk is unique. The dim must be a single base relation (one leaf
    * plan) — that leaf, canonicalized, IS the registered constraint
    * source the rule later matches against.
    */
  def validate(fact: DataFrame, dim: DataFrame, fk: String, pk: String): Boolean = {
    val nulls = fact.where(col(fk).isNull).count()
    val orphans = fact.select(col(fk)).where(col(fk).isNotNull)
      .join(dim.select(col(pk)).where(col(pk).isNotNull),
        col(fk) === col(pk), "left_anti").count()
    val dups = dim.groupBy(col(pk)).count()
      .where(col("count") > 1).count()
    val leaves = dim.queryExecution.analyzed.collect { case l: LeafNode => l }
    val ok = nulls == 0 && orphans == 0 && dups == 0 && leaves.size == 1
    if (ok) validated.put((fk.toLowerCase, pk.toLowerCase), leaves.head.canonicalized)
    ok
  }

  def isValidated(fk: String, pk: String): Boolean =
    validated.containsKey((fk.toLowerCase, pk.toLowerCase))

  /** The canonicalized leaf the constraint was validated against. */
  def validatedSource(fk: String, pk: String): Option[LogicalPlan] =
    Option(validated.get((fk.toLowerCase, pk.toLowerCase)))

  def clear(): Unit = validated.clear()
}

/** INNER PK-FK join elimination under a validated RELY constraint — the
  * class Spark's own optimizer cannot reach. Spark 4's
  * EliminateOuterJoin already drops a LEFT OUTER join whose right side
  * is distinct-keyed and unreferenced (plan shape alone proves row
  * preservation); the INNER case additionally needs a DATA property —
  * every fact row matches exactly one dim row — which no plan shape can
  * prove. RiConstraints holds that proof (validated by the q407 audit),
  * and this rule consumes it: an inner equi-join to a bare dim-key
  * subtree over the VALIDATED relation, none of whose columns are
  * referenced above the join, is replaced by the left side under an
  * IsNotNull(fk) filter — scan, shuffle and build all dropped.
  *
  * Soundness guards, each one a certified refusal in RewritePlanSpec:
  *  - the right subtree must be a bare key (Project of the single key
  *    column, optionally under the distinct-Aggregate, tolerating only
  *    the optimizer's own inferred IsNotNull(key)) whose LEAF
  *    canonicalizes to the registered constraint source — a Filter in
  *    between, a checkpointed subset (a DIFFERENT leaf), or a
  *    same-named column over another table all refuse;
  *  - the rewrite keeps IsNotNull(fk) on the left: the inner join
  *    drops null-fk rows, and although the VALIDATED table has none,
  *    the left side here may be any derived plan (e.g. null-extended
  *    by an upstream outer join) — the explicit filter makes the
  *    rewrite an identity regardless, and the optimizer prunes it
  *    wherever constraints prove it redundant.
  */
object FkJoinEliminationRule extends Rule[LogicalPlan] {

  /** The right child is a bare single-key subtree whose leaf IS the
    * validated source: Project(Seq(key), leaf) — column pruning's
    * canonical form of `dim.select(pk)` — optionally wrapped in the
    * distinct Aggregate and/or the optimizer's own inferred
    * null-safety filter on the key. Any other shape refuses.
    */
  private def bareKey(plan: LogicalPlan, key: AttributeReference,
      source: LogicalPlan): Boolean =
    plan match {
      case Aggregate(Seq(g: AttributeReference), Seq(a: AttributeReference), child, _)
          if g.exprId == key.exprId && a.exprId == key.exprId =>
        bareKey(child, key, source)
      case Project(Seq(a: AttributeReference), child) if a.exprId == key.exprId =>
        bareKey(child, key, source)
      case Filter(IsNotNull(a: AttributeReference), child) if a.exprId == key.exprId =>
        bareKey(child, key, source)
      case leaf: LeafNode =>
        leaf.output.exists(_.exprId == key.exprId) && leaf.canonicalized == source
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(_, Join(left, right, Inner, Some(EqualTo(a: AttributeReference, b: AttributeReference)), _))
        if p.references.subsetOf(left.outputSet) =>
      val oriented =
        if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
        else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
        else None
      oriented match {
        case Some((fk, pk)) =>
          RiConstraints.validatedSource(fk.name, pk.name) match {
            case Some(src) if bareKey(right, pk, src) =>
              // IsNotNull(fk) preserves inner-join semantics even when
              // the LEFT side is a derived plan carrying nulls the
              // validated fact table never had
              p.copy(child = Filter(IsNotNull(fk), left))
            case _ => p
          }
        case None => p
      }
  }
}
