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
  * constraint vouches for the data — this object is that catalog,
  * name-scoped the way the corpus schema is (TPC-H key column names are
  * globally unique).
  */
object RiConstraints {
  private val validated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Run the audit and register the (fk, pk) pair on success: every fact
    * fk is non-null, matches exactly one dim pk (no orphans), and the pk
    * is unique. Exactly the gate q407 prices — here it gates the RULE.
    */
  def validate(fact: DataFrame, dim: DataFrame, fk: String, pk: String): Boolean = {
    val nulls = fact.where(col(fk).isNull).count()
    val orphans = fact.select(col(fk))
      .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti").count()
    val dups = dim.groupBy(col(pk)).count()
      .where(col("count") > 1).count()
    val ok = nulls == 0 && orphans == 0 && dups == 0
    if (ok) validated.add((fk.toLowerCase, pk.toLowerCase))
    ok
  }

  def isValidated(fk: String, pk: String): Boolean =
    validated.contains((fk.toLowerCase, pk.toLowerCase))

  def clear(): Unit = validated.clear()
}

/** INNER PK-FK join elimination under a validated RELY constraint — the
  * class Spark's own optimizer cannot reach. Spark 4's
  * EliminateOuterJoin already drops a LEFT OUTER join whose right side
  * is distinct-keyed and unreferenced (plan shape alone proves row
  * preservation); the INNER case additionally needs a DATA property —
  * every fact row matches exactly one dim row — which no plan shape can
  * prove. RiConstraints holds that proof (validated by the q407 audit),
  * and this rule consumes it: an inner equi-join to a bare unfiltered
  * dim-key subtree, none of whose columns are referenced above the
  * join, is dropped entirely — scan, shuffle and build — when the
  * (fk, pk) pair is validated.
  *
  * Soundness guards: the right subtree must be exactly a bare key over
  * a LEAF relation (a Project of the single key column, optionally
  * under the distinct-Aggregate) — any Filter in between means the join
  * is against a SUBSET of the validated dim and elimination would be
  * wrong; the rule refuses. RewritePlanSpec drives the rule through
  * `spark.experimental.extraOptimizations` and certifies the plan (no
  * Join remains), the unchanged results, and the refusal on all the
  * unsafe shapes (right column referenced, filtered dim, unvalidated
  * pair); it also pins the built-in EliminateOuterJoin behavior that
  * makes the outer case not ours to ship.
  */
object FkJoinEliminationRule extends Rule[LogicalPlan] {

  /** The right child is a bare single-key subtree over a leaf relation:
    * Project(Seq(key), leaf) — column pruning's canonical form of
    * `dim.select(pk)` — optionally wrapped in the distinct Aggregate.
    * A Filter anywhere in the subtree fails the match (the constraint
    * was validated against the WHOLE dim).
    */
  private def bareKey(plan: LogicalPlan, key: AttributeReference): Boolean =
    plan match {
      case Aggregate(Seq(g: AttributeReference), Seq(a: AttributeReference), child, _)
          if g.exprId == key.exprId && a.exprId == key.exprId =>
        bareKey(child, key)
      case Project(Seq(a: AttributeReference), child) if a.exprId == key.exprId =>
        bareKey(child, key)
      // the optimizer's own inferred null-safety filter on the KEY is a
      // provable no-op under the validated constraint (every fact fk is
      // non-null and matches a non-null pk); any OTHER filter refuses
      case Filter(IsNotNull(a: AttributeReference), child) if a.exprId == key.exprId =>
        bareKey(child, key)
      case leaf: LeafNode => leaf.output.exists(_.exprId == key.exprId)
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
        case Some((fk, pk))
            if RiConstraints.isValidated(fk.name, pk.name) && bareKey(right, pk) =>
          p.copy(child = left)
        case _ => p
      }
  }
}
