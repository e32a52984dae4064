package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Materialized-view catalog: a registered view is a grain aggregate
  * (GROUP BY `dims` with COUNT(*) and per-measure SUM partials) over a
  * single base relation, VALIDATED FROM DATA at registration — the
  * recomputed grain and the offered view must match exactly in both
  * set-difference directions, the ANALYZE-grade price paid once. Spark
  * has no MV catalog; warehouses answer coarser aggregates from a
  * finer view only because a catalog vouches that the view IS the
  * grain — this object is that catalog, the q417/q418/q419 arc's
  * optimizer half (the RiConstraints pattern one floor up: there a
  * data proof deletes a join, here it re-roots an Aggregate).
  *
  * Both the base and the view must be single-leaf plans (caller
  * checkpoints them): the base leaf, canonicalized, keys the catalog —
  * the rule only fires on the exact relation the validation saw — and
  * the view leaf must be a [[MultiInstanceRelation]] so every rewrite
  * splices a fresh-exprId instance (two rewrites in one query must not
  * collide attributes).
  */
object MvCatalog {
  final case class Mv(
      source: LogicalPlan,
      viewLeaf: LeafNode,
      dims: Seq[String],
      cntCol: String,
      sumCols: Map[String, String])

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, Mv]()

  /** Validate `view` as the exact (dims, COUNT(*), SUM(measures)) grain
    * of `base` and register it. `sumCols` maps each base measure column
    * to the view column holding its per-group SUM partial. Refuses
    * (returns false) when either side is not a single-leaf plan, a
    * named column is missing, or the recomputed grain differs from the
    * offered view in either direction.
    */
  def register(base: DataFrame, view: DataFrame, dims: Seq[String],
      cntCol: String, sumCols: Map[String, String]): Boolean = {
    val baseLeaves = base.queryExecution.analyzed.collect { case l: LeafNode => l }
    val viewLeaves = view.queryExecution.analyzed.collect { case l: LeafNode => l }
    val shapesOk = baseLeaves.size == 1 && viewLeaves.size == 1 &&
      view.queryExecution.analyzed.isInstanceOf[LeafNode] &&
      viewLeaves.head.isInstanceOf[MultiInstanceRelation] &&
      dims.forall(d => base.columns.contains(d)) &&
      sumCols.forall { case (m, v) => base.columns.contains(m) && view.columns.contains(v) } &&
      view.columns.contains(cntCol) && dims.forall(view.columns.contains)
    if (!shapesOk) return false
    val aggs = count(lit(1)).cast("long").as(cntCol) +:
      sumCols.toSeq.sortBy(_._1).map { case (m, v) => sum(col(m)).as(v) }
    val grain = base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val offered = view.select((dims ++ Seq(cntCol) ++ sumCols.toSeq.sortBy(_._1).map(_._2)).map(col): _*)
    val recomputed = grain.select(offered.columns.toIndexedSeq.map(col): _*)
    val ok = recomputed.exceptAll(offered).isEmpty && offered.exceptAll(recomputed).isEmpty
    if (ok) registered.put(baseLeaves.head.canonicalized,
      Mv(baseLeaves.head.canonicalized, viewLeaves.head.asInstanceOf[LeafNode],
        dims.map(_.toLowerCase), cntCol.toLowerCase,
        sumCols.map { case (m, v) => m.toLowerCase -> v.toLowerCase }))
    ok
  }

  def lookup(leaf: LogicalPlan): Option[Mv] = Option(registered.get(leaf.canonicalized))

  def clear(): Unit = registered.clear()
}

/** Aggregate re-rooting onto a registered materialized view — the
  * classic MV-subsumption rewrite Spark itself cannot perform for the
  * same reason as the inner PK-FK elimination: it needs a DATA proof
  * (the view IS the grain) that no plan shape carries. An
  * `Aggregate(g, a, base)` whose groupings are dim columns, whose
  * aggregates are decomposable over the grain (COUNT(*) → SUM(cnt),
  * SUM(m) → SUM(sum_m), MIN/MAX over a dim column → themselves), and
  * whose filters (if any) reference only dim columns, is answered from
  * the view's `|grain|` rows instead of the base's n — at 100 TB the
  * difference between a footer-sized scan and the corpus.
  *
  * Soundness guards, each a certified refusal in MvRewriteSpec:
  *  - the subtree below the Aggregate must be the REGISTERED leaf
  *    (canonicalized match), optionally under pruning Projects of bare
  *    attributes and Filters whose references are all dim columns — a
  *    filter on a non-dim column (the grain already folded it away),
  *    a grouping on a non-dim column, or a same-shaped but unregistered
  *    relation all refuse;
  *  - only decomposable aggregates rewrite: DISTINCT aggregates,
  *    FILTER-clause aggregates, AVG, and MIN/MAX over a measure refuse;
  *  - every rewritten output keeps the original name, exprId, AND
  *    dataType (a type-widening rewrite would corrupt the parent plan —
  *    checked expression by expression, not assumed);
  *  - the spliced view is a fresh [[MultiInstanceRelation]] instance
  *    per rewrite, so repeated matches in one plan cannot alias.
  */
object MvRewriteRule extends Rule[LogicalPlan] {

  /** Unwrap pruning Projects / dim-only Filters down to the registered
    * leaf; returns the conjunct filter predicates (in original order)
    * iff every step is legal.
    */
  private def unwrap(plan: LogicalPlan, preds: Seq[Expression]):
      Option[(LeafNode, Seq[Expression], MvCatalog.Mv)] =
    plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child, preds)
      case Filter(cond, child) =>
        unwrap(child, preds :+ cond)
      case leaf: LeafNode =>
        MvCatalog.lookup(leaf) match {
          case Some(mv)
              if preds.forall(p => p.deterministic && !p.containsPattern(
                  org.apache.spark.sql.catalyst.trees.TreePattern.PLAN_EXPRESSION) &&
                p.references.forall(a => mv.dims.contains(a.name.toLowerCase))) =>
            Some((leaf, preds, mv))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      unwrap(child, Nil) match {
        case Some((_, preds, mv))
            if groupings.forall {
              case a: AttributeReference => mv.dims.contains(a.name.toLowerCase)
              case _ => false
            } =>
          rewrite(agg, groupings, aggExprs, preds, mv).getOrElse(agg)
        case _ => agg
      }
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], preds: Seq[Expression],
      mv: MvCatalog.Mv): Option[LogicalPlan] = {
    val fresh = mv.viewLeaf.asInstanceOf[MultiInstanceRelation].newInstance()
      .asInstanceOf[LeafNode]
    def viewAttr(name: String): Attribute =
      fresh.output.find(_.name.equalsIgnoreCase(name)).get
    def dimAttr(baseName: String): Option[Attribute] =
      if (mv.dims.contains(baseName.toLowerCase)) Some(viewAttr(baseName)) else None

    // each output expression must rewrite exactly — name, exprId and
    // dataType preserved — or the whole match refuses
    def rewriteAgg(ae: AggregateExpression): Option[Expression] =
      ae match {
        case AggregateExpression(_, _, true, _, _) => None // DISTINCT
        case AggregateExpression(_, _, _, Some(_), _) => None // FILTER clause
        case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
          Some(Sum(viewAttr(mv.cntCol)).toAggregateExpression())
        case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _)
            if mv.sumCols.contains(a.name.toLowerCase) =>
          Some(Sum(viewAttr(mv.sumCols(a.name.toLowerCase))).toAggregateExpression())
        case AggregateExpression(Min(a: AttributeReference), _, false, None, _) =>
          dimAttr(a.name).map(v => Min(v).toAggregateExpression())
        case AggregateExpression(Max(a: AttributeReference), _, false, None, _) =>
          dimAttr(a.name).map(v => Max(v).toAggregateExpression())
        case _ => None
      }

    val rewritten: Seq[Option[NamedExpression]] = aggExprs.map {
      case a: AttributeReference =>
        dimAttr(a.name).collect {
          case v if v.dataType == a.dataType => Alias(v, a.name)(exprId = a.exprId)
        }
      case al @ Alias(ae: AggregateExpression, name) =>
        rewriteAgg(ae).collect {
          case e if e.dataType == al.dataType => Alias(e, name)(exprId = al.exprId)
        }
      case al @ Alias(a: AttributeReference, name) =>
        dimAttr(a.name).collect {
          case v if v.dataType == al.dataType => Alias(v, name)(exprId = al.exprId)
        }
      case _ => None
    }
    val newGroupings: Seq[Option[Expression]] = groupings.map {
      case a: AttributeReference => dimAttr(a.name).map(identity[Expression])
      case _ => None
    }
    if (rewritten.exists(_.isEmpty) || newGroupings.exists(_.isEmpty)) None
    else {
      val byName = preds.map(_.transform {
        case a: AttributeReference => viewAttr(a.name)
      })
      val scan: LogicalPlan =
        byName.foldRight(fresh: LogicalPlan)((p, c) => Filter(p, c))
      Some(agg.copy(groupingExpressions = newGroupings.map(_.get),
        aggregateExpressions = rewritten.map(_.get), child = scan))
    }
  }
}
