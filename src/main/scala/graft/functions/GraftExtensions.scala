package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: makes the engine's native expressions
  * first-class SQL functions in any session built with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * or `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * library-grade alternative to per-session `register(...)` calls
  * (which remain for ad-hoc sessions; both are idempotent).
  *
  * Injects all three extension layers of the build brief: the expression
  * registry (b — cosine_sim), an optimizer rule (CosineSymmetryRule), and
  * a planner strategy (c — the TopKPerGroup whole-operator plan node;
  * `TopKOps.ensureStrategy` is the equivalent for ad-hoc sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.CosineSymmetryRule)
    ext.injectOptimizerRule(_ => graft.plans.FkJoinEliminationRule)
    ext.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
