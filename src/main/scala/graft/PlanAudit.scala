package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan-regression audit for the bench-heaviest queries (VERDICT r6 ask
  * #3): the shape suite (PlanShapeSpec) pins hygiene across ALL plans —
  * no cartesian, no Python UDF — but a strategy FLIP on a heavy query
  * (a broadcast falling back to sort-merge, an extra exchange) changes
  * no result and trips no hygiene rule; it just costs seconds at sf0.1
  * and hours at 100 TB. This audit freezes each heavy query's join
  * strategies and exchange counts as one summary line inside the
  * committed PLANS_r{N}.txt artifact; PlanDiffSpec recomputes the lines
  * live and diffs them, so a plan regression becomes a failing test with
  * a one-line cause, not a cross-round bench surprise.
  *
  * Counts come from the FORMATTED explain's numbered-detail entries (the
  * PlanShapeSpec convention — each operator appears once as "(n) Name"),
  * computed on the statically-planned query. Iterative queries cut their
  * lineage at localCheckpoints, so their summary pins the final stage's
  * plan — the per-iteration shapes are pinned by their own specs.
  */
object PlanAudit {

  /** The bench-heaviest registered queries (BENCH_FULL_r08 top tier by
    * warm median) — the round-7 funnel capstone q303 and the k-core
    * peel q313 included, plus the round-8 additions above the 2 s tier
    * (q320 incremental-IVF recall ~2.5 s, q321 shared runs ~3.3 s, and
    * the borderline q319 BPE fertility ~1.9 s, pinned while it sits at
    * the tier edge, the q323 corpus-wide run audit ~2.6 s, and the
    * borderline q324 S-curve calibration ~2 s, same tier-edge policy).
    */
  val heavyQueries: Seq[String] = Seq(
    "q255_adamic_adar",
    "q302_markov_attribution",
    "q284_hits_authority",
    "q293_containment",
    "q214_khop_reach",
    "q184_robust_zscore",
    "q251_incr_funnel",
    "q244_weighted_median",
    "q198_ivf_pq",
    "q288_assortativity",
    "q303_dual_neardup_funnel",
    "q313_kcore",
    "q319_bpe_fertility",
    "q320_incr_ivf_recall",
    "q321_shared_runs",
    "q323_dup_run_audit",
    "q324_lsh_scurve")

  /** Node kinds whose counts define a plan's cost signature. "Exchange"
    * is the shuffle exchange — the formatted detail line is exactly
    * "(n) Exchange", so it cannot collide with "(n) BroadcastExchange".
    */
  val auditedNodes: Seq[String] = Seq(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange", "BroadcastExchange", "Window", "HashAggregate")

  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** One stable line per query: `PLAN_SUMMARY <name> k=v k=v ...` with
    * zero-count nodes omitted, keys in auditedNodes order.
    */
  def summaryLine(name: String, plan: String): String = {
    val counts = auditedNodes.map { node =>
      node -> s"\\(\\d+\\) $node\\b".r.findAllIn(plan).size
    }.filter(_._2 > 0)
    s"PLAN_SUMMARY $name " +
      counts.map { case (k, v) => s"$k=$v" }.mkString(" ")
  }

  def summaryFor(s: SparkSession, sfDir: String, name: String): String = {
    // canonical cache state first: a prior consumer in this session may
    // have un-registered a shared memo base (cascading uncache), which
    // would flip its subtree from InMemoryRelation back to the inline
    // build and shift the node counts — same results, different shape
    graft.queries.ScaleQueries.ensureCachedBases(s, sfDir)
    summaryLine(name, formatted(SparkEntry.queries(name)(s, sfDir)))
  }
}
