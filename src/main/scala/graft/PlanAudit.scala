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
  * Counts come from walking the AQE-off compile-time physical tree
  * under pristine cache stats (see summaryTree/summaryFor). Iterative
  * queries cut their lineage at localCheckpoints, so their summary pins
  * the final stage's plan — the per-iteration shapes are pinned by
  * their own specs.
  */
object PlanAudit {

  /** The bench-heaviest registered queries (BENCH_FULL_r08 top tier by
    * warm median) — the round-7 funnel capstone q303 and the k-core
    * peel q313 included, plus the round-8 additions above the 2 s tier
    * (q320 incremental-IVF recall ~2.5 s, q321 shared runs ~3.3 s, and
    * the borderline q319 BPE fertility ~1.9 s, pinned while it sits at
    * the tier edge, the q323 corpus-wide run audit ~2.6 s, and the
    * borderline q324 S-curve calibration ~2 s, same tier-edge policy;
    * q330's quote matrix rides the same positional-explode budget as
    * q323 at ~1.6-2.2 s).
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
    "q324_lsh_scurve",
    "q330_quote_matrix",
    // the layout-pricing core is a memoized shared base (zorderPricing,
    // read by q342 and q352) — the pinned Exchange=1 summary is the
    // cached-read-plus-sort shape, and any regression that inlines the
    // core back into the query (de-memoization) explodes the node counts
    // and fails the diff
    "q342_zorder_pricing",
    // round-9 heavy tier (>=2 s warm at sf0.1, QTime-measured): the
    // two-phase FD sweep, the sketch certifications (both deliberately
    // carry an exact grader), the Selinger enumeration, the 64-hash
    // banding validation, and the width/grain choosers whose single-pass
    // finest-grain plans these pins protect (q361/q362: one fact-table
    // hash/bin pass, coarser cells folded — de-fusing back to
    // per-width scans is the regression the diff would catch)
    "q356_fd_sample_prune",
    "q357_quantile_sketch",
    "q358_selinger_enum",
    "q359_lsh_br_chooser",
    "q361_countmin_joinsize",
    "q362_sketch_bin_chooser",
    // round-10 heavy tier (2.5-2.9 s warm at sf0.1): the quantile
    // shootout deliberately carries THREE lineitem passes — the sketch
    // build, the sample's QuantileOps exact ranks, and the 6-row
    // broadcast rank probe that grades both estimators against truth;
    // the pin protects the probe's build side staying the tiny
    // estimate table (a flipped build side would broadcast the corpus)
    "q381_quantile_shootout",
    // q385 (3.6 s warm): three cross-table exact graders — each pair
    // pays ONE keyed frequency pass per side (localCheckpointed; GEE
    // and the weighted count-min build ride it) plus the bounded
    // fr⋈fs equi-join; the pin protects the single-pass-per-side
    // shape (a de-fused build would rescan each fact table three
    // times per pair)
    "q385_cross_joinsize",
    // round-11 heavy tier (2.8-4.0 s warm at sf0.1): q397 is the
    // 12-step KMV merge chain — each step is two TakeOrdered sketches
    // plus the prefix-rebuild grader (the certification cost; state in
    // production is 32 values and each step O(k)); the pin protects
    // every top-32 staying a TakeOrderedAndProject, never a global
    // window over the ndv-sized hash set. q398 carries ten prefix
    // histogram/battery passes across three policies — the grading
    // convention — with every hist/preds build a broadcast-joined
    // aggregate. q400 applies four partitioning strategies to every
    // row; the pin protects the 256-row boundary map staying broadcast
    // and the 32-row overlap self-join staying a BroadcastNestedLoop,
    // never a cartesian
    "q397_kmv_incremental",
    "q398_analyze_policy",
    "q400_range_boundaries",
    // straddling the 2 s line run-to-run: q390's seven grid legs + the
    // raw-row apply (the pin protects the 192-row grid staying the
    // priced side — a de-fused frontier would rescan lineitem per
    // factor), q394's three pair legs each carrying the exact
    // union/intersection grader over the distinct-customer table
    "q390_salt_chooser",
    "q394_kmv_setops",
    // round-12 heavy tier (~2-3.5 s warm at sf0.1): q404 is the 12-step
    // incremental-stats enumeration — three KMV chains whose
    // step-partitioned top-32 windows run over the per-month top-32
    // PREFILTER (≤ 12x32 rows; the pin protects that containment
    // prefilter staying in the plan — de-filtering would window the
    // whole ndv-sized hash set twelve times); q405 applies zone maps
    // AND per-file blooms on three 32-file assignments with a fused
    // structure-tagged grading pass per class — the pin protects the
    // one-touched-union shape (a de-fused grader would re-run the
    // soundness anti-join once per structure) and every probe/zone/
    // cell table staying broadcast
    "q404_incr_stats_plans",
    "q405_skipping_chooser",
    // q416 carries the 2x2 composition grader — four cell-join legs
    // over the two applied layouts; the pin protects the probe/zone
    // tables staying broadcast and the full-join grader running ONCE
    // (localCheckpointed) rather than per cell
    "q416_inferred_pruning",
    // round-12 second-half heavy tier (~2-2.8 s warm at sf0.1,
    // QTime-measured): q419's one-pass CUBE grader (16x Expand over the
    // corpus — the pin protects the single-Expand shape; a per-node
    // grader would scan 16 times) next to the grain-cube serving leg;
    // q423's three GC-rule content re-reads over the row-tag frame (the
    // pin protects the survivor/DV joins staying broadcast); q427's
    // fused all-versions folds (ONE signed-partial pass + ONE x4
    // rebuild pass — de-fusing re-runs the corpus per version); the
    // privacy pair q428/q429 rides the 18-way lattice Expand over the
    // catalog-sized grain with the corpus touched once by the 4-table
    // grain join (the pin protects the single-Expand lattice and the
    // broadcast dim joins), q430 the same frame plus the rank window;
    // q432's class-tagged duel (both frequency classes riding the same
    // keyed aggregates, the indep self-join on (class, key, band))
    "q419_mv_dispatch",
    "q423_snapshot_expiry",
    "q427_mv_versioned",
    "q428_kanon_lattice",
    "q429_kanon_applied",
    "q430_ldiversity_escalation",
    "q432_sampling_duel")

  /** Node kinds whose counts define a plan's cost signature. Matched
    * against SparkPlan.nodeName ("Exchange" is ShuffleExchangeExec's
    * display name, distinct from "BroadcastExchange").
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
    *
    * Counted by walking the COMPILE-TIME physical tree
    * (queryExecution.sparkPlan), not the formatted text. The text embeds
    * every cached shared base's build plan, and once a base has been
    * materialized its stored AQE plan is FINAL — whose micro-shape
    * (broadcast side, elided distinct exchange) depends on runtime stats
    * in whatever query materialized it first, i.e. on suite order. The
    * tree walk stops at InMemoryTableScan leaves (cached builds are not
    * physical children) and carries no AQE runtime stages, so the
    * signature pins exactly what the audit is for: the CONSUMER query's
    * deterministic join/exchange strategy.
    */
  def summaryTree(name: String, plan: org.apache.spark.sql.execution.SparkPlan): String = {
    val counts = scala.collection.mutable.LinkedHashMap(auditedNodes.map(_ -> 0): _*)
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      if (counts.contains(p.nodeName)) counts(p.nodeName) += 1
      p.children.foreach(walk)
      // physical subqueries only — QueryPlan.subqueries casts every
      // PlanExpression payload to SparkPlan, but pre-AQE physical trees
      // can still carry LOGICAL subquery expressions (planned lazily),
      // which that cast blows up on
      p.expressions.foreach(_.foreach {
        case sq: org.apache.spark.sql.execution.ExecSubqueryExpression => walk(sq.plan)
        case _ =>
      })
    }
    walk(plan)
    s"PLAN_SUMMARY $name " +
      counts.filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }

  def summaryFor(s: SparkSession, sfDir: String, name: String): String = {
    // canonical cache state first: a prior consumer in this session may
    // have un-registered a shared memo base (cascading uncache), which
    // would flip its subtree from InMemoryRelation back to the inline
    // build and shift the node counts — same results, different shape
    graft.queries.ScaleQueries.ensureCachedBases(s, sfDir)
    // pristine-stats canonicalization: a MATERIALIZED cache entry
    // carries its measured size, an unmaterialized one its estimate, and
    // which bases the suite has materialized (and at what batch layout)
    // is order-dependent — compile-time join/exchange placement then
    // drifts by ±1 between a fresh JVM and a mid-suite session. Dropping
    // every buffer and re-registering lazily pins ALL cached-base stats
    // to the deterministic estimates in both contexts. Later consumers
    // just re-materialize on first use — a time cost only.
    s.sharedState.cacheManager.clearCache()
    graft.queries.ScaleQueries.ensureCachedBases(s, sfDir)
    // plan with AQE OFF: the pre-AQE sparkPlan carries no exchanges yet
    // (EnsureRequirements runs in the preparations), and the AQE-wrapped
    // executedPlan hides its tree behind AdaptiveSparkPlanExec — the
    // non-adaptive executedPlan is the full exchange-placed physical
    // tree, decided purely at compile time
    val key = "spark.sql.adaptive.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try summaryTree(name, SparkEntry.queries(name)(s, sfDir).queryExecution.executedPlan)
    finally s.conf.set(key, prev)
  }
}
