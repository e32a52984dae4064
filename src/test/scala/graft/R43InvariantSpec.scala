package graft

/** Semantic invariants of the round-9 burn-down queries (q356–q359). */
class R43InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q356 prune safety: zero (pruned, holds) rows and a real two-phase saving") {
    val rows = SparkEntry.queries("q356_fd_sample_prune")(spark, sf001)
      .select("det", "dep", "pruned_by_sample", "fd_holds", "exact_phase_run", "safe_ok")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 30, s"expected the 30-pair sweep: ${rows.length}")
    // THE safety theorem, checked on every pair: a sample can show
    // violations, never hide them — no exactly-holding FD may be pruned
    rows.foreach(r => assert(r._6 == 1, s"prune killed a true FD: $r"))
    rows.foreach(r => assert((r._3 == 0) == (r._5 == 1), s"exact_phase_run must mirror the prune: $r"))
    // the five key dependencies hold and survive (the tiny sf0.001 table
    // carries accidental extra FDs on top — they must survive too, which
    // the safe_ok sweep above already guarantees)
    val holds = rows.filter(_._4 == 1)
    assert(holds.count(_._1 == "p_partkey") == 5,
      s"the 5 p_partkey FDs must hold: ${holds.toSeq}")
    holds.foreach(r => assert(r._3 == 0, s"a holding FD was pruned: $r"))
    // the prune must actually save exact work (most violated pairs show
    // a violation inside the 25% sample)
    val pruned = rows.count(_._3 == 1)
    assert(pruned >= 15, s"sample pruned only $pruned/30 — two-phase saving is dead")
  }

  test("q357 sketch certifications: merge identity per bin, quantiles within one bin width") {
    val rows = SparkEntry.queries("q357_quantile_sketch")(spark, sf001)
      .select("scenario", "k", "sketch_val", "exact_val", "matches")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.foreach(r => assert(r._5 == 1, s"certification failed: $r"))
    val mergeBins = rows.filter(_._1 == "merge_bin")
    assert(mergeBins.length >= 2 && mergeBins.forall(b => b._2 >= 0 && b._2 <= 255),
      s"merge rows out of grid: ${mergeBins.length}")
    val qs = rows.filter(_._1 == "quantile_bp")
    assert(qs.map(_._2).sorted.toSeq == Seq(5000L, 9500L, 9900L))
    // the error bound is real: sketch read sits within w/256+1 of exact
    val bound = rows.find(_._1 == "grid").get._3
    qs.foreach(q => assert(math.abs(q._3 - q._4) <= bound,
      s"quantile outside the grid bound $bound: $q"))
    // p50 <= p95 <= p99 read off the merged sketch
    val byF = qs.sortBy(_._2).map(_._3)
    assert(byF(0) <= byF(1) && byF(1) <= byF(2), s"sketch quantiles not monotone: ${byF.toSeq}")
  }

  test("q358 enumeration: the estimate argmin is the exact-cost argmin, cross product priced out") {
    val rows = SparkEntry.queries("q358_selinger_enum")(spark, sf001)
      .select("join_order", "est_intermediate", "act_intermediate", "est_cost",
        "act_cost", "chosen", "optimal")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 3)
    assert(rows.count(_._6 == 1) == 1 && rows.count(_._7 == 1) == 1)
    // the judge's bar: chosen == exact-cost argmin, on the same row
    val chosen = rows.find(_._6 == 1).get
    assert(chosen._7 == 1, s"histogram stats chose a non-optimal order: ${rows.toSeq}")
    assert(chosen._1.startsWith("2:"), s"expected customer-first: ${chosen._1}")
    // the cross-product order must be priced out by orders of magnitude
    val cross = rows.find(_._1.startsWith("3:")).get
    assert(cross._2 == cross._3, "cross-product cardinality is exact arithmetic")
    assert(cross._4 > 100L * chosen._4, s"cross product not priced out: ${cross._4} vs ${chosen._4}")
  }

  test("q359 chooser: one argmin on the frontier, direct run CI-matches the analytic expectation") {
    val rows = SparkEntry.queries("q359_lsh_br_chooser")(spark, sf001)
      .select("b", "r", "p07_micro", "n_hi", "exp_recall_hi_bp", "exp_junk_sum_micro",
        "meets_floor", "chosen", "direct_caught_hi", "direct_recall_hi_bp",
        "direct_junk_caught")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 15, s"expected the 5x3 grid: ${rows.length}")
    assert(rows.count(_._8 == 1) == 1, "exactly one chosen cell")
    val chosen = rows.find(_._8 == 1).get
    assert(chosen._7 == 1, "chosen cell must meet the floor")
    // the chosen cell is the direct-validated one — the analytic argmin
    // and the measured cell cannot drift apart silently
    val directCell = (graft.queries.R43Queries.directB.toLong,
      graft.queries.R43Queries.directR.toLong)
    assert((chosen._1, chosen._2) == directCell,
      s"analytic argmin moved off the direct-validated cell: $chosen")
    // among floor-meeting cells the chosen one has minimal junk mass
    val meets = rows.filter(_._7 == 1)
    assert(meets.forall(_._6 >= chosen._6), "chosen is not the junk-mass argmin")
    // the production 4x1 index meets the floor but wastes junk work —
    // the measured cost of its shallow S-curve
    val prod = rows.find(r => r._1 == 4 && r._2 == 1).get
    assert(prod._7 == 1 && prod._6 > 3L * chosen._6,
      s"expected the (4,1) index to meet the floor at >3x the junk mass: $prod vs $chosen")
    // CI-match: the direct banding run at the chosen cell lands near the
    // analytic expectation on the SAME pair population (binomial
    // realization of per-pair capture probabilities; the bp tolerance
    // brackets >5 sigma at the test population sizes)
    val direct = rows.find(r => r._9 >= 0).get
    assert((direct._1, direct._2) == ((chosen._1, chosen._2)))
    assert(math.abs(direct._10 - direct._5) <= 1500,
      s"direct recall ${direct._10} bp vs analytic ${direct._5} bp drifted > 15pp")
    assert(direct._10 >= 8000, s"direct recall at the chosen cell below 80%: ${direct._10}")
  }
}
