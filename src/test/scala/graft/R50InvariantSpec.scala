package graft

/** Semantic invariants of q377–q380 (round 10's second widening: the
  * maintenance/estimation members). Flags measured at all three SFs
  * before pinning; assertions here are the sf0.001 readout.
  */
class R50InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q377 compaction trigger: schedule respects the budget, payback ranks the queue") {
    val rows = SparkEntry.queries("q377_compaction_trigger")(spark, sf001)
      .select("f", "rows_f", "dv_rows", "tax_du", "rewrite_du", "payback_cycles",
        "qual", "budget_rows", "compact_now")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 32)
    // compact_now ⊆ qual, and only DV-carrying files ever qualify
    rows.foreach { r =>
      assert(r._9 <= r._7, s"compacted a non-qualifying file: $r")
      assert(r._7 == 0 || r._3 > 0, s"qualified without a delete vector: $r")
    }
    // the planted read skew makes the budget BIND: some qualifying
    // files are deferred to the next cycle
    val nQual = rows.count(_._7 == 1)
    val nComp = rows.count(_._9 == 1)
    assert(nComp >= 1 && nComp < nQual,
      s"budget must bind (else the scheduler is vacuous): $nComp of $nQual")
    assert(rows.filter(_._9 == 1).map(_._2).sum <= rows.head._8,
      "compacted rows exceed the cycle budget")
    // greedy order: every compacted file pays back no later than every
    // deferred-but-qualifying file (ties broken by file id)
    val compMax = rows.filter(_._9 == 1).map(r => (r._6, r._1)).max
    val deferMin = rows.filter(r => r._7 == 1 && r._9 == 0).map(r => (r._6, r._1)).min
    assert(Ordering[(Long, Long)].lt(compMax, deferMin),
      s"schedule not in payback order: $compMax vs $deferMin")
  }

  test("q378 sample NDV: GEE sits at its sqrt bound on the key, beats scale-up on the FK") {
    val rows = SparkEntry.queries("q378_sample_ndv_chao")(spark, sf001)
      .select("col_name", "ndv_exact", "f1", "f2", "est_gee", "est_scaleup",
        "qerr_gee_bp", "qerr_scaleup_bp")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 4)
    // unique key: every sampled value is a singleton, and GEE's error
    // is the sqrt(1/q) = 2x factor the hardness bound says no sample
    // estimator beats (19000-20000 bp window, measured at all SFs)
    val key = rows("o_orderkey")
    assert(key._3 == key._5 - key._3 && key._4 == 0,
      s"unique key must sample as all-singletons: $key")
    assert(key._7 >= 19000 && key._7 <= 20000,
      s"GEE off its sqrt bound on the key: $key")
    // skewed FK: GEE near-exact, scale-up overshoots ~3.4x (values
    // repeat past the sample rate, so multiplying d by 4 counts each
    // frequent value four times)
    val fk = rows("o_custkey")
    assert(fk._7 < 1500 + 10000 && fk._7 < fk._8,
      s"GEE must beat scale-up on the skewed FK: $fk")
    assert(fk._8 > 30000, s"scale-up should overshoot ~3.4x on the FK: $fk")
    // enum: the sample sees every value many times — GEE exact
    assert(rows("o_orderpriority")._7 == 10000,
      s"GEE must be exact on the enum: ${rows("o_orderpriority")}")
  }

  test("q379 join-size shootout: count-min certified one-sided, both estimators live") {
    val rows = SparkEntry.queries("q379_joinsize_shootout")(spark, sf001)
      .select("estimator", "state_units", "est", "exact_f2", "qerr_bp",
        "overestimates", "one_sided_safe")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 2)
    val cm = rows("1:count_min")
    val sm = rows("2:bernoulli_sample")
    // the planner-facing property: count-min NEVER undershoots
    // (collisions only add mass) — certified, not assumed
    assert(cm._3 >= cm._4 && cm._6 == 1 && cm._7 == 1,
      s"count-min one-sidedness broken: $cm")
    assert(sm._7 == 0, "the sample must not claim one-sided safety")
    // both estimators land within 15% of exact at this scale — live
    // estimators, not noise (count-min's width frontier q361 governs
    // what happens when the stream outgrows the width)
    assert(cm._5 <= 11500 && sm._5 <= 11500,
      s"estimator out of its measured band: $cm / $sm")
    // fixed-state sketch vs linear-state sample
    assert(cm._2 == 3 * 8192, s"sketch state must be fixed: $cm")
    assert(sm._3 > 0, s"sample estimate must be positive (16*S2 > 3n): $sm")
  }

  test("q380 incremental histogram: merge==rebuild in both scenarios, trigger fires only on drift") {
    val rows = SparkEntry.queries("q380_incr_histogram")(spark, sf001)
      .select("scenario", "bin", "delta_cnt", "rebuilt_cnt", "matches",
        "oor_rows", "refresh_boundaries")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 32, s"16 bins x 2 scenarios: ${rows.length}")
    // the mergeable-summary identity holds in BOTH scenarios — drift
    // breaks boundary fidelity, never additivity (the subtle trap)
    rows.foreach(r => assert(r._5 == 1, s"merge != rebuild: $r"))
    // the refresh trigger is the only thing separating the scenarios
    val obs = rows.filter(_._1 == "1:observed")
    val dft = rows.filter(_._1 == "2:drifted")
    assert(obs.forall(r => r._6 == 0 && r._7 == 0),
      s"observed day must not fire the trigger: ${obs.toSeq}")
    assert(dft.forall(r => r._6 > 0 && r._7 == 1),
      s"drifted day must fire the trigger: ${dft.toSeq}")
    // and EVERY drifted delta row clamps into the TOP edge bin — the
    // silent fattening the trigger exists to catch
    assert(dft.find(_._2 == 15L).get._3 == dft.head._6,
      s"drifted delta mass must all clamp to bin 15: ${dft.toSeq}")
    assert(dft.filter(_._2 != 15L).forall(_._3 == 0L),
      s"drifted delta leaked outside the edge bin: ${dft.toSeq}")
  }
}
