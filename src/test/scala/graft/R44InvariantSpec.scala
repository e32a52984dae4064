package graft

/** Semantic invariants of the round-9 estimation layer (q360–q362). */
class R44InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q360 HT calibration: the rarest stratum is exact, all strata within 15%") {
    val rows = SparkEntry.queries("q360_ht_sample_calibration")(spark, sf001)
      .select("lang", "n_docs", "kept_docs", "est_docs", "docs_err_bp", "tokens_err_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r._3 <= r._2, s"kept more than exists: $r"))
    // the minimum-count language has inclusion probability 1, so its
    // estimate is exact by construction — the estimator's anchor point
    val anchor = rows.minBy(_._2)
    assert(anchor._2 == anchor._3 && anchor._5 == 0 && anchor._6 == 0,
      s"rate-1 stratum not exact: $anchor")
    rows.foreach(r => assert(r._5 <= 1500 && r._6 <= 1500,
      s"HT estimate drifted past 15%: $r"))
  }

  test("q361 width frontier: one-sided bias, monotone in w, prediction tracks, argmin chosen") {
    val rows = SparkEntry.queries("q361_countmin_joinsize")(spark, sf001)
      .select("w", "cm_est", "exact_f2", "bias_bp", "pred_bias_bp", "meets_budget", "chosen")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 4)
    // count-min never under-counts: the certified upper-bound property
    rows.foreach(r => assert(r._2 >= r._3 && r._4 >= 10000, s"one-sided bias broken: $r"))
    // bias collapses as 1/w (monotone non-increasing across the grid)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4, s"bias not monotone in w: $a -> $b") }
    // the analytic collision prediction tracks the md5 reality
    rows.foreach(r => assert(math.abs(r._4 - r._5) <= 1500,
      s"measured bias ${r._4} vs predicted ${r._5} drifted: $r"))
    val chosen = rows.filter(_._7 == 1)
    assert(chosen.length == 1 && chosen.head._6 == 1, s"chosen cell wrong: ${rows.toSeq}")
    assert(chosen.head._1 == rows.filter(_._6 == 1).map(_._1).min,
      "chosen is not the cheapest budget-compliant width")
  }

  test("q362 bin chooser: guarantee implies measured, error within bound, argmin chosen") {
    val rows = SparkEntry.queries("q362_sketch_bin_chooser")(spark, sf001)
      .select("bins", "bound", "err_max", "meets_measured", "meets_guaranteed", "chosen")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 4)
    // the a-priori bound is real: measured error never exceeds it, so
    // meets_guaranteed can never out-admit meets_measured
    rows.foreach { r =>
      assert(r._3 <= r._2, s"measured error above the grid bound: $r")
      assert(r._5 == 0 || r._4 == 1, s"guaranteed but not measured: $r")
    }
    assert(rows.head._3 > rows.last._3, "error did not shrink from 16 to 1024 bins")
    val chosen = rows.filter(_._6 == 1)
    assert(chosen.length == 1 && chosen.head._4 == 1)
    assert(chosen.head._1 == rows.filter(_._4 == 1).map(_._1).min,
      "chosen is not the cheapest measured-compliant summary")
  }
}
