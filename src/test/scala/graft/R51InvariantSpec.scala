package graft

/** Semantic invariants of q381–q383 (round 10's third widening: the
  * ingestion-correctness members + the quantile shootout).
  */
class R51InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q381 quantile shootout: both estimators live, sketch state fixed, ranks near target") {
    val rows = SparkEntry.queries("q381_quantile_shootout")(spark, sf001)
      .select("f_bp", "estimator", "est_v", "state_units", "true_rank_bp", "rank_err_bp")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 6, s"3 quantiles x 2 estimators: ${rows.length}")
    // the sketch's rank error is bounded by its bin resolution: a bin
    // holds at most ~n/256 of uniform mass, but density concentrates —
    // the measured band at every SF is under 100 bp for the sketch and
    // under 300 bp for the 25% sample at sf0.001 (shrinking with n)
    rows.filter(_._2 == "1:sketch_256").foreach { r =>
      assert(r._4 == 256L, s"sketch state must be fixed: $r")
      assert(r._6 <= 100, s"sketch rank error out of its measured band: $r")
    }
    rows.filter(_._2 == "2:sample_25pct").foreach { r =>
      assert(r._4 > 256L, s"the sample's state grows with data: $r")
      assert(r._6 <= 300, s"sample rank error out of its measured band: $r")
    }
    // every estimate is a real data-adjacent value: its true rank is
    // strictly inside (0, 10000)
    rows.foreach(r => assert(r._5 > 0 && r._5 < 10000, s"degenerate estimate: $r"))
  }

  test("q382 idempotent apply: HWM fold exact, naive divergence is exactly the replay") {
    val rows = SparkEntry.queries("q382_idempotent_apply")(spark, sf001)
      .select("c_mktsegment", "idem_n", "naive_n", "full_n", "matches",
        "overcount_n", "divergence_is_replay")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._5 == 1, s"idempotent fold diverged from exactly-once: $r")
      assert(r._7 == 1, s"naive divergence is not the replayed batch: $r")
      assert(r._6 >= 0, s"naive fold lost rows: $r")
    }
    // the replay actually double-counted something somewhere — the
    // hazard is exercised, not vacuously absent
    assert(rows.map(_._6).sum > 0, s"replayed batch was empty: ${rows.toSeq}")
  }

  test("q383 late dimension: final==recompute, parked mass conserved, orphans exercised") {
    val rows = SparkEntry.queries("q383_late_dimension")(spark, sf001)
      .select("c_mktsegment", "final_n", "full_n", "matches", "parked_n",
        "mass_conserved")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5, s"all five segments must survive: ${rows.length}")
    rows.foreach { r =>
      assert(r._4 == 1, s"drain+merge diverged from full recompute: $r")
      assert(r._6 == 1, s"the parking lot ate or invented mass: $r")
    }
    // the fixture is alive: some fact actually arrived before its
    // dimension row (measured >0 at every SF with the 90-day window)
    assert(rows.head._5 > 0, s"no orphans — dead fixture: ${rows.toSeq}")
  }
}
