package graft

/** Semantic invariants of q363–q365 (two-phase heavy hitters, the
  * partition-grain chooser, the token-estimator calibration).
  */
class R45InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q363 two-phase HH: the (pruned, true-HH) class is empty, plants land on both sides") {
    val rows = SparkEntry.queries("q363_twophase_heavy_hitters")(spark, sf001)
      .select("scenario", "kk", "n_keys", "exact_rows", "est_rows")
      .as[(String, Long, Long, Long, Long)].collect()
    val classes = rows.filter(_._1 == "class").map(r => r._2 -> r._3).toMap
    // THE safety theorem, as a checked row: a one-sided estimator can
    // never prune a true heavy hitter
    assert(classes(1L) == 0, s"count-min pruned a true heavy hitter: ${rows.toSeq}")
    // the 8x and 4x plants are heavy and found; the 2x plant is below
    // the 3x-mean threshold and correctly not a candidate
    val cands = rows.filter(_._1 == "candidate")
    assert(Set(-1L, -2L).subsetOf(cands.map(_._2).toSet),
      s"planted heavy hitters missed: ${cands.toSeq}")
    assert(!cands.exists(_._2 == -3L), "the sub-threshold plant must not be a candidate")
    assert(classes(3L) >= 2, "true-HH-and-candidate class lost the plants")
    // one-sided per candidate: est >= exact
    cands.foreach(c => assert(c._5 >= c._4, s"candidate bound under-counts: $c"))
    // the exact phase touches only candidates: pruned keys dominate
    assert(classes(0L) > 4 * (classes(2L) + classes(3L)),
      s"the prune saved no exact work: $classes")
  }

  test("q364 grain chooser: one argmin, exact workload invariant across grains") {
    val rows = SparkEntry.queries("q364_partition_grain_chooser")(spark, sf001)
      .select("grain", "n_parts", "w_parts_touched", "w_rows_scanned", "w_rows_exact",
        "cost", "chosen")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 4 && rows.count(_._7 == 1) == 1)
    // the exact workload answer cannot depend on physical layout
    assert(rows.map(_._5).distinct.length == 1, s"exact rows differ by grain: ${rows.toSeq}")
    rows.foreach(r => assert(r._4 >= r._5, s"scanned fewer rows than match: $r"))
    // at test scale the open cost dominates: day grain must lose (its
    // ~2300 opens dwarf the table), and the chosen grain is coarse
    val day = rows.find(_._1 == "1:day").get
    assert(day._7 == 0 && day._6 == rows.map(_._6).max,
      s"day grain should carry the worst cost at this scale: ${rows.toSeq}")
    val chosen = rows.find(_._7 == 1).get
    assert(chosen._6 == rows.map(_._6).min)
  }

  test("q365 token estimators: language-aware ratios beat bytes/4 everywhere") {
    val rows = SparkEntry.queries("q365_token_estimator_calibration")(spark, sf001)
      .select("lang", "n_tokens", "err_bytes4_bp", "err_fert_bp", "err_cpt_bp", "best_est")
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r._3 > 3000, s"bytes/4 cannot be this good on this corpus: $r")
      assert(r._4 <= 500 && r._5 <= 500, s"ratio estimators drifted past 5%: $r")
      assert(r._6 != "bytes4", s"bytes/4 must never win: $r")
      assert(Seq(r._4, r._5).min ==
        (if (r._6 == "fertility") r._4 else r._5), s"best_est is not the argmin: $r")
    }
  }
}
