package graft

/** Semantic invariants of q384–q386 (round 10's fourth widening: the
  * dedup-TTL chooser and the two NDV-loop closures).
  */
class R52InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q384 dedup retention: leak monotone-decreasing, state monotone-increasing, 6h chosen") {
    val rows = SparkEntry.queries("q384_dedup_retention")(spark, sf001)
      .select("r_s", "state_rows", "leaked", "leak_bp", "meets_budget", "chosen")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 6, s"six TTL cells: ${rows.length}")
    // the tradeoff is real: longer TTL never leaks MORE and never holds
    // LESS state
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, s"leak not monotone: $a -> $b")
      assert(a._2 <= b._2, s"state not monotone: $a -> $b")
    }
    // the chooser lands on the 6-hour cell at every SF (the planted lag
    // mix is hash-proportional, not volume-dependent): the 1h cell is
    // far OVER the 60bp budget, 6h far under
    val chosen = rows.filter(_._6 == 1L)
    assert(chosen.map(_._1).toSeq == Seq(21600L), s"chosen: ${chosen.toSeq}")
    assert(rows.find(_._1 == 3600L).get._4 > 100, "1h cell should leak >100bp")
    assert(rows.find(_._1 == 21600L).get._4 <= 30, "6h cell should leak <=30bp")
    // the fixture is alive: something leaks even at 1 day
    assert(rows.find(_._1 == 86400L).get._3 > 0, "3-day stragglers missing")
  }

  test("q385 cross join-size: formula exact on FK pairs, CM one-sided, GEE within its own error") {
    val rows = SparkEntry.queries("q385_cross_joinsize")(spark, sf001)
      .select("pair_id", "estimator", "est", "true_rows", "qerr_bp", "overestimates")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 9, s"3 pairs x 3 estimators: ${rows.length}")
    // System-R formula with EXACT stats is exact on both PK-FK pairs
    // (containment: max(ndv) is the PK side's cardinality, and every
    // fact row matches exactly one dim row)
    for (pid <- Seq(1L, 3L)) {
      val r = rows.find(r => r._1 == pid && r._2 == "1:formula_exact").get
      assert(r._3 == r._4 && r._5 == 10000,
        s"formula on exact stats must be exact on the FK pair $pid: $r")
    }
    // the count-min inner product is ONE-SIDED on every pair — est >=
    // true holds by construction (non-negative counts share cells)
    rows.filter(_._2 == "3:cm_dot").foreach { r =>
      assert(r._6 == 1L, s"CM dot under-estimated — impossible: $r")
    }
    // sample stats degrade the formula by at most the GEE error itself:
    // measured band <= 1.5x at every SF on every pair
    rows.filter(_._2 == "2:formula_gee").foreach { r =>
      assert(r._5 <= 15000, s"GEE-stats estimate out of its measured band: $r")
    }
  }

  test("q386 NDV rate frontier: nested rates, unique key on the sqrt hardness floor") {
    val rows = SparkEntry.queries("q386_ndv_rate_frontier")(spark, sf001)
      .select("col_id", "rate_denom", "sample_rows", "est_gee", "ndv_exact",
        "qerr_bp", "floor_bp", "on_floor", "chosen")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 12, s"4 cols x 3 rates: ${rows.length}")
    // nesting is real: per column, sample_rows grows as the rate
    // coarsens 1/64 -> 1/16 -> 1/4 (same hash, wider cutoff)
    rows.groupBy(_._1).values.foreach { g =>
      val byRate = g.sortBy(-_._2) // denom 64, 16, 4
      byRate.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 <= b._3, s"nested sample shrank as the cutoff widened: $a -> $b")
      }
    }
    // the unique key (col 1) sits ON the sqrt(1/q) lower bound at every
    // rate — within the 10% band the on_floor flag encodes — and is
    // never within the 1.5x budget (no chosen cell)
    val uk = rows.filter(_._1 == 1L)
    assert(uk.forall(_._8 == 1L), s"unique key off the hardness floor: ${uk.toSeq}")
    assert(uk.forall(_._9 == 0L), s"unique key cannot be in budget: ${uk.toSeq}")
    // the heavy-repeat FK and the enum are priced by the CHEAPEST rate
    // at every SF: chosen lands on denom 64
    for (cid <- Seq(2L, 4L)) {
      val ch = rows.filter(r => r._1 == cid && r._9 == 1L)
      assert(ch.map(_._2).toSeq == Seq(64L), s"col $cid chooser moved: ${ch.toSeq}")
    }
    // the enum is EXACT at every rate (every value repeats past any
    // sample cutoff, f1 = 0)
    rows.filter(_._1 == 4L).foreach { r =>
      assert(r._4 == r._5 && r._6 == 10000, s"enum should be exact: $r")
    }
  }
}
