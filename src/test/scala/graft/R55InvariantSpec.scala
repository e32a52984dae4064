package graft

/** Semantic invariants of the round-11 sketch/correlation members (q394
  * KMV set operations, q395 FD-vs-independence selectivity, q396
  * build-side flip).
  */
class R55InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q394 KMV: merge == rebuild exactly, union inside the k-band, intersections graded") {
    val rows = SparkEntry.queries("q394_kmv_setops")(spark, sf001)
      .select("pair_id", "est_a", "nd_a", "est_b", "nd_b", "est_union",
        "exact_union", "qerr_union_bp", "matches", "est_inter_ie",
        "est_inter_rho", "exact_inter", "qerr_ie_bp", "qerr_rho_bp",
        "merge_ok", "state_units")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    rows.foreach { r =>
      // the mergeability theorem, exact: union-of-sketches IS the
      // rebuilt sketch of the union
      assert(r._15 == 1L, s"KMV merge identity broken: $r")
      assert(r._16 == 64L)
      // a sketch is a sketch: estimates come from 32 minima, not the set
      assert(r._3 > 32L && r._5 > 32L, s"ndv must exceed k for a real sketch: $r")
      // union estimate inside the ~1/sqrt(k-2) band (measured <= 1.34x)
      assert(r._8 <= 14000L, s"union q-error out of the k=32 band: $r")
      assert(r._9 <= 32L && r._12 > 0L, s"dead intersection fixture: $r")
      assert(r._10 >= 0L, "inclusion-exclusion must be clamped at zero")
      // both estimators inside their measured grades
      assert(r._13 <= 12000L, s"inclusion-exclusion grade drifted: $r")
      assert(r._14 <= 21000L, s"rho grade drifted: $r")
    }
  }

  test("q395 FD selectivity: independence 4x under + phantom rows, FD rule exact at 58% of grid state") {
    val rows = SparkEntry.queries("q395_fd_selectivity")(spark, sf001)
      .select("box_id", "act_rows", "est_indep", "est_fd", "est_grid",
        "qerr_indep_bp", "qerr_fd_bp", "phantom_indep", "fd_holds",
        "state_indep", "state_fd", "state_grid")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r._9 == 1L, "month -> quarter must hold on this data")
      // the FD rule and the joint grid are exact on every box
      assert(r._4 == r._2 && r._5 == r._2, s"FD/grid estimate not exact: $r")
      assert(r._10 == 16L && r._11 == 28L && r._12 == 48L)
    }
    // consistent boxes: independence underestimates ~4x (one quarter =
    // three months, so multiplying by sel(quarter) divides by 4)
    rows.filter(r => r._1 != 2L).foreach { r =>
      assert(r._2 > 0L, s"dead box: $r")
      assert(r._6 >= 35000L && r._6 <= 45000L,
        s"independence q-error should sit at ~4x: $r")
      assert(r._8 == 0L)
    }
    // the contradiction box: zero real rows, phantom estimate > 0
    val contra = rows.find(_._1 == 2L).get
    assert(contra._2 == 0L && contra._3 > 0L && contra._8 == 1L,
      s"contradiction box must show phantom rows: $contra")
  }

  test("q396 build-side flip: independence broadcasts the wrong side, FD-aware repairs it") {
    val rows = SparkEntry.queries("q396_build_side_flip")(spark, sf001)
      .select("estimator", "est_x", "est_y", "act_x", "act_y", "build_side",
        "correct_vs_exact", "x_underest_bp")
      .as[(String, Long, Long, Long, Long, String, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    val Array(ind, fd, ex) = rows
    // the hazard: independence prices X under Y and broadcasts X, but X
    // is really the bigger side — the 4x-over-priced broadcast
    assert(ind._6.startsWith("X") && ind._7 == 0L,
      s"independence must pick the wrong build side: $ind")
    assert(ind._8 >= 30000L, s"X must be >= 3x its independence price: $ind")
    // truth: X is bigger than Y
    assert(ex._4 > ex._5 && ex._6.startsWith("Y") && ex._7 == 1L)
    // the FD-aware stats price X exactly and flip the choice back
    assert(fd._2 == ex._4 && fd._6.startsWith("Y") && fd._7 == 1L,
      s"FD-aware stats must repair the choice: $fd")
  }

  test("q397 incremental KMV: merge chain certified at every step, estimate tracks saturation") {
    val rows = SparkEntry.queries("q397_kmv_incremental")(spark, sf001)
      .select("step", "month_rows", "est_ndv", "exact_ndv", "qerr_bp",
        "merge_ok", "rescan_rows_saved", "state_units")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 12L))
    rows.foreach { r =>
      // the inductive identity: merged state == rebuilt prefix sketch
      assert(r._6 == 1L, s"merge chain broke at step ${r._1}: $r")
      assert(r._8 == 32L && r._2 > 32L)
      // every step's estimate inside the k = 32 band
      assert(r._5 <= 14000L, s"estimate left the band at step ${r._1}: $r")
    }
    // saturation: the exact curve is nondecreasing and flattens; the
    // estimate can only grow (merged minima only shrink, so theta only
    // falls); the avoided rescan grows with the prefix
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4 && b._3 >= a._3 && b._7 > a._7,
        s"saturation shape violated: $a -> $b")
    }
    assert(rows.last._4 == rows(7)._4,
      "the customer universe must saturate before the final step")
    assert(rows.head._7 == 0L && rows.last._7 > rows.last._2 * 10L,
      "by step 12 the avoided rescan must dwarf the month's own rows")
  }
}
