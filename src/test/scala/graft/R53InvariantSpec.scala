package graft

/** Semantic invariants of the round-11 execution halves (q387 compaction
  * apply, q388 histogram boundary-rebuild recovery).
  */
class R53InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q387 compaction apply: relief certified per file and in total, both directions, within budget") {
    val rows = SparkEntry.queries("q387_compaction_apply")(spark, sf001)
      .select("f", "rows_f", "compact_now", "tax_pre_du", "rows_post", "dv_post",
        "tax_post_du", "reclaimed_du", "rewrite_paid_du", "relief_ok")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    val (total, files) = rows.partition(_._1 == -1L)
    assert(files.length == 32 && total.length == 1)
    // every certification row green — per file AND the __total invoice
    rows.foreach(r => assert(r._10 == 1L, s"relief certification failed: $r"))
    val compacted = files.filter(_._3 == 1L)
    assert(compacted.nonEmpty, "the schedule compacted nothing — dead fixture")
    compacted.foreach { r =>
      // the apply really removed the victims: residual DV mass re-derived
      // from data is zero, the rewrite shrank the file, and the whole
      // recurring tax came back
      assert(r._6 == 0L, s"compacted file still carries DV rows: $r")
      assert(r._5 < r._2, s"rewrite did not drop any rows: $r")
      assert(r._7 == 0L && r._8 == r._4 && r._4 > 0L,
        s"compacted file must reclaim its whole positive tax: $r")
      assert(r._9 > 0L, s"a compacted file must pay its rewrite: $r")
    }
    files.filter(_._3 == 0L).foreach { r =>
      // untouched files are bit-identical in the re-priced state
      assert(r._5 == r._2 && r._7 == r._4 && r._8 == 0L && r._9 == 0L,
        s"untouched file changed under the apply: $r")
    }
    // the invoice: total reclaimed is exactly the compacted files' tax,
    // and it is the dominant share of the table's whole recurring tax
    // (payback-ordered greedy spends the budget where the tax lives)
    val t = total.head
    assert(t._8 == compacted.map(_._4).sum, s"total reclaimed mismatch: $t")
    assert(t._8 * 10L >= t._4 * 5L,
      s"the schedule reclaimed under half the recurring tax: $t")
    // the schedule pays back: one cycle's reclaimed tax covers the
    // rewrite within the 10-cycle qualification window
    assert(t._9 <= t._8 * 10L, s"rewrite cost outside the payback window: $t")
  }

  test("q388 refresh apply: gate fired, drifted region blown on stale boundaries, every predicate recovered") {
    val rows = SparkEntry.queries("q388_hist_refresh_apply")(spark, sf001)
      .select("pred_id", "act_rows", "est_stale", "est_refresh",
        "qerr_stale_bp", "qerr_refresh_bp", "refresh_fired", "stale_blown",
        "recovered")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r._2 > 0L, s"dead predicate (no actual rows): $r")
      assert(r._7 == 1L, "the q380 gate must fire on the planted shard")
      assert(r._9 == 1L && r._6 <= 20000L,
        s"predicate not recovered after the boundary rebuild: $r")
    }
    // the drifted-region predicates are INVISIBLE to the frozen
    // boundaries — estimate zero, q-error catastrophically blown — which
    // is exactly why the merge identity alone cannot certify freshness
    rows.filter(_._1 >= 5L).foreach { r =>
      assert(r._3 == 0L && r._8 == 1L && r._5 > 100000L,
        s"drifted predicate not blown on stale boundaries: $r")
    }
  }

  test("q389 cheap-ANALYZE bundle: rate chooser lands per column class, argmin stable on the optimum") {
    val rows = SparkEntry.queries("q389_cheap_analyze_bundle")(spark, sf001)
      .select("join_order", "cost_exact", "cost_cheap", "drift_bp",
        "chosen_exact", "chosen_cheap", "argmin_stable",
        "dn_lok", "gee_lok", "ndv_lok", "dn_ook", "gee_ook", "ndv_ook",
        "dn_oc", "gee_oc", "ndv_oc", "dn_ck", "gee_ck", "ndv_ck")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    // the full cheap stack never flips the join order, and both argmins
    // land on the customer-first order q358 proved optimal
    rows.foreach(r => assert(r._7 == 1L, s"argmin flipped under cheap stats: $r"))
    rows.foreach { r =>
      val isOpt = r._1.startsWith("2:")
      assert(r._5 == (if (isOpt) 1L else 0L) && r._6 == r._5,
        s"chosen flags off the customer-first optimum: $r")
    }
    // cheap costs drift but stay well inside the inter-order gap
    rows.foreach(r => assert(r._4 <= 13000L, s"cheap-cost drift out of band: $r"))
    val gap = rows.filter(_._6 == 0L).map(_._3).min
    assert(rows.filter(_._6 == 1L).head._3 * 3L < gap * 2L,
      "the cheap winner is not separated from the runner-up by the safety margin")
    // per-column rate classes: the 10-repeat FK affords the cheapest 1/64
    // rate within 1.5x; the unique keys are NEVER in budget (q386's
    // hardness floor) and fall back to 1/4 sitting on the ndv/2 floor
    val r0 = rows.head
    assert(r0._14 == 64L && r0._15 * 3L >= r0._16 * 2L && r0._15 <= r0._16 * 2L,
      s"o_custkey should be priced in budget at 1/64: $r0")
    for ((dn, gee, ndv) <- Seq((r0._11, r0._12, r0._13), (r0._17, r0._18, r0._19))) {
      assert(dn == 4L, s"unique key must fall back to the densest rate: $r0")
      assert(gee < ndv && ndv <= gee * 2L + 2L,
        s"unique-key GEE must sit on the ndv/2 hardness floor: $r0")
    }
    // the ~4-repeat lineitem FK is estimated within the 1.5x budget at
    // whatever rate the chooser picked
    assert(r0._9 * 2L >= r0._10 && r0._9 <= r0._10 * 2L,
      s"l_orderkey GEE out of its band: $r0")
  }
}
