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
}
