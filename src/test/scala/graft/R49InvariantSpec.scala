package graft

/** Semantic invariants of q373–q376 (round 10's "choosers must APPLY"
  * family). Every flag asserted here was measured at all three SFs
  * before pinning (the q293/q359 rule).
  */
class R49InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q373 Neyman executed: planted stratum and corpus total win, budget actually moved") {
    val rows = SparkEntry.queries("q373_neyman_execution")(spark, sf001)
      .select("lang", "alloc_prop", "alloc_neyman", "mae_prop_bp", "mae_neyman_bp",
        "neyman_wins")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 7, s"6 strata + __total expected: ${rows.toSeq}")
    val total = rows.find(_._1 == "__total").get
    val planted = rows.find(_._1 == "zz_mixed").get
    val honest = rows.filter(r => r._1 != "__total" && r._1 != "zz_mixed")
    // the MEASURED claim the query exists for: the drawn sample at
    // Neyman rates estimates the corpus token total strictly better
    assert(total._5 < total._4,
      s"corpus-total MAE did not shrink under Neyman: $total")
    assert(total._6 == 1L)
    // the planted heterogeneous stratum pulls ~3x its proportional
    // budget and its own estimate tightens
    assert(planted._3 > 2 * planted._2, s"budget did not move: $planted")
    assert(planted._5 < planted._4, s"planted stratum did not win: $planted")
    // honest strata FUND the reallocation — their per-stratum error may
    // drift up (Neyman minimizes the total, not each stratum), but the
    // budget they keep must stay the lion's share and no stratum may
    // collapse (error stays within 2x of its proportional baseline)
    honest.foreach { h =>
      assert(h._3 <= h._2, s"an honest stratum GAINED budget: $h")
      assert(h._5 <= 2 * h._4,
        s"an honest stratum's error collapsed beyond the funded drift: $h")
    }
  }

  test("q374 sample-built histogram: HT expansion calibrates, wide predicates barely degrade") {
    val rows = SparkEntry.queries("q374_sample_hist_qerror")(spark, sf001)
      .select("pred_id", "act_rows", "est_exact_hist", "est_sample_hist",
        "qerr_exact_bp", "qerr_sample_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 8)
    // every estimate is live (the sample histogram covers the battery —
    // a dead interpolation would read as est 0)
    rows.foreach(r => assert(r._4 > 0, s"sample estimate died: $r"))
    // wide predicates (0-5): the sample-built estimator stays within
    // 2500 bp of truth — ANALYZE-grade, not a coin flip
    rows.filter(_._1 <= 5).foreach { r =>
      assert(r._6 <= 12500, s"wide predicate degraded beyond sampling noise: $r")
    }
    // and the exact-built histogram is never WORSE than 1.5x the sample
    // one on wides (sanity: paying for the full scan must buy accuracy)
    val wides = rows.filter(_._1 <= 5)
    assert(wides.map(_._5).sum <= wides.map(_._6).sum,
      s"exact-built histogram lost to the sample overall: ${wides.toSeq}")
  }

  test("q375 delete TCO: reads=0 slice is the q368 rule, crossover flips with read traffic") {
    val rows = SparkEntry.queries("q375_delete_tco")(spark, sf001)
      .select("req", "reads", "victim_rows", "rewrite_rows", "cow_du", "mor_du",
        "strategy", "break_even_reads")
      .as[(Long, Long, Long, Long, Long, Long, String, Long)].collect()
    assert(rows.length == 16)
    // the reads=0 slice recovers q368's >10x-amplification folklore
    // exactly: MoR iff rewrite_rows > 10 * victim_rows
    rows.filter(_._2 == 0L).foreach { r =>
      val wantMor = r._4 > 10 * r._3
      assert((r._7 == "merge_on_read") == wantMor, s"reads=0 slice broke the 10x rule: $r")
    }
    // small scattered requests are MoR at write time but flip to CoW
    // once the table is read enough times before compaction
    val req1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(req1.head._7 == "merge_on_read" && req1.last._7 == "copy_on_write",
      s"the 2-D crossover is not visible on req 1: ${req1.toSeq}")
    // break-even is consistent with the strategy grid and monotone
    // non-increasing in request size (bigger deletes flip sooner)
    rows.foreach { r =>
      val cowWins = r._6 >= r._5
      assert(cowWins == (r._2 >= r._8), s"break_even inconsistent with grid: $r")
    }
    val be = rows.groupBy(_._1).map { case (k, v) => k -> v.head._8 }.toSeq.sortBy(_._1)
    be.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 <= a._2, s"break-even must not rise with request size: $be")
    }
  }

  test("q376 Selinger on sample stats: the argmin survives the cheap ANALYZE") {
    val rows = SparkEntry.queries("q376_selinger_sample_stats")(spark, sf001)
      .select("join_order", "cost_exact", "cost_sample", "chosen_exact",
        "chosen_sample", "argmin_stable")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows.count(_._4 == 1) == 1 && rows.count(_._5 == 1) == 1)
    // the decision q374 exists to de-risk: sample-built stats pick the
    // SAME join order (customer-first, q358's proven optimum)
    assert(rows.forall(_._6 == 1L), s"argmin flipped under sample stats: ${rows.toSeq}")
    assert(rows.find(_._4 == 1).get._1.startsWith("2:"),
      "the exact-stats argmin must be the customer-first order (q358's theorem)")
    // the cross-product order is priced out by orders of magnitude
    // under BOTH stats builds
    val cross = rows.find(_._1.startsWith("3:")).get
    val best = rows.find(_._4 == 1).get
    assert(cross._2 > 100 * best._2 && cross._3 > 100 * best._3,
      s"cross product not priced out: ${rows.toSeq}")
  }
}
