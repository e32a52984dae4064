package graft

/** Semantic invariants of the round-11 skew stack (q390 salt chooser,
  * q391 mergeable heavy hitters, q392 summary-size frontier, q393
  * hybrid skew join).
  */
class R54InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q390 salt chooser: frontier monotone, chosen minimal in the gate, apply certifies the grid") {
    val rows = SparkEntry.queries("q390_salt_chooser")(spark, sf001)
      .select("salt_s", "n_subkeys", "parts_used", "max_load", "min_load",
        "skew_bp", "repl_rows", "meets_bal", "chosen", "apply_max_load", "apply_ok")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    // more salt never makes the measured imbalance worse on this grid
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._6 <= a._6, s"skew_bp not monotone: $a -> $b")
    }
    // the apply certification is green on every row (vacuous off-chosen)
    rows.foreach(r => assert(r._11 == 1L, s"apply certification failed: $r"))
    // chosen = minimal factor in the 2x gate; everything smaller fails
    val chosen = rows.filter(_._9 == 1L)
    assert(chosen.length == 1 && chosen.head._1 == 64L,
      s"expected s=64 as the unique chosen factor: ${chosen.toSeq}")
    assert(chosen.head._8 == 1L && chosen.head._6 <= 20000L)
    rows.filter(_._1 < 64L).foreach(r =>
      assert(r._8 == 0L, s"a smaller factor also met the gate — not minimal: $r"))
    // the apply really ran: the chosen row's raw-recomputed max load is
    // the grid's prediction, not the 0 placeholder
    assert(chosen.head._10 == chosen.head._4 && chosen.head._10 > 0L)
    // the replication price is s x the 3-flag dim
    rows.foreach(r => assert(r._7 == r._1 * 3L, s"repl_rows off: $r"))
    // salting bought an order of magnitude: 21.5x uniform down to <2x
    assert(rows.head._6 > 200000L && chosen.head._6 < 20000L)
  }

  test("q391 heavy hitters: two-sided bound holds, planted head certified, summary state bounded") {
    val rows = SparkEntry.queries("q391_heavy_hitters")(spark, sf001)
      .select("k", "est", "f", "err", "bound", "bound_ok", "certified_heavy",
        "is_heavy", "state_rows")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty && rows.forall(_._9 == 64L),
      "summary state must be exactly 8 shards x 8 entries")
    // the deterministic SpaceSaving guarantee on every candidate
    rows.foreach { r =>
      assert(r._6 == 1L, s"bound violated: $r")
      assert(r._2 <= r._3 && r._4 == r._3 - r._2, s"est must lower-bound f: $r")
    }
    // the planted 2% head {g2..g5} is certified heavy from the summary
    // alone, and nothing else is certified (no false positives here)
    val certified = rows.filter(_._7 == 1L).map(_._1).sorted.toSeq
    assert(certified == Seq("g2", "g3", "g4", "g5"),
      s"certified set drifted: $certified")
    rows.foreach(r => assert(r._7 == r._8,
      s"certified_heavy and is_heavy disagree on this corpus: $r"))
    // the bound is genuinely binding somewhere: some tail candidate was
    // dropped by most shards and its error sits inside a nonzero bound
    assert(rows.exists(r => r._4 > 0L && r._5 >= r._4),
      "no candidate exercises the nonzero-error side of the bound — dead fixture")
  }

  test("q392 k frontier: blind spot shrinks with k, chosen is the smallest fit size") {
    val rows = SparkEntry.queries("q392_hh_k_frontier")(spark, sf001)
      .select("kk", "state_rows", "sum_eps", "tau_n", "detection_complete",
        "n_cand", "n_cert", "n_heavy", "n_heavy_cert", "recovered_all", "chosen")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    assert(rows.forall(_._8 == 4L), "the planted heavy set is 4 keys")
    // the blind spot can only shrink as the summary grows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"sum_eps not monotone: $a -> $b")
    }
    // k=2 cannot even see the whole head; at sf0.001 only k=16 is both
    // detection-complete and fully certifying (the frontier's scale
    // finding: sf0.01+ choose k=4)
    assert(rows.head._10 == 0L, "k=2 must miss part of the planted head")
    val chosen = rows.filter(_._11 == 1L)
    assert(chosen.length == 1 && chosen.head._1 == 16L,
      s"expected k=16 chosen at sf0.001: ${chosen.toSeq}")
    assert(chosen.head._5 == 1L && chosen.head._10 == 1L)
    rows.filter(_._1 < chosen.head._1).foreach(r =>
      assert(r._5 == 0L || r._10 == 0L, s"a smaller k also fits — not minimal: $r"))
  }

  test("q393 hybrid skew join: legs reassemble the plain join exactly, head carries its mass") {
    val rows = SparkEntry.queries("q393_hybrid_skew_join")(spark, sf001)
      .select("leg", "rows", "checksum", "share_bp", "n_hot", "equal_plain")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    rows.foreach(r => assert(r._6 == 1L, s"split does not reassemble the plain join: $r"))
    assert(rows.forall(_._5 == 4L), "the summary must certify exactly the 4 planted hot keys")
    val Array(h, l, p) = rows
    assert(h._2 + l._2 == p._2 && h._3 + l._3 == p._3)
    assert(p._4 == 10000L)
    // the 4 broadcast keys carry a plurality of the join mass (~48%) —
    // the rows a plain shuffle would have funneled into 2 partitions
    assert(h._4 >= 4000L && h._4 <= 6000L, s"heavy-leg share drifted: ${h._4}")
  }
}
