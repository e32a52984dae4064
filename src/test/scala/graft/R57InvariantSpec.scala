package graft

/** Semantic invariants of the round-12 first widening (q403 adaptive-salt
  * join executed, q404 incremental stats → stable plans, q405 per-column
  * data-skipping chooser).
  */
class R57InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q403 adaptive-salt join: exact reassembly, inside the gate, 8x less replication than uniform64") {
    val rows = SparkEntry.queries("q403_adaptive_salt_join")(spark, sf001)
      .select("leg", "rows", "checksum", "repl_rows", "skew_bp", "meets_bal", "equal_plain")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 2)
    val Array(salted, plain) = rows
    // the equivalence: the salted legs reassemble the plain join EXACTLY
    assert(rows.forall(_._7 == 1L), s"salted join diverged from plain: ${rows.toSeq}")
    assert(salted._2 == plain._2 && salted._3 == plain._3)
    // the executed placement lands inside the 2x gate q399 promised;
    // the plain pass shows the hot partition the salt dissolves
    assert(salted._5 <= 20000L && salted._6 == 1L, s"salted pass outside the gate: $salted")
    assert(plain._5 >= 60000L && plain._6 == 0L, s"plain pass lost its hot partition: $plain")
    // the replication bill: each key's own salt, an order of magnitude
    // under uniform64's n_keys * 64 (q399's 12x headline, gated at 8x)
    val nKeys = plain._4
    assert(salted._4 >= nKeys && salted._4 * 8L <= nKeys * 64L,
      s"adaptive replication ${salted._4} not in (n_keys, n_keys*8]: n_keys=$nKeys")
  }

  test("q404 incremental stats: argmin stable along the whole trajectory, sketches in the k-band") {
    val rows = SparkEntry.queries("q404_incr_stats_plans")(spark, sf001)
      .select("step", "n_li", "n_ord", "qerr_lok_bp", "qerr_oc_bp",
        "chosen_exact", "chosen_cheap", "worst_drift_bp", "argmin_stable")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 12)
    // ingest is monotone: prefixes only grow
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, s"prefix shrank: $a -> $b")
    }
    rows.foreach { r =>
      // every KMV NDV inside the k=32 q-error band (q394's 1/sqrt(k-2))
      assert(r._4 <= 14000L && r._5 <= 14000L, s"sketch NDV outside the band: $r")
      // the cheap argmin tracks the exact argmin at EVERY step — sketch
      // noise never crosses an inter-order gap
      assert(r._9 == 1L && r._6 == r._7, s"argmin flipped under cheap stats: $r")
      // the customer-first order (q358's optimum) wins throughout
      assert(r._6 == 2L, s"exact argmin left the customer-first order: $r")
      assert(r._8 <= 20000L, s"cheap cost surface drifted past 2x: $r")
    }
  }

  test("q405 skipping chooser: zonemap / bloom / none by column class, soundness everywhere") {
    val rows = SparkEntry.queries("q405_skipping_chooser")(spark, sf001)
      .select("cls", "structure", "files_touched", "rows_scanned", "rows_exact",
        "full_rows", "missed", "clears_gate", "chosen")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rows.length == 9)
    // soundness: no structure ever loses a matching row
    assert(rows.forall(_._7 == 0L), "a skipping structure missed matching rows")
    // rows_exact agrees across structures within a class (same battery)
    rows.groupBy(_._1).foreach { case (cls, rs) =>
      assert(rs.map(_._5).distinct.length == 1, s"$cls: rows_exact diverged across structures")
    }
    def one(cls: String, st: String) =
      rows.find(r => r._1 == cls && r._2 == st).get
    // A: the range-clustered column earns zone maps; the bloom cannot
    // answer range probes and scans everything
    assert(one("A:value_range", "2:zonemap")._9 == 1L)
    assert(one("A:value_range", "2:zonemap")._3 <= 6L)
    assert(one("A:value_range", "3:bloom1024")._4 ==
      one("A:value_range", "1:none")._4)
    // B: the scattered key defeats zone maps, the per-file bloom prunes
    val bZm = one("B:eid_point", "2:zonemap")
    val bBl = one("B:eid_point", "3:bloom1024")
    assert(bZm._8 == 0L, s"zone maps must not clear the gate on the scattered key: $bZm")
    assert(bBl._9 == 1L && bBl._4 * 4L <= bZm._4,
      s"bloom must beat zone maps >= 4x on point probes: $bBl vs $bZm")
    // C: the dict column defeats BOTH — every file carries every value —
    // and the chooser's honest answer is none
    rows.filter(_._1 == "C:flag_dict").foreach { r =>
      assert(r._4 == r._6, s"dict class: some structure pretended to prune: $r")
    }
    assert(one("C:flag_dict", "1:none")._9 == 1L)
    // exactly one chosen per class
    rows.groupBy(_._1).foreach { case (cls, rs) =>
      assert(rs.count(_._9 == 1L) == 1, s"$cls: chosen not unique")
    }
  }
}
