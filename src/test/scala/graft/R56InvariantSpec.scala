package graft

/** Semantic invariants of the round-11 maintenance-policy member (q398
  * ANALYZE-policy chooser).
  */
class R56InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q398 ANALYZE policy: gate fires once, matches every-delta accuracy at a third of the scans") {
    val rows = SparkEntry.queries("q398_analyze_policy")(spark, sf001)
      .select("policy", "rebuilds", "extra_scan_rows", "worst_qerr_bp",
        "gate_fires", "in_band", "chosen")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 3)
    val Array(never, every, gate) = rows
    // the gate separates the planted drift from range jitter: exactly
    // one firing across the three post-build deltas
    assert(rows.forall(_._5 == 1L))
    assert(gate._2 == 1L && never._2 == 0L && every._2 == 3L)
    // never is blown once the drift lands (zero estimates on the new
    // region + the clamp-fattened top bin); the rebuilders stay exact
    assert(never._4 > 1000000L && never._6 == 0L,
      s"frozen boundaries must be catastrophically blown: $never")
    assert(every._4 <= 20000L && every._6 == 1L)
    assert(gate._4 <= 20000L && gate._6 == 1L)
    // the gate matches every-delta's accuracy band at ~1/3 the rebuild
    // scans, and it is the unique chosen policy
    assert(gate._3 * 2L < every._3,
      s"on_gate must scan less than half of every_delta: $gate vs $every")
    assert(gate._7 == 1L && never._7 == 0L && every._7 == 0L)
  }

  test("q399 adaptive salt: frontier monotone in target, chosen is the cheapest gate member") {
    val rows = SparkEntry.queries("q399_adaptive_salt")(spark, sf001)
      .select("strategy", "repl_rows", "parts_used", "max_load", "skew_bp",
        "meets_bal", "chosen")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 6)
    val none = rows.head
    val uni = rows(1)
    val adapt = rows.drop(2)
    // the diagnosis: unsalted zipf puts one key's whole mass on one
    // partition (>= 8x uniform) — and pays no replication
    assert(none._5 >= 80000L && none._6 == 0L)
    // finer targets can only pay more replication, and the measured
    // balance improves along the frontier's gate boundary
    adapt.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"replication not monotone in target: $a -> $b")
    }
    // only the finest target joins uniform64 in the 2x gate...
    assert(adapt.last._6 == 1L && uni._6 == 1L)
    adapt.init.foreach(r => assert(r._6 == 0L,
      s"a coarser target must miss the gate (collision mass): $r"))
    // ...and it ships an order of magnitude less replication
    assert(adapt.last._2 * 10L < uni._2,
      s"adaptive must beat uniform replication 10x: ${adapt.last._2} vs ${uni._2}")
    val chosen = rows.filter(_._7 == 1L)
    assert(chosen.length == 1 && chosen.head._1 == "6:adaptive_t256")
  }

  test("q400 range boundaries: sketch is the only cheap strategy that is balanced AND prunable") {
    val rows = SparkEntry.queries("q400_range_boundaries")(spark, sf001)
      .select("strategy", "parts_used", "max_load", "skew_bp", "range_overlaps",
        "state_units", "meets_bal", "disjoint", "chosen")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 4)
    val Array(hash, width, sketch, exact) = rows
    // hash: balanced, but every partition spans the whole range — all
    // 496 pairs overlap, nothing can ever be pruned
    assert(hash._7 == 1L && hash._5 == 496L && hash._8 == 0L)
    // equal width: disjoint but blown by the natural value skew
    assert(width._8 == 1L && width._4 >= 40000L && width._7 == 0L)
    // the sketch: in the gate, fully disjoint, 256 values of state
    assert(sketch._7 == 1L && sketch._8 == 1L && sketch._6 == 256L)
    // exact quantiles: the gold standard on balance, at full-multiset
    // state — the sort the sketch exists to avoid
    assert(exact._7 == 1L && exact._8 == 1L && exact._6 > sketch._6 * 3L)
    assert(exact._4 <= sketch._4)
    val chosen = rows.filter(_._9 == 1L)
    assert(chosen.length == 1 && chosen.head._1 == "3:sketch_cum256")
  }

  test("q401 zone-map pruning: range layout scans one partition per probe, hash scans everything, nothing missed") {
    val rows = SparkEntry.queries("q401_zonemap_pruning")(spark, sf001)
      .select("probe_id", "layout", "act_rows", "parts_touched", "rows_scanned",
        "amp_bp", "missed", "pruned_bp")
      .as[(Long, String, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rows.length == 6)
    // soundness everywhere: pruning never loses a matching row, and the
    // touched set always covers the answer
    rows.foreach { r =>
      assert(r._7 == 0L, s"zone-map pruning lost rows: $r")
      assert(r._5 >= r._3 && r._3 > 0L, s"touched set does not cover the probe: $r")
    }
    val (hash, range) = rows.partition(_._2.startsWith("1"))
    // the range layout's zone maps are sharp: exactly one partition per
    // probe, scan == answer (amp 1.0x), ~95% of the table pruned
    range.foreach { r =>
      assert(r._4 == 1L && r._6 == 10000L && r._8 >= 9000L,
        s"range layout must touch exactly its one partition: $r")
    }
    // the hash layout's every zone spans the whole range: nearly all
    // partitions touched, ~20x amplification, nothing pruned
    hash.foreach { r =>
      assert(r._4 >= 30L && r._6 >= 100000L && r._8 <= 500L,
        s"hash layout must be unprunable: $r")
    }
  }

  test("q402 runtime bloom: no false negatives, FPP inside the fill bound, decision splits the scenarios") {
    val rows = SparkEntry.queries("q402_runtime_bloom")(spark, sf001)
      .select("scenario", "n_keys", "bits_set", "fill_bp", "fact_rows",
        "true_rows", "rows_pass", "fp_keys", "fpp_bp", "fpp_bound_bp",
        "no_false_neg", "fp_ok", "reduction_bp", "apply_filter", "state_bits")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.length == 2)
    rows.foreach { r =>
      // the theorem, checked from data: a bloom filter never drops a
      // true key, and everything it passes covers the true rows
      assert(r._11 == 1L, s"false negative — not a bloom filter: $r")
      assert(r._7 >= r._6, s"pass set must cover the true rows: $r")
      assert(r._12 == 1L, s"measured FPP outside the fill^4 bound: $r")
      assert(r._15 == 65536L && r._3 <= 65536L)
    }
    val Array(sel, broad) = rows
    // the selective scenario: tiny fill, >=95% of fact rows never
    // shuffle — the filter is applied
    assert(sel._4 < 1000L && sel._13 >= 9500L && sel._14 == 1L,
      s"selective scenario must justify the filter: $sel")
    // the broad complement: the join keeps ~97% of rows, so even a
    // perfect filter saves ~3% — refused on measured reduction
    assert(broad._13 < 2500L && broad._14 == 0L,
      s"broad scenario must be refused: $broad")
  }
}
