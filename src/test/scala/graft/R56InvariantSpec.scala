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
}
