package graft

/** Semantic invariants of the round-12 rewrite arc (q406–q411): every
  * rewrite's equivalence certification holds, every chooser picks by
  * measured row flow, and the q406/q411 pair flips direction on the
  * same algebra — the arc's central claim.
  */
class R58InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q406 eager aggregation: exact equivalence, 4x fewer rows into the join") {
    val rows = SparkEntry.queries("q406_eager_aggregation")(spark, sf001)
      .select("variant", "fact_rows_into_join", "equal_results", "saved_bp", "chosen")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    val Array(late, eager) = rows
    assert(rows.forall(_._3 == 1L), "eager rewrite diverged from the late aggregate")
    assert(eager._2 * 3L <= late._2, s"eager must cut join input >= 3x: ${rows.toSeq}")
    assert(late._4 >= 5000L)
    assert(eager._5 == 1L && late._5 == 0L)
  }

  test("q407 join elimination: the RI audit predicts the measured truth in both scenarios") {
    val rows = SparkEntry.queries("q407_join_elim_ri")(spark, sf001)
      .select("scenario", "orphans", "eliminate", "equal_results", "audit_correct")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    val Array(full, filtered) = rows
    assert(full._2 == 0L && full._3 == 1L && full._4 == 1L,
      s"full-dim RI must hold and results match: $full")
    assert(filtered._2 > 0L && filtered._3 == 0L && filtered._4 == 0L,
      s"filtered dim must orphan FKs and DIVERGE: $filtered")
    assert(rows.forall(_._5 == 1L), "the audit failed to predict a scenario")
  }

  test("q408 semi-join rewrite: all three shapes agree, the semi-join is the unique cheapest") {
    val rows = SparkEntry.queries("q408_exists_semijoin")(spark, sf001)
      .select("variant", "rows_out_of_join", "extra_shuffle_rows", "cost_rows",
        "qual_orders", "equal_all", "chosen")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows.forall(_._6 == 1L), "the three shapes disagreed on the rollup")
    val naive = rows(0); val semi = rows(1); val agg = rows(2)
    // the naive shape pays its duplicate blowup twice (join out + the
    // distinct's re-shuffle); the semi-join never materializes it
    assert(naive._4 >= 2L * semi._4, s"naive cost must dwarf semi: $naive vs $semi")
    assert(semi._3 == 0L && semi._2 == semi._5)
    assert(agg._3 > 0L, "agg rewrite must pay its keyed shuffle")
    assert(rows.filter(_._7 == 1L).map(_._1).toSeq == Seq("2:semi_join"))
  }

  test("q409 transitive closure: equivalence holds, ~94% of fact rows never reach the join") {
    val rows = SparkEntry.queries("q409_transitive_pred")(spark, sf001)
      .select("variant", "fact_rows_into_join", "equal_results", "saved_bp", "chosen")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows.forall(_._3 == 1L), "the inferred filter changed the result")
    assert(rows.head._4 >= 9000L, s"the mid-band range must drop >= 90%: ${rows.toSeq}")
    assert(rows(1)._5 == 1L && rows(0)._5 == 0L)
  }

  test("q410 scan sharing: both reports derived exactly, one scan instead of two") {
    val rows = SparkEntry.queries("q410_scan_sharing")(spark, sf001)
      .select("variant", "scanned_rows", "state_rows", "equal_results", "chosen")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    val Array(two, shared) = rows
    assert(rows.forall(_._4 == 1L), "a cube-derived report diverged from its direct computation")
    assert(two._2 == 2L * shared._2, "sharing must halve the scan exactly")
    assert(shared._3 <= 6L, s"the micro-cube must stay at the (flag x status) grain: $shared")
    assert(shared._5 == 1L && two._5 == 0L)
  }

  test("q411 the dual: chosen flips to join-first on the same algebra q406 decided the other way") {
    val rows = SparkEntry.queries("q411_agg_pushdown_dual")(spark, sf001)
      .select("variant", "agg_input_rows", "agg_state_keys", "equal_results", "saved_bp", "chosen")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 2)
    val Array(aggFirst, joinFirst) = rows
    assert(rows.forall(_._4 == 1L), "the pushed shape diverged")
    assert(joinFirst._2 * 5L <= aggFirst._2 && joinFirst._3 * 5L <= aggFirst._3,
      s"join-first must shrink input AND state >= 5x: ${rows.toSeq}")
    assert(joinFirst._6 == 1L && aggFirst._6 == 0L)
    // the arc's central claim: q406 chose agg-below-join, this chooses
    // join-below-agg — same algebra, opposite measured verdicts
    val q406Chosen = SparkEntry.queries("q406_eager_aggregation")(spark, sf001)
      .where("chosen = 1").select("variant").as[String].head()
    assert(q406Chosen == "2:eager_agg" && joinFirst._1 == "2:join_first")
  }
}
