package graft

/** Semantic invariants of q369–q370. */
class R47InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q369 partial-agg pricing: bound respected, decisions split the battery") {
    val rows = SparkEntry.queries("q369_partial_agg_pricing")(spark, sf001)
      .select("group_key", "n", "ndv", "map_out", "bound_map_out", "decision")
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r._4 >= r._3, s"map_out below ndv is impossible: $r")
      assert(r._4 <= r._5, s"map_out above the closed-form bound: $r")
      assert(r._4 <= r._2, s"combiner cannot emit more than its input: $r")
    }
    // the battery must exercise BOTH decisions: tiny enums combine,
    // the near-unique key skips
    assert(rows.find(_._1 == "l_returnflag").get._6 == "combine")
    assert(rows.find(_._1 == "l_orderkey").get._6 == "skip_partial")
  }

  test("q370 drift gate: only the planted label alarms, honest labels sit at the null") {
    val rows = SparkEntry.queries("q370_embedding_drift_gate")(spark, sf001)
      .select("label", "n_old", "n_new", "z", "alarm")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(rows.length == 10)
    val planted = rows.find(_._1 == 0L).get
    assert(planted._5 == 1 && planted._4 >= 3.0, s"planted drift not caught: $planted")
    val honest = rows.filter(_._1 != 0L)
    honest.foreach(r => assert(r._5 == 0, s"honest label alarmed: $r"))
    // the normalized statistic concentrates near 1 under the null —
    // the property that makes the gate batch-size-free
    honest.foreach(r => assert(r._4 > 0.4 && r._4 < 1.8, s"null z off-scale: $r"))
  }
}
