package graft

/** Semantic invariant of q355: the IVM identities hold in BOTH
  * directions on the real corpus — merge(base, delta) == recompute and
  * retract(recompute, delta) == base — with a non-trivial delta.
  */
class R42InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q355 maintenance identities hold both ways with a non-trivial delta") {
    val rows = SparkEntry.queries("q355_ivm_delta")(spark, sf001)
      .select("scenario", "ivm_n", "full_n", "matches")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 12, s"expected 6 groups x 2 scenarios: ${rows.length}")
    assert(rows.count(_._1 == "insert_delta") == 6)
    rows.foreach(r => assert(r._4 == 1, s"maintenance identity broken: $r"))
    // the delta must actually move something: the stale MV and the full
    // MV cannot be identical everywhere (max ship day has rows)
    val ins = rows.filter(_._1 == "insert_delta").map(_._2).sum
    val del = rows.filter(_._1 == "delete_delta").map(_._2).sum
    assert(ins > del, s"delta day contributed no rows: insert total $ins vs base total $del")
  }
}
