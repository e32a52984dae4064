package graft

/** Semantic invariants of the round-8 statistics loop closers
  * (q353–q354): the advisor's argmin is correct against ground truth on
  * this corpus, and FD mining discovers exactly the key's dependencies.
  */
class R41InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q353 advisor picks the true cheaper order and estimates stay near truth") {
    val rows = run("q353_join_order_advisor")
      .select("join_order", "est_intermediate", "act_intermediate", "qerr_bp", "chosen")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    val chosen = rows.filter(_._5 == 1)
    assert(chosen.length == 1, s"exactly one order must be chosen: ${rows.toSeq}")
    // the estimate-argmin must agree with the exact-cardinality argmin —
    // the whole point of shipping ANALYZE-grade stats
    assert(chosen.head._3 == rows.map(_._3).min,
      s"advisor picked the more expensive order: ${rows.toSeq}")
    // customer-first keeps per-order fan-out at 1, lineitem-first ~4x
    assert(chosen.head._1 == "orders->customer first", s"unexpected pick: ${rows.toSeq}")
    rows.foreach { r =>
      assert(r._4 >= 10000 && r._4 <= 30000, s"estimate q-error out of band: $r")
    }
  }

  test("q354 mining discovers exactly the key's five dependencies") {
    val rows = run("q354_fd_mining")
      .select("det", "dep", "n_det", "n_viol_det", "max_dep", "fd_holds")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.length == 30)
    val holds = rows.filter(_._6 == 1)
    // the key's five dependencies must be discovered...
    assert(holds.count(_._1 == "p_partkey") == 5,
      s"key FDs not all discovered: ${holds.toSeq}")
    val nPart = spark.read.parquet(s"$sf001/part.parquet").count()
    // ...and anything else that holds must itself be key-cardinality (at
    // tiny SFs p_retailprice is incidentally unique — a REAL discovery,
    // not a bug; what can never happen is a non-unique determinant
    // holding on this generator)
    val byDet = rows.groupBy(_._1).map { case (det, rs) => det -> rs.map(_._3).head }
    holds.foreach(h => assert(byDet(h._1) == nPart,
      s"non-key determinant claims an FD: $h"))
    rows.filter(_._1 == "p_partkey").foreach(r =>
      assert(r._3 == nPart, s"key determinant NDV != rows: $r"))
    rows.foreach { r =>
      assert(r._4 <= r._3, s"violations exceed determinants: $r")
      assert((r._6 == 1) == (r._5 == 1), s"holds flag inconsistent with max fan-out: $r")
      assert((r._6 == 1) == (r._4 == 0), s"holds flag inconsistent with violations: $r")
    }
  }
}
