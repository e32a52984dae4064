package graft

/** Semantic invariants of the round-8 experimentation/vocab widening
  * (q337–q340): CUPED's mean-preservation identity and planted
  * correlation, the Theil–Sen pair-count algebra, the A/A sweep's
  * calibration bound, and the coverage curve's monotone self-check.
  */
class R37InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q337 CUPED preserves the pooled mean and the planted cohort makes rho2 real") {
    val rows = run("q337_cuped")
      .select("n_users", "post_clicks", "raw_mean", "adj_mean", "theta", "var_reduction")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.length == 2)
    // Σ na·adj == Σ y: the adjustment redistributes between arms but
    // cannot move the pooled mean (Σ(xa − na·mx) telescopes to 0)
    val sy = rows.map(_._2).sum.toDouble
    val adjTotal = rows.map(r => r._1 * r._4).sum
    assert(math.abs(adjTotal - sy) < 0.1, s"CUPED moved the pooled mean: $adjTotal vs $sy")
    rows.foreach { r =>
      assert(r._6 >= 0.0 && r._6 <= 1.0)
      // planted power users covary perfectly → theta and rho² far from 0
      assert(r._5 > 0.5 && r._6 > 0.5, s"planted correlation not visible: $r")
    }
  }

  test("q338 pair counts follow the calendar: n_pairs == C(n_days, 2) per type") {
    val rows = run("q338_theilsen_trend")
      .select("n_days", "n_pairs").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, np) =>
      assert(np == nd * (nd - 1) / 2, s"pair count $np != C($nd, 2)")
    }
  }

  test("q339 A/A sweep is calibrated: both arms populated, false-positive share bounded") {
    val rows = run("q339_aa_calibration")
      .select("n1", "n0", "is_sig").as[(Long, Long, Long)].collect()
    assert(rows.length == 50)
    rows.foreach { case (n1, n0, _) => assert(n1 >= 1 && n0 >= 1) }
    // null is true by construction: expect ~2.5 of 50 at the 5% level;
    // 10 is > 4 binomial sds above that — a broken hash would blow this
    val sig = rows.map(_._3).sum
    assert(sig <= 10, s"A/A false-positive count $sig of 50 — randomizer suspect")
  }

  test("q340 coverage is monotone in K and the full-vocab row is the exact self-check") {
    val rows = run("q340_vocab_coverage")
      .select("lang", "k", "covered", "total_tokens", "coverage_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byK = rs.sortBy(_._2)
      assert(byK.map(_._2).toSeq == Seq(4L, 8L, 16L, 31L))
      val cov = byK.map(_._5)
      assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
        s"$lang coverage not monotone: ${cov.toSeq}")
      assert(byK.last._3 == byK.last._4 && byK.last._5 == 10000L,
        s"$lang full-vocab self-check row broken: ${byK.last}")
    }
  }
}
