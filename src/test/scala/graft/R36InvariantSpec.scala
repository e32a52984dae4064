package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 measurement/governance widening
  * (q331–q336): contingency-table identities, shrinkage direction, the
  * BH step-up contract and its planted segments, the planted outage
  * day, planted-bitext recovery with margin separation, and the Gini
  * grid's algebraic bounds.
  */
class R36InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q331 contingency tables are marginal-consistent and kappa is bounded") {
    val rows = run("q331_rater_agreement")
      .select("pair", "n11", "n10", "n01", "n00", "kappa")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("len_stop", "len_ttr", "stop_ttr"))
    val ns = rows.values.map(r => r._2 + r._3 + r._4 + r._5).toSet
    assert(ns.size == 1, s"pair tables disagree on n: $ns")
    // the len rater's positive marginal must be identical whichever
    // second rater it is tabled against
    assert(rows("len_stop")._2 + rows("len_stop")._3 ==
      rows("len_ttr")._2 + rows("len_ttr")._3)
    // and stop's positive marginal: column of len_stop == row of stop_ttr
    assert(rows("len_stop")._2 + rows("len_stop")._4 ==
      rows("stop_ttr")._2 + rows("stop_ttr")._3)
    rows.values.foreach(r => assert(r._6 >= -1.0 && r._6 <= 1.0))
  }

  test("q332 shrinkage moves every rate toward the pooled mean, never past it") {
    val rs = run("q332_eb_ctr_shrinkage")
      .select("v", "c", "ctr_micro", "shrunk_ctr", "prior_strength", "pulled_up")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(rs.nonEmpty)
    val pooled = rs.map(_._2).sum.toDouble / rs.map(_._1).sum.toDouble
    rs.foreach { case (_, _, pMicro, shr, k, up) =>
      val raw = pMicro / 1e6
      assert(k >= 1.0)
      // direction: strictly between raw and pooled (or equal at the
      // degenerate raw == pooled point, up to the micro-grid floor)
      val lo = math.min(raw, pooled) - 1e-6
      val hi = math.max(raw, pooled) + 1e-6
      assert(shr >= lo && shr <= hi, s"shrunk $shr outside [$lo, $hi]")
      assert((up == 1L) == (raw < pooled - 1e-12) ||
        math.abs(raw - pooled) < 2e-6)
    }
  }

  test("q333 BH rejections form a rank prefix; planted hot/cold reject, control survives") {
    val rs = run("q333_bh_fdr")
      .select("user_id", "k", "rejected")
      .as[(Long, Long, Long)].collect()
    val kstar = rs.filter(_._3 == 1L).map(_._2).maxOption.getOrElse(0L)
    rs.foreach { case (_, k, rej) =>
      assert((rej == 1L) == (k <= kstar), "rejections are not a rank prefix")
    }
    val byUser = rs.map(r => r._1 -> r._3).toMap
    assert(byUser(-1001L) == 1L, "planted hot segment not rejected")
    assert(byUser(-1002L) == 1L, "planted cold segment not rejected")
    assert(byUser(-1003L) == 0L, "planted at-rate control was rejected")
  }

  test("q334 flags the planted partial-outage day as a deseasonalized crater") {
    val rs = run("q334_dow_seasonality")
      .select("dk", "des_bp", "anomaly")
      .as[(Long, Long, Long)].collect()
    val outage = rs.find(_._1 == 19740L)
    assert(outage.isDefined, "planted outage day missing from the profile")
    assert(outage.get._3 == 1L && outage.get._2 < 8000L,
      s"outage day not flagged low: ${outage.get}")
    // NOT asserted: "deepest day" — at sf0.001 (~33 events/day) natural
    // Poisson swings reach 46% and can out-crater the planted 40% shed;
    // from sf0.01 up the planted day is the unique anomaly (measured in
    // the q334 comment), but the invariant keeps only the SF-robust part.
  }

  test("q335 planted twins come back mutual, hit, and margin-separated from organics") {
    val rs = run("q335_bitext_margin")
      .select("margin", "mutual", "is_planted", "is_hit")
      .as[(Double, Long, Long, Long)].collect()
    val (pl, nat) = rs.partition(_._3 == 1L)
    assert(pl.nonEmpty && nat.nonEmpty)
    pl.foreach { case (_, mu, _, hit) =>
      assert(mu == 1L && hit == 1L, "planted twin lost mutual-top1 or matched the wrong base")
    }
    assert(pl.map(_._1).min > nat.map(_._1).max,
      "planted margin does not dominate every organic margin")
  }

  test("q336 Gini grid: bounds hold and the two dims cover the same token mass") {
    val rs = run("q336_token_gini")
      .select("dim", "total_tokens", "gini_micro", "top10_bp")
      .as[(String, Long, Long, Long)].collect()
    val mass = rs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(mass("lang") == mass("source"), s"dims disagree on corpus mass: $mass")
    rs.foreach { case (_, _, g, t) =>
      assert(g >= 0L && g < 1000000L)
      // the top decile always carries at least its proportional share
      assert(t >= 999L, s"top-decile share $t below proportional floor")
    }
  }
}
