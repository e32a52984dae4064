package graft

/** Semantic invariants of q371–q372. */
class R48InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q371 Neyman: the planted stratum dominates sigma, pulls budget, and the gain is real") {
    val rows = SparkEntry.queries("q371_neyman_allocation")(spark, sf001)
      .select("lang", "sigma_centi", "alloc_prop", "alloc_neyman", "var_prop",
        "var_neyman", "gain_bp")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 6)
    val planted = rows.find(_._1 == "zz_mixed").get
    val natural = rows.filter(_._1 != "zz_mixed")
    assert(planted._2 > 2 * natural.map(_._2).max,
      s"planted stratum is not high-variance: ${rows.toSeq}")
    // Neyman moves budget toward the heterogeneous stratum...
    assert(planted._4 > planted._3, s"no budget moved to the planted stratum: $planted")
    // ...and the total estimator variance drops for real
    assert(rows.head._7 >= 500, s"variance gain under 5%: ${rows.head._7} bp")
    assert(rows.map(_._7).distinct.length == 1, "gain must be the one global readout")
  }

  test("q372 gate chooser: recall/retention monotone, chosen is max recall under the floor") {
    val rows = SparkEntry.queries("q372_quality_gate_chooser")(spark, sf001)
      .select("t_bp", "junk_recall_bp", "retention_bp", "meets_retention", "chosen")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 8 && rows.count(_._5 == 1) == 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"junk recall must rise with T: $a -> $b")
      assert(b._3 <= a._3, s"retention must fall with T: $a -> $b")
    }
    // the lowest threshold misses the fragment plants; the chosen one
    // catches all junk while clearing the retention floor
    assert(rows.head._2 < 10000, "T=100 should not already catch the fragments")
    val chosen = rows.find(_._5 == 1).get
    assert(chosen._4 == 1 && chosen._2 == 10000,
      s"chosen cutoff wrong: ${rows.toSeq}")
    val bestRecall = rows.filter(_._4 == 1).map(_._2).max
    assert(chosen._2 == bestRecall, "chosen is not the recall argmax under the floor")
  }
}
