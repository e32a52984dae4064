package graft

/** Semantic invariants of the round-8 loop closers (q351–q352): the
  * bloom frontier's bit-load algebra and budget consistency, and the
  * layout chooser's argmin / shared-core identities.
  */
class R40InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q351 frontier cells obey the bit-load algebra and the budget flag") {
    val rows = run("q351_bloom_frontier")
      .select("m", "k", "n_keys", "bits_set", "filter_bytes", "fpr_pred", "meets_budget")
      .as[(Long, Long, Long, Long, Long, Double, Long)].collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(r._4 >= 1 && r._4 <= math.min(r._2 * r._3, r._1),
        s"bits_set outside [1, min(k*n, m)]: $r")
      assert(r._5 == r._1 / 8, s"filter bytes wrong: $r")
      assert(r._6 >= 0.0 && r._6 <= 1.0, s"fpr out of range: $r")
      assert((r._7 == 1) == (r._6 <= 0.01 + 1e-12), s"budget flag inconsistent: $r")
    }
    // for a fixed m, more hash families can only set more bits
    rows.groupBy(_._1).foreach { case (_, cells) =>
      cells.sortBy(_._2).map(_._4).sliding(2).foreach { case Array(a, b) =>
        assert(b >= a, s"bits_set not monotone in k: $cells")
      }
    }
    // the ordering IS the decision: if any cell meets budget, row 1 does
    val first = run("q351_bloom_frontier").select("meets_budget")
      .as[Long].collect().head
    if (rows.exists(_._7 == 1)) assert(first == 1, "chosen row does not meet budget")
  }

  test("q352 chooses the weighted argmin over the shared pricing core") {
    val rows = run("q352_layout_chooser")
      .select("layout", "w_files", "w_rows", "w_rows_exact", "amp_bp", "chosen")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    // same workload, same exact rows: the weighted truth is layout-free
    assert(rows.map(_._4).distinct.length == 1, s"exact rows differ by layout: $rows")
    rows.foreach(r => assert(r._5 >= 10000, s"scan amplification below 1: $r"))
    val best = rows.minBy(_._3)
    rows.foreach(r => assert((r._6 == 1) == (r._3 == best._3),
      s"chosen flag is not the argmin: $rows"))
    // the shared core ties q352 to q342: the weighted rows must equal the
    // 16-row pricing table folded with the same 3:1 weights
    val p = run("q342_zorder_pricing")
      .select("pred_key", "rows_lex", "rows_z", "rows_exact")
      .as[(String, Long, Long, Long)].collect()
    def w(k: String) = if (k == "l_suppkey") 3L else 1L
    val byLayout = rows.map(r => r._1 -> r._3).toMap
    assert(byLayout("lex") == p.map(x => w(x._1) * x._2).sum, "lex fold drifted from q342")
    assert(byLayout("zorder") == p.map(x => w(x._1) * x._3).sum, "zorder fold drifted from q342")
  }
}
