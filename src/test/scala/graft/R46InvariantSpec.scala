package graft

/** Semantic invariants of q366–q368 (join-view IVM, watermark chooser,
  * delete-strategy chooser).
  */
class R46InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q366 join-view IVM: fingerprinted identity holds all three ways, delta moves a segment") {
    val rows = SparkEntry.queries("q366_join_view_ivm")(spark, sf001)
      .select("scenario", "ivm_n", "full_n", "ivm_ck", "full_ck", "matches")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 15, s"expected 5 segments x 3 scenarios: ${rows.length}")
    rows.foreach(r => assert(r._6 == 1, s"maintenance identity broken: $r"))
    // the fingerprint is not vacuous: checksums are large and distinct
    assert(rows.map(_._4).distinct.length >= 5, "fingerprints collapsed")
    // the delta day contributed rows (insert totals exceed base totals)
    val ins = rows.filter(_._1 == "insert_delta").map(_._2).sum
    val del = rows.filter(_._1 == "delete_delta").map(_._2).sum
    assert(ins > del, s"delta day empty: $ins vs $del")
    // the update path preserves TOTAL mass (a segment flip moves rows,
    // never creates or destroys them) while actually moving fingerprint
    // mass between segments relative to the insert snapshot
    val upd = rows.filter(_._1 == "update_delta")
    assert(upd.map(_._2).sum == ins, s"update changed total row count: ${upd.toSeq}")
    val insCks = rows.filter(_._1 == "insert_delta").map(_._4).sorted.toSeq
    assert(upd.map(_._4).sorted.toSeq != insCks,
      "update scenario did not move any fingerprint mass between segments")
  }

  test("q366 certification is fail-loud: a one-sided segment surfaces as matches=0, never vanishes") {
    // the ADVICE-r10 hazard planted directly through the production
    // full-outer core (jvCertify): the maintained side carries a segment
    // the recompute lacks AND vice versa — an inner-join certification
    // would silently drop both rows and grade the scenario green
    import graft.queries.R46Queries
    import org.apache.spark.sql.functions.expr
    val got = Seq(("AUTO", 3L, 111L), ("GHOST", 2L, 999L))
      .toDF("seg", "ivm_n", "ivm_ck")
    val want = Seq(("AUTO", 3L, 111L), ("LOST", 4L, 555L))
      .toDF("seg", "n", "ck")
    val rows = R46Queries.jvCertify("t", got, want)
      .withColumn("matches",
        expr("CAST(CASE WHEN ivm_n = full_n AND ivm_ck = full_ck THEN 1 ELSE 0 END AS BIGINT)"))
      .select("seg", "ivm_n", "full_n", "matches")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 3, s"one-sided segments vanished: ${rows.toSeq}")
    assert(rows.find(_._1 == "AUTO").get._4 == 1)
    val ghost = rows.find(_._1 == "GHOST").get
    assert(ghost._2 == 2L && ghost._3 == 0L && ghost._4 == 0,
      s"got-only segment must grade matches=0 against an empty want side: $ghost")
    val lost = rows.find(_._1 == "LOST").get
    assert(lost._2 == 0L && lost._3 == 4L && lost._4 == 0,
      s"want-only segment must grade matches=0 against an empty got side: $lost")
  }

  test("q367 watermark chooser: loss monotone in W, argmin lands on the shipped 1-hour watermark") {
    val rows = SparkEntry.queries("q367_watermark_chooser")(spark, sf001)
      .select("w_s", "n_dropped", "loss_bp", "meets_budget", "chosen")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 6)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"drops not monotone in W: $a -> $b") }
    val chosen = rows.filter(_._5 == 1)
    assert(chosen.length == 1 && chosen.head._4 == 1)
    // the planted tail is 1-4h, so exactly W = 3600 is the smallest
    // setting under the 0.2% budget — the streaming layer's own value
    assert(chosen.head._1 == 3600L,
      s"chooser moved off the 1-hour watermark: ${rows.toSeq}")
    assert(rows.find(_._1 == 900L).get._4 == 0, "15 minutes must miss the budget")
  }

  test("q368 delete chooser: amplification falls with request size, crossover to copy-on-write") {
    val rows = SparkEntry.queries("q368_delete_strategy_chooser")(spark, sf001)
      .select("req", "victim_rows", "files_touched", "rewrite_rows", "amp_x10", "strategy")
      .as[(Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"victims not monotone: $a -> $b")
      assert(b._5 <= a._5, s"amplification not falling: $a -> $b")
    }
    rows.foreach(r => assert(r._4 >= r._2, s"rewrite smaller than victims: $r"))
    // the rule-of-thumb crossover is real on this layout: the smallest
    // request is MoR, the largest is CoW
    assert(rows.head._6 == "merge_on_read" && rows.last._6 == "copy_on_write",
      s"no CoW/MoR crossover: ${rows.toSeq}")
  }
}
