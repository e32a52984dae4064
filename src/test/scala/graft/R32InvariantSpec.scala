package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of q317: deadline bounds and true minimality of
  * the lexicographic match policy.
  */
class R32InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q317 pattern match: lags within deadlines, chosen triple is the lexicographic minimum") {
    val df = SparkEntry.queries("q317_event_pattern")(spark, sf001).cache()
    try {
      assert(df.count() > 0, "pattern fixture is dead at sf0.001")
      assert(df.where(col("click_lag_s") <= 0 || col("click_lag_s") > 43200).count() == 0)
      assert(df.where(col("purchase_lag_s") <= 0 || col("purchase_lag_s") > 86400).count() == 0)
      assert(df.where(col("span_s") =!=
        col("click_lag_s") + col("purchase_lag_s")).count() == 0)
      assert(df.where(col("n_matches") < 1).count() == 0)
      // minimality: no valid triple for the user starts strictly before
      // the reported view_es — re-derive candidates independently
      val ev = Tables.events(spark, sf001)
        .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("es"))
      def leg(t: String, a: String) =
        ev.where(col("event_type") === t).select(col("user_id"), col("es").as(a))
      val earlier = leg("view", "tv")
        .join(leg("click", "tc"), "user_id")
        .where(col("tc") > col("tv") && col("tc") <= col("tv") + 43200L)
        .join(leg("purchase", "tp"), "user_id")
        .where(col("tp") > col("tc") && col("tp") <= col("tc") + 86400L)
        .groupBy("user_id").agg(min("tv").as("first_tv"))
        .join(df.select(col("user_id"), col("view_es")), "user_id")
        .where(col("first_tv") < col("view_es"))
      assert(earlier.count() == 0,
        "a valid pattern instance starts before the reported earliest match")
    } finally df.unpersist()
  }

  test("q318 gap detector: conservation per series, planted outage recovered exactly") {
    val rows = SparkEntry.queries("q318_calendar_gaps")(spark, sf001)
      .select("event_type", "span_days", "n_present", "n_missing", "n_gaps",
        "longest_gap_days")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet ==
      Set("click", "error", "purchase", "signup", "view"))
    rows.foreach { case (t, span, present, missing, gaps, longest) =>
      // densified calendar conserves: present + missing == span
      assert(present + missing == span, s"$t: $present + $missing != $span")
      assert(longest <= missing)
      assert((gaps == 0) == (missing == 0))
      if (t != "error") assert(missing == 0, s"$t reported phantom gaps")
    }
    // the planted outage (day-of-month % 7 == 3 within the span) must be
    // recovered exactly on the 'error' series
    val err = rows.find(_._1 == "error").get
    val expected = Tables.events(spark, sf001)
      .where(col("event_type") === "error")
      .select(to_date(col("ts")).as("day")).distinct()
      .where(dayofmonth(col("day")) % 7 === 3).count()
    assert(err._4 == expected,
      s"outage-day count ${err._4} != planted $expected")
  }
}
