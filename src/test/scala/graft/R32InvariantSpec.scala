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
}
