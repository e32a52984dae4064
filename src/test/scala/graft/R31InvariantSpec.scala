package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of q315/q316: fold algebra on a constant series
  * and internal consistency of the reported forecast / change point.
  */
class R31InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q315 Holt fold: constant series yields level = value, trend = 0") {
    // the exact fold expression the query ships, on a constant series —
    // level must converge to the constant, trend must stay identically 0
    val row = spark.sql(
      """SELECT aggregate(
        |  slice(array(5.0d, 5.0d, 5.0d, 5.0d), 2, 3),
        |  named_struct('lv', 5.0d, 'tr', cast(0.0 as double)),
        |  (acc, x) -> named_struct(
        |    'lv', 0.5 * x + 0.5 * (acc.lv + acc.tr),
        |    'tr', 0.3 * ((0.5 * x + 0.5 * (acc.lv + acc.tr)) - acc.lv)
        |          + 0.7 * acc.tr)) AS st""".stripMargin)
      .select(col("st.lv"), col("st.tr")).as[(Double, Double)].head()
    assert(row._1 == 5.0 && row._2 == 0.0)
    // reference values on [1,2,3,4] (hand-computed): pins the exact
    // fold semantics the DuckDB oracle must reproduce — this is the
    // case that exposed DuckDB's struct-accumulator field mutation
    // (see the q315 oracle comment), where the same fold returned
    // (3.276875, 0.302906) instead
    val ref = spark.sql(
      """SELECT aggregate(
        |  slice(array(1.0d, 2.0d, 3.0d, 4.0d), 2, 3),
        |  named_struct('lv', 1.0d, 'tr', cast(0.0 as double)),
        |  (acc, x) -> named_struct(
        |    'lv', 0.5 * x + 0.5 * (acc.lv + acc.tr),
        |    'tr', 0.3 * ((0.5 * x + 0.5 * (acc.lv + acc.tr)) - acc.lv)
        |          + 0.7 * acc.tr)) AS st""".stripMargin)
      .select(col("st.lv"), col("st.tr")).as[(Double, Double)].head()
    assert(ref == ((3.33875, 0.550875)), s"Holt fold drifted: $ref")
  }

  test("q315 forecast is level + 7*trend within rounding; q316 change point inside the series") {
    val holt = run("q315_holt_trend")
      .select("event_type", "n_days", "level", "trend", "forecast_7d")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(holt.nonEmpty)
    holt.foreach { case (_, n, lv, tr, f) =>
      assert(n >= 1)
      assert(math.abs(f - (lv + 7 * tr)) <= 2e-3,
        s"forecast $f inconsistent with level $lv + 7*trend $tr")
    }
    val ev = Tables.events(spark, sf001)
      .agg(date_format(min(to_date(col("ts"))), "yyyy-MM-dd"),
        date_format(max(to_date(col("ts"))), "yyyy-MM-dd"))
      .as[(String, String)].head()
    val cp = run("q316_cusum_changepoint")
      .select("event_type", "cp_day", "peak_abs_cusum")
      .as[(String, String, Double)].collect()
    assert(cp.nonEmpty)
    cp.foreach { case (_, day, peak) =>
      assert(peak >= 0.0)
      assert(day >= ev._1 && day <= ev._2,
        s"change point $day outside the observed calendar [${ev._1}, ${ev._2}]")
    }
  }
}
