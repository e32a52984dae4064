package graft

import org.apache.spark.sql.functions._

/** Semantics pins for the round-2 coverage wave (WideQueries): reshaping
  * row-count identities, window-nav frames, ordered string aggregation,
  * and edit-distance basics. Value-exactness vs DuckDB is the oracle's
  * job; these pin the Spark-side semantics on literal data.
  */
class WideQueriesSpec extends SparkSpecBase {
  import spark.implicits._

  test("q74 unpivot emits exactly one row per (input row × measure)") {
    val n = Tables.load(spark, sf001, "lineitem").count()
    val got = SparkEntry.queries("q74_unpivot")(spark, sf001)
    assert(got.count() == 3 * n)
    assert(got.select("measure").distinct().count() == 3)
  }

  test("q77 window nav: lead/first/last/nth over a literal partition") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 2.0), (1L, 12L, 3.0))
      .toDF("k", "id", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("id")
    val wf = w.rowsBetween(Long.MinValue, Long.MaxValue)
    val r = df.select(
        col("id"),
        coalesce(lead("v", 1).over(w), lit(-1.0)).as("nx"),
        first("v").over(wf).as("fv"),
        last("v").over(wf).as("lv"),
        coalesce(nth_value(col("v"), 2).over(wf), lit(-1.0)).as("n2"))
      .orderBy("id").as[(Long, Double, Double, Double, Double)].collect().toSeq
    assert(r == Seq((10L, 2.0, 1.0, 3.0, 2.0), (11L, 3.0, 1.0, 3.0, 2.0),
      (12L, -1.0, 1.0, 3.0, 2.0)))
  }

  test("q87 string agg concatenates in key order, not arrival order") {
    val df = Seq((1L, 3L, "c"), (1L, 1L, "a"), (1L, 2L, "b")).toDF("g", "k", "nm")
    val got = df.groupBy("g")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("k"), col("nm")))),
          x => x.getField("nm")), "|").as("names"))
      .select("names").as[String].collect().head
    assert(got == "a|b|c")
  }

  test("q86 levenshtein basics: identity zero, known distance, symmetry") {
    val r = spark.range(1).select(
      levenshtein(lit("kitten"), lit("kitten")).as("same"),
      levenshtein(lit("kitten"), lit("sitting")).as("ks"),
      levenshtein(lit("sitting"), lit("kitten")).as("sk"))
      .as[(Int, Int, Int)].collect().head
    assert(r == ((0, 3, 3)))
  }

  test("q76 grouping sets yields rows for each set and correct gid flags") {
    val got = SparkEntry.queries("q76_grouping_sets")(spark, sf001)
      .select("gid").distinct().as[Long].collect().toSet
    // (l_returnflag) → status aggregated (gid 1); (l_linestatus) → gid 2;
    // () → both aggregated (gid 3)
    assert(got == Set(1L, 2L, 3L))
  }

  test("q85 window dedup keeps exactly one row per (user, type)") {
    val got = SparkEntry.queries("q85_window_dedup")(spark, sf001)
    assert(got.count() ==
      got.select("user_id", "event_type").distinct().count())
  }

  /** Events fixture: ts given in SECONDS, stored as LONG nanos exactly
    * like the real TIMESTAMP(NANOS) table reads under nanosAsLong.
    */
  private def eventsDir(rows: (Long, Long, Long, String, Double)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("wq").toString
    rows.map { case (id, sec, uid, typ, v) =>
      (id, sec * 1000000000L, uid, typ, v, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q115 forward-fills gap hours with the last observed hourly average") {
    // user 1: events in hour 0 (v=2) and hour 2 (v=4) → hour 1 is a gap
    // carrying 2.0 forward
    val d = eventsDir((1, 100, 1, "click", 2.0), (2, 7300, 1, "click", 4.0))
    val got = SparkEntry.queries("q115_forward_fill")(spark, d)
      .select("hr", "filled", "is_gap").as[(Long, Double, Int)].collect().toSeq
    assert(got == Seq((0L, 2.0, 0), (3600L, 2.0, 1), (7200L, 4.0, 0)))
  }

  test("q119 converts only when a purchase follows the first in-session click") {
    val d = eventsDir(
      (1, 0, 1, "click", 1.0), (2, 60, 1, "purchase", 1.0), // click→purchase ⇒ 1
      (3, 0, 2, "purchase", 1.0), (4, 60, 2, "click", 1.0), // purchase first ⇒ 0
      (5, 0, 3, "click", 1.0))                              // no purchase ⇒ 0
    val got = SparkEntry.queries("q119_session_funnel")(spark, d)
      .select("user_id", "converted").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("q118 group shares sum to ~1 within each partition") {
    val got = SparkEntry.queries("q118_pct_of_total")(spark, sf001)
      .groupBy("l_returnflag").agg(sum("pct").as("s"))
      .select("s").as[Double].collect()
    assert(got.nonEmpty && got.forall(s => math.abs(s - 1.0) <= 0.0002))
  }

  test("q75 map probe returns the bound values") {
    val r = Seq((7.0, 0.04)).toDF("q", "t")
      .select(element_at(map(lit("qty"), col("q"), lit("tax"), col("t")), "qty").as("v"),
        size(map_keys(map(lit("qty"), col("q"), lit("tax"), col("t")))).as("n"))
      .as[(Double, Int)].collect().head
    assert(r == ((7.0, 2)))
  }
}
