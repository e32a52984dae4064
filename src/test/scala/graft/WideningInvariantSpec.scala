package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-5 widening families (q211–q225) that
  * the value-equality oracle cannot express: the one-sided sketch
  * guarantees (CMS never underestimates, Bloom never misses), SCD2
  * interval algebra (contiguity, single current row), BFS monotonicity,
  * CDC reconciliation conservation, and RRF leg membership. All run the
  * REGISTERED queries against sf0.001, so the pinned behavior is exactly
  * what the driver verifies and benches.
  */
class WideningInvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q211 KMV: weeks with fewer than k distinct hashes are EXACT, estimates positive") {
    val rows = run("q211_kmv_sketch")
      .select("n_exact", "n_est").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est) =>
      assert(est > 0)
      // m < 32 ⇒ the sketch IS the value set (distinct user hashes may
      // collide only with ~2^-60 probability, so exact means exact here)
      if (exact < 32) assert(est == exact)
    }
  }

  test("q212 CMS: one-sided guarantee — estimate never below the exact count") {
    val bad = run("q212_cms_topk").where(col("overest") < 0).count()
    assert(bad == 0)
  }

  test("q216 Bloom: no false negatives (n_bloom >= n_exact), fp non-negative") {
    val df = run("q216_bloom_contam").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("n_bloom") < col("n_exact")).count() == 0)
      assert(df.where(col("n_fp") < 0).count() == 0)
    } finally df.unpersist()
  }

  test("q217 SCD2: intervals contiguous per customer, exactly one current version") {
    val df = run("q217_scd2_build").cache()
    try {
      // exactly one open (is_current) version per customer
      val multiCurrent = df.groupBy("o_custkey")
        .agg(sum("is_current").as("nc")).where(col("nc") =!= 1).count()
      assert(multiCurrent == 0)
      // each version's valid_to equals the next version's valid_from
      // (contiguity — no gaps, no overlaps in the interval chain)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("ver")
      val broken = df
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .where(col("next_from").isNotNull && col("valid_to") =!= col("next_from"))
        .count()
      assert(broken == 0)
      // versions collapse runs: adjacent versions must differ in prio
      val sameAdjacent = df
        .withColumn("next_prio", lead("prio", 1).over(w))
        .where(col("next_prio").isNotNull && col("prio") === col("next_prio"))
        .count()
      assert(sameAdjacent == 0)
    } finally df.unpersist()
  }

  test("q214 BFS: cumulative reach is strictly increasing and consistent with n_new") {
    val rows = run("q214_khop_reach")
      .orderBy("hop").select("n_new", "n_reached").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.head._1 == rows.head._2)
    // n_reached is the running sum of n_new (every hop adds new nodes)
    val cum = rows.map(_._1).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_._2).toSeq == cum.toSeq)
    rows.foreach { case (nNew, _) => assert(nNew > 0) }
  }

  test("q225 CDC: row conservation — ops partition base ∪ inserts") {
    val ops = run("q225_cdc_merge")
      .select("op", "n_rows").as[(String, Long)].collect().toMap
    val base = Tables.load(spark, sf001, "customer").count()
    val inserts = ops.getOrElse("insert", 0L)
    assert(ops.getOrElse("delete", 0L) + ops.getOrElse("update", 0L) +
      ops.getOrElse("unchanged", 0L) == base)
    assert(inserts > 0)
  }

  test("q220 RRF: every fused doc appears in at least one leg; score matches ranks") {
    val rows = run("q220_rrf_hybrid")
      .select("r_lex", "r_sem", "rrf").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (rl, rs, rrf) =>
      assert(rl > 0 || rs > 0)
      val want = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60 + rs) else 0.0)
      assert(math.abs(rrf - want) < 5e-7) // rrf is round(want, 6)
    }
  }

  test("q218 salted join: equals the plain unsalted join on every group") {
    val salted = run("q218_salted_join")
    val li = Tables.load(spark, sf001, "lineitem")
    val sup = Tables.load(spark, sf001, "supplier")
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("q223 EWMA: lies within the daily-mean envelope per type") {
    val rows = run("q223_ewma_daily").cache()
    try {
      val env = Tables.events(spark, sf001)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(avg("value").as("av"))
        .groupBy("event_type").agg(min("av").as("mn"), max("av").as("mx"))
      val bad = rows.join(env, "event_type")
        .where(col("ewma") < col("mn") - 1e-4 || col("ewma") > col("mx") + 1e-4)
        .count()
      assert(bad == 0)
    } finally rows.unpersist()
  }
}
