package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of q313/q314: the k-core property + fixpoint
  * convergence of the bounded peel, and completeness of the bucketed
  * interval join against a brute-force all-pairs recompute.
  */
class R30InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q313 k-core: degree floor holds on both sides, edge counts agree, peel has converged") {
    val rows = run("q313_kcore")
      .select("side", "n_nodes", "min_deg", "n_edges")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("customer", "part"))
    // the defining k-core property: every surviving node has degree >= 3
    rows.foreach { case (_, n, minDeg, _) => if (n > 0) assert(minDeg >= 3) }
    // both sides count the same surviving edge set
    assert(rows(0)._4 == rows(1)._4)
    // fixpoint: a 4th peel removes nothing — the bounded unroll IS the
    // k-core at this SF, not an approximation of it
    val e3 = graft.queries.R30Queries.coreEdges(spark, sf001, 3)
    val e4 = graft.queries.R30Queries.peel(e3, 3)
    assert(e4.count() == e3.count(),
      "a 4th peel still removed edges — 3 unrolled rounds did not converge at sf0.001")
  }

  test("q314 bucketed interval join equals brute-force all-pairs on the same sessions") {
    // bucketing is a PREFILTER: two overlapping intervals always share
    // at least one hour bucket, so the bucketed join must be COMPLETE.
    // Recompute the answer with an unfiltered all-pairs session join
    // (feasible at sf0.001 only) and require set equality.
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"), col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("es", "event_id")
    val sess = ev
      .withColumn("brk",
        when(col("es") - lag("es", 1).over(w) > 1800, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("es").as("st"), max("es").as("en"))
      .cache()
    try {
      val a = sess.select(col("user_id").as("ua"), col("st").as("sta"), col("en").as("ena"))
      val b = sess.select(col("user_id").as("ub"), col("st").as("stb"), col("en").as("enb"))
      val brute = a.crossJoin(b)
        .where(col("ua") < col("ub"))
        .select(col("ua"), col("ub"),
          greatest(lit(0L),
            least(col("ena"), col("enb")) - greatest(col("sta"), col("stb"))).as("ov"))
        .where(col("ov") > 0)
        .groupBy("ua", "ub")
        .agg(count(lit(1)).as("n_overlapping_sessions"), sum("ov").as("concurrent_s"))
        .orderBy(col("concurrent_s").desc, col("ua"), col("ub"))
        .limit(20)
      val got = run("q314_session_overlap")
      assert(got.except(brute).count() == 0 && brute.except(got).count() == 0,
        "bucket-prefiltered interval join diverged from brute-force all-pairs")
    } finally sess.unpersist()
  }
}
