package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 widening (q304–q306) the value
  * oracle cannot express: set-level anchor/negative guarantees for the
  * contrastive miner and range/flag algebra for the hygiene audits.
  */
class R28InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q304 anchors are exactly the verified near-dup endpoints; negatives never positives") {
    val df = run("q304_contrastive_mining").cache()
    try {
      assert(df.count() > 0)
      // every anchor carries >= 1 positive and the margin identity holds
      assert(df.where(col("n_pos") < 1).count() == 0)
      assert(df.where(
        col("margin") =!= round(col("best_pos_cos") - col("hardest_neg_cos"), 6))
        .count() == 0)
      // anchors == endpoints of the verified edge list (both directions),
      // re-derived INDEPENDENTLY of the query's memoized index
      val dsh = graft.ops.DedupOps.shingleRows(
        Tables.load(spark, sf001, "documents"), "text", 5)
      val sets = dsh.groupBy("doc_id").agg(collect_list(col("s")).as("shs"))
      val edges = graft.ops.DedupOps.jaccardForPairs(
        graft.ops.DedupOps.candidatePairs(
          graft.ops.DedupOps.minhashSignatureRows(dsh, 4)), sets)
        .where(col("jaccard") >= 0.5)
      val endpoints = edges.select(col("a").as("doc_id"))
        .unionByName(edges.select(col("b").as("doc_id"))).distinct()
      assert(df.select("doc_id").except(endpoints).count() == 0)
      assert(endpoints.except(df.select("doc_id")).count() == 0)
      // a hard negative must exist only when n_hard > 0
      assert(df.where(col("n_hard") === 0 && col("hardest_neg_cos") =!= 0.0)
        .count() == 0)
    } finally df.unpersist()
  }

  test("q305 families: every family has >=3 docs, >=2 distinct texts, and a member rep id") {
    val df = run("q305_template_families").cache()
    try {
      assert(df.where(col("n_docs") < 3 || col("n_distinct_texts") < 2).count() == 0)
      assert(df.where(col("n_distinct_texts") > col("n_docs")).count() == 0)
    } finally df.unpersist()
  }

  test("q307 schedule: shares sum to ~10000 bp, cumulative mass ends at the total") {
    val rows = run("q307_curriculum_schedule")
      .select("bin", "tok_mass", "cum_mass", "share_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    // integer-div shares round down: sum in (10000 - nBins, 10000]
    val s = rows.map(_._4).sum
    assert(s <= 10000 && s > 10000 - rows.length)
    // rows come back in bin-desc order; cum_mass is the running total
    // and the last row's cum_mass is the corpus token mass
    assert(rows.map(_._2).scanLeft(0L)(_ + _).tail.sameElements(rows.map(_._3)))
    assert(rows.last._3 == total)
  }

  test("q308 explanation: every verified pair matched >=1 band, mask/count consistent") {
    val df = run("q308_neardup_explain").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("n_bands") < 1 || col("n_bands") > 4).count() == 0)
      assert(df.where(col("bands_mask") < 1 || col("bands_mask") > 15).count() == 0)
      assert(df.where(bit_count(col("bands_mask")) =!= col("n_bands")).count() == 0)
      // verified at >= 0.5 → integer micro Jaccard >= 500000
      assert(df.where(col("j_micro") < 500000L).count() == 0)
      assert(df.where(col("ix") > least(col("na"), col("nb"))).count() == 0)
    } finally df.unpersist()
  }

  test("q309 cluster audit: edges verified (min J >= 0.5), density in (0, 10000], sizes >= 2") {
    val df = run("q309_cluster_audit").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("size") < 2).count() == 0)
      assert(df.where(col("min_j_micro") < 500000L).count() == 0)
      assert(df.where(col("min_j_micro") > col("max_j_micro")).count() == 0)
      assert(df.where(col("density_bp") <= 0 || col("density_bp") > 10000).count() == 0)
      // spanning-connectivity bound: a component of n nodes needs >= n-1 edges
      assert(df.where(col("n_edges") < col("size") - 1).count() == 0)
    } finally df.unpersist()
  }

  test("q306 repetition audit: one row per doc, bp ranges, flag algebra exact") {
    val df = run("q306_repetition_audit").cache()
    try {
      val nDocs = Tables.load(spark, sf001, "documents").count()
      assert(df.count() == nDocs)
      assert(df.where(col("top_bigram_bp") < 0 || col("top_bigram_bp") > 10000 ||
        col("dup_5gram_bp") < 0 || col("dup_5gram_bp") > 10000).count() == 0)
      assert(df.where(col("flagged") =!=
        (col("top_bigram_bp") > 1800L || col("dup_5gram_bp") > 3000L).cast("long"))
        .count() == 0)
      // a doc of pure repetition must be flagged: sanity on a synthetic row
      val syn = Seq((1L, "spam spam spam spam spam spam spam spam")).toDF("doc_id", "text")
      val bg = syn.select(explode(expr(
        "transform(sequence(0, size(split(text, ' ')) - 2), i -> i)")).as("i"))
      assert(bg.count() == 7) // construction sanity for the window math
    } finally df.unpersist()
  }
}
