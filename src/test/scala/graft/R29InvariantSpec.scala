package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 part-2 widening (q310–q312):
  * conservation and ordering laws the value oracle cannot express.
  */
class R29InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q310 matrix: ordered pairs, group count never exceeds doc mass") {
    val df = run("q310_source_dup_matrix").cache()
    try {
      assert(df.where(col("src_a") >= col("src_b")).count() == 0)
      // each shared group contributes >= 2 docs
      assert(df.where(col("n_docs_involved") < col("n_shared_groups") * 2).count() == 0)
      // every (a,b) appears at most once
      assert(df.select("src_a", "src_b").distinct().count() == df.count())
    } finally df.unpersist()
  }

  test("q311 shuffle: batches partition the corpus, determinism across runs") {
    val df = run("q311_epoch_shuffle").cache()
    try {
      val nDocs = Tables.load(spark, sf001, "documents").count()
      assert(df.agg(sum("n_docs")).as[Long].head() == nDocs)
      assert(df.where(col("batch") < 0 || col("batch") > 7).count() == 0)
      assert(df.where(col("dom_lang_bp") <= 0 || col("dom_lang_bp") > 10000).count() == 0)
      // deterministic: a second evaluation is byte-identical
      val again = run("q311_epoch_shuffle")
      assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    } finally df.unpersist()
  }

  test("q312 survivorship: survivors conserved, retention bounded, rates internally consistent") {
    val df = run("q312_dedup_survivorship").cache()
    try {
      val docs = Tables.load(spark, sf001, "documents")
      val nGroups = docs.select(md5(col("text"))).distinct().count()
      assert(df.agg(sum("n_after")).as[Long].head() == nGroups)
      assert(df.agg(sum("n_before")).as[Long].head() == docs.count())
      assert(df.where(col("n_after") > col("n_before")).count() == 0)
      assert(df.where(col("retention_bp") < 0 || col("retention_bp") > 10000).count() == 0)
      // dev_bp is retention minus the (constant) global rate: its range
      // must stay within [-10000, 10000]
      assert(df.where(abs(col("dev_bp")) > 10000).count() == 0)
    } finally df.unpersist()
  }
}
