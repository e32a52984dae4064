package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named queries
  * (or a default set) so pushdown, broadcast choice and codegen coverage
  * can be reviewed. Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q03_filter_pred", "q08_join_inner", "q09_star_join",
        "q29_term_freq", "q34_minhash_pairs", "q37_cosine_topk", "q45_range_join",
        "q90_neardup_clusters", "q93_bigram_lm", "q95_bloom_semi_join",
        "q107_bucketed_join", "q112_nested_struct", "q117_disjunctive_join",
        "q143_prefix_simjoin", "q145_triangle_count", "q152_incremental_agg",
        "q155_multi_exists", "q156_asof_tolerance", "q157_centroid_assign",
        // round-4b plan-critical: cell-blocked pairwise (q171), bounded
        // range join (q180), two-level rank offsets (q182/q184), bucket
        // prefilter + double window (q187)
        "q171_semantic_dedup", "q180_rolling_actives", "q182_winsorize",
        "q184_robust_zscore", "q187_touch_attribution")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
