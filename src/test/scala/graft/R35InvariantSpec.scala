package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the q327–q329 calibration/maintenance layer:
  * compaction conserves rows and agrees with the q325 sweep's drop count
  * at the committed threshold (cross-QUERY consistency, not a replay),
  * the truncation audit's full-width row is exact by construction, and
  * the nprobe frontier is monotone with an exhaustive self-check row.
  */
class R35InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q327 compaction: per-band conservation, monotone shrinkage, and the removed count equals q325's drop count at T=9000") {
    val rows = SparkEntry.queries("q327_index_compaction")(spark, sf001)
      .select("band", "rows_before", "rows_removed", "rows_after",
        "buckets_before", "buckets_after", "coll_buckets_before", "coll_buckets_after")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L), "expected one row per band")
    rows.foreach { case (b, rb, rr, ra, bb, ba, cb, ca) =>
      assert(rb - rr == ra, s"band $b: rows not conserved")
      assert(ba <= bb && ca <= cb, s"band $b: compaction grew the index")
      assert(ca >= 0 && rr > 0, s"band $b: nothing removed — the policy fixture is dead")
    }
    // every doc carries exactly one signature per band, so each band
    // must lose exactly the dropped-doc count — and that count is the
    // SAME number q325's sweep reports at the committed threshold
    val removed = rows.map(_._3).distinct
    assert(removed.length == 1, s"bands removed unequal row counts: ${rows.map(_._3).toSeq}")
    val sweepAt9000 = SparkEntry.queries("q325_dedup_policy_sweep")(spark, sf001)
      .where(col("t_bp") === 9000L).select("docs_dropped").as[Long].head()
    assert(removed.head == sweepAt9000,
      s"compaction removed ${removed.head} docs/band but the sweep prices ${sweepAt9000} drops at T=9000")
  }

  test("q328 truncation audit: full grid present, full-width row exact, displacement bounded below by n_q") {
    val rows = SparkEntry.queries("q328_dim_truncation_recall")(spark, sf001)
      .select("dims", "n_q", "hits3", "recall3_bp", "top1_rank_sum")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L), "truncation grid lost a width")
    val nq = rows.head._2
    rows.foreach { case (k, n, h, r, t1) =>
      assert(n == nq && h >= 0 && h <= 3 * nq, s"dims $k: hits out of range")
      assert(r == h * 10000 / (nq * 3), s"dims $k: recall off the bp grid")
      // the true top-1 is ranked somewhere >= 1 for each query
      assert(t1 >= nq, s"dims $k: top1_rank_sum below the n_q floor")
    }
    // width 64 IS the ground truth: perfect recall, every true top-1 first
    val full = rows.find(_._1 == 64L).get
    assert(full._3 == 3 * nq && full._4 == 10000L && full._5 == nq,
      s"full-width self-check row is not exact: $full")
  }

  test("q329 nprobe frontier: monotone recall and strictly growing scan cost, exhaustive row exact") {
    val rows = SparkEntry.queries("q329_nprobe_sweep")(spark, sf001)
      .select("np", "n_q", "cand_scanned", "hits3", "recall3_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L), "nprobe grid lost a depth")
    val nq = rows.head._2
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 > lo._3, s"scan cost did not grow from np=${lo._1} to np=${hi._1}")
      assert(hi._5 >= lo._5, s"recall dropped when probing MORE cells (np=${lo._1} -> ${hi._1})")
    }
    // np = K scans every cell: candidates are exactly the corpus minus
    // the query itself, and recall is perfect by construction
    val n = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    val last = rows.last
    assert(last._3 == nq * (n - 1), s"exhaustive scan count ${last._3} != n_q*(n-1)")
    assert(last._5 == 10000L && last._4 == 3 * nq, "exhaustive probe is not perfect recall")
    // the frontier must be a real tradeoff at shallow depth: probing one
    // cell scans a strict subset of the corpus
    assert(rows.head._3 < nq * (n - 1), "np=1 scans the whole corpus — cells are degenerate")
  }

  test("q330 quote matrix: pair arithmetic consistent and the global max quote equals q323's top run") {
    val rows = SparkEntry.queries("q330_quote_matrix")(spark, sf001)
      .select("src_lo", "src_hi", "n_pairs", "verbatim_tokens", "max_quote_tokens", "excerpt_pairs")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no qualifying run pairs — the matrix fixture is dead")
    rows.foreach { case (lo, hi, np, vt, mq, ep) =>
      assert(lo <= hi, s"($lo,$hi): pair not canonically ordered")
      assert(np >= 1 && ep >= 0 && ep <= np, s"($lo,$hi): excerpt count out of range")
      // every qualifying pair contributes a run of >= 3 shingles = 7 tokens
      assert(mq >= 7 && mq <= vt && vt >= np * 7, s"($lo,$hi): token arithmetic broken")
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length, "duplicate matrix cells")
    // cross-QUERY consistency: the corpus's single longest verbatim run is
    // reported by BOTH the audit (q323 row 1, total-ordered by max_run)
    // and the matrix (as some cell's max_quote_tokens)
    val topRun = SparkEntry.queries("q323_dup_run_audit")(spark, sf001)
      .select("run_tokens").as[Long].head()
    assert(rows.map(_._5).max == topRun,
      s"matrix max quote ${rows.map(_._5).max} != q323's top run $topRun")
  }
}
