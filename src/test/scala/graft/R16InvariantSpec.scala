package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-6 widening (q259–q284) that the
  * value-equality oracle cannot express: TPC-H shape laws (Q15 tie set,
  * Q13 population conservation, Q20 threshold membership), statistic
  * range laws (|ρ| ≤ 1, |S| ≤ pairs, nDCG ≤ 1, KS/Cramér ≤ 1), funnel
  * monotonicity, attribution credit conservation, incremental-equals-
  * batch sessionization (recomputed in Spark, independent of the
  * DuckDB oracle), bootstrap interval sanity, and HITS normalization.
  * All run the REGISTERED queries against sf0.001 so the pinned
  * behavior is exactly what the driver verifies.
  */
class R16InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q259 ship priority: ≤10 rows, revenue-desc total order, orders strictly pre-pivot") {
    val rows = run("q259_ship_priority")
      .select("l_orderkey", "od", "rev_cents")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    val pivotDay = java.time.LocalDate.of(1996, 6, 1).toEpochDay
    rows.foreach { case (_, od, rev) => assert(od < pivotDay && rev > 0) }
  }

  test("q260 forecast revenue: row count matches an independent recount") {
    val Array((n, rev)) = run("q260_forecast_revenue")
      .as[(Long, Long)].collect()
    val want = Tables.load(spark, sf001, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
        col("l_quantity") < 24.0)
      .count()
    assert(n == want && rev > 0)
  }

  test("q264 customer distribution conserves the customer population") {
    val df = run("q264_cust_distribution")
      .select("c_count", "custdist").as[(Long, Long)].collect()
    val nCust = Tables.load(spark, sf001, "customer").count()
    assert(df.map(_._2).sum == nCust)
    // the distribution keys are distinct counts
    assert(df.map(_._1).distinct.length == df.length)
  }

  test("q266 top supplier: every surviving row carries the identical maximal revenue") {
    val rows = run("q266_top_supplier").select("total_cents").as[Long].collect()
    assert(rows.nonEmpty && rows.distinct.length == 1)
  }

  test("q268 excess volume: membership matches the recomputed per-pair threshold") {
    val got = run("q268_excess_volume").select("s_suppkey").as[Long].collect().toSet
    val li = Tables.load(spark, sf001, "lineitem")
    val blue = Tables.load(spark, sf001, "part")
      .where(col("p_name").like("%blue%")).select("p_partkey")
    val want = li.join(blue, col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(when(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"),
        col("l_quantity").cast("long")).otherwise(0L)).as("qy"),
        sum(col("l_quantity").cast("long")).as("qa"))
      .where(col("qy") * 3 > col("qa") * 2 && col("qa") >= 60L)
      .select("l_suppkey").distinct().as[Long].collect().toSet
    assert(got == want)
  }

  test("q269 local supplier: only EUROPE nations, positive revenue") {
    val eur = Tables.load(spark, sf001, "nation")
      .join(Tables.load(spark, sf001, "region").where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").as[String].collect().toSet
    val rows = run("q269_local_supplier")
      .select("n_name", "rev_cents").as[(String, Long)].collect()
    rows.foreach { case (n, rev) => assert(eur.contains(n) && rev > 0) }
  }

  test("q270 ACF: every lag 1..7 present once, Spearman within [-1, 1]") {
    val rows = run("q270_revenue_acf")
      .select("lag", "spearman_r").as[(Long, Double)].collect()
    assert(rows.map(_._1).toSeq == (1L to 7L))
    rows.foreach { case (_, r) => assert(r >= -1.0 && r <= 1.0) }
  }

  test("q271 trend test: pair count law and |S| bound") {
    val Array((nm, np, s, v18, _)) = run("q271_trend_test")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(np == nm * (nm - 1) / 2)
    assert(math.abs(s) <= np)
    assert(v18 == nm * (nm - 1) * (2 * nm + 5))
  }

  test("q272 nDCG: dcg ≤ idcg, ndcg in [0, 10000] bp") {
    val rows = run("q272_ndcg_eval")
      .select("dcg_micro", "idcg_micro", "ndcg_bp").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, i, n) =>
      assert(d >= 0 && d <= i, s"dcg $d exceeds idcg $i")
      assert(n >= 0 && n <= 10000)
    }
  }

  test("q273 LSH eval: overlap ≤ 10 and rr_micro consistent with overlap") {
    val rows = run("q273_lsh_eval")
      .select("n_cand", "overlap10", "rr_micro").as[(Long, Long, Long)].collect()
    assert(rows.length == 10) // zero-hit queries must be preserved
    rows.foreach { case (nc, ov, rr) =>
      assert(ov <= 10 && ov <= math.max(nc, 0))
      if (ov == 0) assert(rr == 0)
      else assert(rr >= 100000 && rr <= 1000000) // 1/rank, rank ∈ [1, 10]
    }
  }

  test("q274 strict funnel is monotone: view ≥ click ≥ purchase") {
    val Array((nv, nc, np, cbp, pbp)) = run("q274_strict_funnel")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(nv >= nc && nc >= np)
    assert(cbp <= 10000 && pbp <= 10000)
  }

  test("q275 attribution conserves credit: per-purchase total ≤ 1000 milli, recomputed") {
    // the registered query reports per-type totals; recompute the
    // per-purchase credit with the same rules and assert the bound the
    // floor-division design promises
    val rows = run("q275_attribution")
      .select("n_touches", "credit_milli").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, c) => assert(n > 0 && c > 0) }
    // total credit across types cannot exceed 1000 per contributing purchase
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("es"))
    val buys = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("bu"), col("event_id").as("pid"), col("es").as("pes"))
    val nPurchWithTouch = buys
      .join(ev.where(col("event_type").isin("view", "click")),
        col("user_id") === col("bu") && col("es") < col("pes") &&
          col("pes") - col("es") <= 259200L)
      .select("pid").distinct().count()
    assert(rows.map(_._2).sum <= 1000L * nPurchWithTouch)
  }

  test("q276 chi-square: dof law and Cramér's V within [0, 10000] bp") {
    val Array((n, nl, ns, dof, chi2, v)) = run("q276_chi2_independence")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(n > 0 && chi2 >= 0)
    assert(dof == (nl - 1) * (ns - 1))
    assert(v >= 0 && v <= 10000)
  }

  test("q277 incremental sessionization equals full-batch recompute (Spark-side)") {
    val got = run("q277_incr_sessions")
      .select("user_id", "start_es", "end_es", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // independent full-batch gaps-and-islands over ALL events
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), expr("unix_timestamp(ts)").as("es"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val want = ev
      .withColumn("brk",
        when(col("es") - lag("es", 1).over(w) > 172800L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("es").as("start_es"), max("es").as("end_es"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_es", "end_es", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
    // and the merge path is actually exercised: some session straddles T0
    assert(got.exists { case (_, st, en, _) => st < 1706400000L && en >= 1706400000L },
      "no session straddles the base/delta split — the stitch was vacuous")
  }

  test("q278 bootstrap: interval ordered and covering the point estimate") {
    val Array((n, mean, lo, hi)) = run("q278_poisson_bootstrap")
      .as[(Long, Long, Long, Long)].collect()
    assert(n > 0 && lo <= hi)
    // the 2nd..31st order statistics of 32 resample means straddle the
    // full-sample mean except with vanishing probability; allow one
    // interval-width of slack so the assert pins sanity, not luck
    val wiggle = math.max(hi - lo, 1L)
    assert(mean >= lo - wiggle && mean <= hi + wiggle)
  }

  test("q279 KS: population conserved, D within [0, 10000] bp") {
    val Array((np, nn, _, d)) = run("q279_ks_test")
      .as[(Long, Long, Long, Long)].collect()
    val total = Tables.load(spark, sf001, "embeddings").count()
    assert(np + nn == total)
    assert(d >= 0 && d <= 10000)
  }

  test("q280 session paths: counts descend, path tokens are event types") {
    val rows = run("q280_session_paths")
      .select("path", "n_sessions").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    val types = Set("view", "click", "purchase", "signup", "error")
    rows.foreach { case (p, _) =>
      assert(p.split(">").forall(types.contains), s"alien token in path $p")
      assert(p.split(">").length <= 8, s"path exceeds the 8-step cap: $p")
    }
  }

  test("q281 calendar gaps: coverage ≤ 10000 bp and day-window consistency") {
    val rows = run("q281_calendar_gaps")
      .select("n_days_observed", "first_day", "last_day", "max_gap_days",
        "coverage_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nd, fd, ld, gap, cov) =>
      assert(fd <= ld && nd <= ld - fd + 1)
      assert(gap >= 0 && gap <= ld - fd)
      assert(cov > 0 && cov <= 10000)
    }
  }

  test("q282 RFM conserves the ordering customer population") {
    val segs = run("q282_rfm_segments")
      .select("n_customers").as[Long].collect()
    val want = Tables.load(spark, sf001, "orders")
      .select("o_custkey").distinct().count()
    assert(segs.sum == want)
  }

  test("q283 Benford: digit domain 1-9 and population conserved") {
    val rows = run("q283_benford_audit")
      .select("digit", "n_obs").as[(Long, Long)].collect()
    assert(rows.map(_._1).forall(d => d >= 1 && d <= 9))
    assert(rows.map(_._2).sum == Tables.load(spark, sf001, "orders").count())
  }

  test("q285 TTL dedup: kept ≤ events, conservation, and TTL→∞ degenerates to per-key distinct") {
    val rows = run("q285_ttl_dedup")
      .select("n_events", "n_kept", "n_dropped").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, k, d) =>
      assert(k >= 1 && k <= n && k + d == n)
    }
    // every (user, type) pair has at least one burst lead ⇒ Σkept ≥ #pairs
    val nPairs = Tables.events(spark, sf001)
      .select("user_id", "event_type").distinct().count()
    assert(rows.map(_._2).sum >= nPairs)
  }

  test("q286 A-ES sample: exactly ≤5 per source, ranks contiguous from 1") {
    val rows = run("q286_weighted_topk_sample")
      .select("source", "rank").as[(String, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ranks = g.map(_._2).sorted.toSeq
      assert(ranks == (1L to ranks.length) && ranks.length <= 5)
    }
  }

  test("q287 KMV intersection: estimate within the sketch's coarse error envelope") {
    val Array((c, exact, est, errBp)) = run("q287_kmv_intersect")
      .as[(Long, Long, Long, Long)].collect()
    assert(c <= 64 && est >= 0)
    // k=64 gives ~1/sqrt(64) ≈ 12.5% relative error; allow 3σ
    assert(errBp <= 3750, s"KMV estimate off by $errBp bp (exact $exact, est $est)")
  }

  test("q288 assortativity: correlation within [-1, 1] over a positive edge count") {
    val Array((n, r)) = run("q288_assortativity").as[(Long, Double)].collect()
    assert(n > 0)
    assert(r >= -1.0 && r <= 1.0)
  }

  test("q289 calibration: bins conserve the population, gaps bounded by 1e6") {
    val rows = run("q289_calibration")
      .select("bin", "n", "n_pos", "conf_micro", "acc_micro", "gap_micro")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == Tables.load(spark, sf001, "embeddings").count())
    rows.foreach { case (b, n, np, conf, acc, gap) =>
      assert(b >= 0 && b <= 19 && np <= n)
      assert(conf >= 0 && conf <= 1000000 && acc >= 0 && acc <= 1000000)
      assert(gap == math.abs(conf - acc))
      // the bin's mean prediction must lie inside the bin's own range
      assert(conf >= b * 50000 && conf < (b + 1) * 50000 + 50000)
    }
  }

  test("q290 average precision: AP within [prevalence-ish floor, 10000] bp") {
    val Array((np, nn, ap, prev)) = run("q290_avg_precision")
      .as[(Long, Long, Long, Long)].collect()
    assert(np > 0 && nn > 0)
    assert(ap >= 0 && ap <= 10000 && prev >= 0 && prev <= 10000)
    assert(prev == np * 10000 / (np + nn))
  }

  test("q291 decile lift: population conserved, gains monotone to 10000 bp") {
    val rows = run("q291_decile_lift")
      .select("decile", "n", "n_pos", "cum_gain_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).sum == Tables.load(spark, sf001, "embeddings").count())
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "cumulative gains must be monotone")
    assert(rows.last._4 == 10000, "final decile must capture all positives")
    rows.foreach { case (d, n, np, _) => assert(d >= 0 && d <= 9 && np <= n) }
  }

  test("q292 BPE merges: monotone non-increasing weights, merged symbol propagates") {
    val rows = run("q292_bpe_merge")
      .select("step", "rank", "pair", "weight").as[(Long, Long, String, Long)].collect()
    val m1 = rows.find(r => r._1 == 1L).get
    val m2 = rows.find(r => r._1 == 2L).get
    // BPE law: the k-th merge's weight cannot exceed the (k-1)-th's
    // (merging can only reduce other pairs' counts, and m1 was argmax)
    assert(m1._4 >= m2._4, s"merge2 ${m2._4} outweighs merge1 ${m1._4}")
    rows.filter(_._1 == 3L).foreach(r => assert(r._4 <= m2._4))
    // each merge pair is two space-separated symbols
    assert(m1._3.split(" ").length == 2 && m2._3.split(" ").length == 2)
  }

  test("q293 containment: every synthetic excerpt pairs with its source at cont=100%") {
    val rows = run("q293_containment")
      .select("a", "b", "ix", "na", "nb", "cont_bp", "jacc_bp", "subset_like")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, ix, na, nb, cont, jacc, flag) =>
      assert(ix <= math.min(na, nb))
      assert(cont >= jacc, "containment can never be below Jaccard")
      assert(flag == (if (cont >= 8000 && jacc < 5000) 1L else 0L))
    }
    // every excerpt (negative id) must surface paired with its positive
    // source at containment 10000 bp — its shingles are a subset by
    // construction
    val excerpts = rows.filter { case (a, b, _, _, _, _, _, _) => a < 0 || b < 0 }
    assert(excerpts.nonEmpty, "excerpt leg produced no candidate pairs")
    excerpts
      .filter { case (a, b, _, _, _, _, _, _) =>
        math.abs(math.min(a, b) + 1000000L) == math.max(a, b) }
      .foreach { case (_, _, _, _, _, cont, _, _) =>
        assert(cont == 10000L, s"excerpt⊂source pair must have full containment, got $cont")
      }
  }

  test("q294 A/B readout: population conserved, SRM small under hash assignment, flag consistent") {
    val Array((n0, c0, n1, c1, srm, r0, r1, chi2, sig)) = run("q294_ab_test")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(c0 <= n0 && c1 <= n1)
    assert(r0 <= 10000 && r1 <= 10000)
    // parity hash assignment cannot be grossly unbalanced
    assert(srm < 2000, s"sample-ratio mismatch $srm bp under parity assignment")
    assert(sig == (if (chi2 > 3841459L) 1L else 0L))
    // population = users with at least one view
    val ev = Tables.events(spark, sf001)
    val want = ev.where(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(n0 + n1 == want)
  }

  test("q295 daily health: vitals conserve the event population, alarms are binary") {
    val rows = run("q295_daily_health")
      .select("n_events", "null_bp", "alarm_volume", "alarm_nulls", "alarm_coverage")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sum == Tables.events(spark, sf001).count())
    rows.foreach { case (_, nullBp, a1, a2, a3) =>
      assert(nullBp >= 0 && nullBp <= 10000)
      assert(Set(0L, 1L)(a1) && Set(0L, 1L)(a2) && Set(0L, 1L)(a3))
    }
  }

  test("q296 Naive Bayes: confusion covers the scoreable test docs, labels from the class set") {
    val rows = run("q296_naive_bayes")
      .select("lang", "pred", "n").as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    val langs = Tables.load(spark, sf001, "documents")
      .select("lang").distinct().as[String].collect().toSet
    rows.foreach { case (l, p, n) =>
      assert(langs.contains(l) && langs.contains(p) && n > 0)
    }
    val nTest = Tables.load(spark, sf001, "documents")
      .where(col("doc_id") % 2 === 1).count()
    val scored = rows.map(_._3).sum
    // every test doc with ≥1 in-vocab token is scored exactly once
    assert(scored <= nTest && scored >= 1)
    // (lang, pred) keys unique — each cell appears once
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q297 hash audit: occupancy bounds and mass share within range") {
    val Array((v, used, collided, mx, massBp)) = run("q297_feature_hash_audit")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(v >= used && used >= collided)
    assert(mx >= 1 && mx <= v)
    assert(massBp >= 0 && massBp <= 10000)
    // pigeonhole: vocab larger than 1024 buckets forces collisions
    if (v > 1024) assert(collided > 0)
  }

  test("q298 LOO encoding: min < max within segments proves the own-row subtraction varies") {
    val rows = run("q298_target_encoding")
      .select("segment", "n_rows", "loo_min_c4", "loo_avg_c4", "loo_max_c4")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, lo, avg, hi) =>
      assert(n >= 2, "LOO needs at least 2 rows per segment")
      assert(lo <= avg && avg <= hi)
      assert(lo < hi, "identical LOO encodes would mean the own-row term is ignored")
    }
  }

  test("q299 CUPED: arms partition the users, variance reduction within [0, 10000] bp") {
    val Array((n0, n1, _, _, _, vr)) = run("q299_cuped")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val users = Tables.events(spark, sf001)
      .where(col("value").isNotNull).select("user_id").distinct().count()
    assert(n0 + n1 == users)
    assert(vr >= 0 && vr <= 10000)
  }

  test("q300 hybrid eval: all systems score all queries, nDCG within [0, 10000] bp") {
    val rows = run("q300_hybrid_eval")
      .select("system", "n_queries", "mean_ndcg_bp")
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("lexical", "rrf", "vector"))
    rows.foreach { case (_, nq, nd) =>
      assert(nq == 10, "a system dropped zero-hit queries — mean is inflated")
      assert(nd >= 0 && nd <= 10000)
    }
  }

  test("q301 survival: population conserved, at-risk and S(t) both monotone non-increasing") {
    val rows = run("q301_survival_curve")
      .select("day", "n_exit", "n_churned", "at_risk", "hazard_bp", "surv_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val users = Tables.events(spark, sf001).select("user_id").distinct().count()
    assert(rows.map(_._2).sum == users, "every user exits exactly once (churn or censor)")
    assert(rows.head._4 == users, "first tenure row's at-risk must be the full population")
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(rows.map(_._6).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "a survival curve can never rise")
    rows.foreach { case (_, ne, nc, ar, h, sm) =>
      assert(nc <= ne && ne <= ar)
      assert(h >= 0 && h <= 10000 && sm >= 0 && sm <= 1000)
    }
  }

  test("q302 Markov attribution: removal can only lower conversion, shares sum ≤ 10000 bp") {
    val rows = run("q302_markov_attribution")
      .select("channel", "base_micro", "removed_micro", "effect_micro",
        "attribution_bp")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("click", "error", "signup", "view"))
    assert(rows.map(_._2).distinct.length == 1, "base conversion must be chain-wide")
    rows.foreach { case (_, base, removed, eff, _) =>
      assert(base >= 0 && base <= 1000000)
      assert(removed <= base,
        "redirecting a channel's inbound edges to NULL can never raise conversion")
      assert(eff == base - removed)
    }
    // floor division: shares sum to ≤ 10000, and to > 0 when any effect exists
    val shareSum = rows.map(_._5).sum
    assert(shareSum <= 10000)
    if (rows.map(_._4).sum > 0) assert(shareSum > 0)
  }

  test("q284 HITS: scores normalized to [0, 1e6] with the leader at exactly 1e6") {
    val rows = run("q284_hits_authority")
      .select("auth_micro").as[Long].collect()
    assert(rows.nonEmpty)
    assert(rows.head == 1000000L, "max-renormalization must pin the leader to 1e6")
    rows.foreach(sc => assert(sc >= 0 && sc <= 1000000L))
  }
}
