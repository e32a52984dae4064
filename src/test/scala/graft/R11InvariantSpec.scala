package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-6 widening (q226–q237) that the
  * value-equality oracle cannot express: the TPC-H-shape algebraic
  * guarantees (threshold semantics, share budgets, argmin minimality),
  * the adaptive-k KMV exactness regime, OLS normal-equation identities,
  * and the audit-family bounds. All run the REGISTERED queries against
  * sf0.001, so the pinned behavior is exactly what the driver verifies.
  */
class R11InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q226 small-qty: every qualifying quantity is under 0.2·avg ≤ 10, so qty_small ≤ 10·n_small") {
    val rows = run("q226_small_qty_rev")
      .select("n_small", "qty_small", "rev_cents").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, q, rev) =>
      // l_quantity ∈ [1, 50] ⇒ 0.2·avg ≤ 10, and each small row is
      // strictly below it
      assert(q < n * 10)
      assert(rev > 0)
    }
  }

  test("q227 big orders: threshold respected, orderkeys unique, matches direct recount") {
    val df = run("q227_big_orders").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("sum_qty") <= 300).count() == 0)
      assert(df.select("o_orderkey").distinct().count() == df.count())
      val want = Tables.load(spark, sf001, "lineitem")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("sq"))
        .where(col("sq") > 300).count()
      assert(df.count() == want)
    } finally df.unpersist()
  }

  test("q228 HHI: averages within the [uniform, monopoly] band, counters bounded") {
    val rows = run("q228_supply_hhi")
      .select("n_parts", "avg_hhi_bp", "max_top_bp", "n_concentrated")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (np, hhi, top, conc) =>
      // HHI of any share vector lies in (0, 10000]; a top share is a
      // valid basis-point fraction; the concentrated count is a subset
      assert(hhi > 0 && hhi <= 10000)
      assert(top > 0 && top <= 10000)
      assert(conc >= 0 && conc <= np)
    }
  }

  test("q229 dormant rich: totals match an independently computed dormant set") {
    val df = run("q229_dormant_rich")
    val got = df.agg(sum("n_cust")).as[Long].head()
    // independent recount with the same cents quantization
    val c = Tables.load(spark, sf001, "customer")
      .select(col("c_custkey"), floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("cts"))
      .where(col("cts") > 0)
    val stats = c.agg(sum("cts").as("t"), count(lit(1)).as("n")).head()
    val (t, n) = (stats.getLong(0), stats.getLong(1))
    val rich = c.where(col("cts") * n > t)
    val active = Tables.load(spark, sf001, "orders")
      .where(col("o_orderdate").cast("date") >= lit("2000-08-01").cast("date"))
      .select(col("o_custkey")).distinct()
    val want = rich.join(active, rich("c_custkey") === active("o_custkey"), "left_anti").count()
    assert(got == want && want > 0)
  }

  test("q230 vital brands: every share above threshold; selected shares fit the 10000 bp budget") {
    val rows = run("q230_vital_brands").select("share_bp").as[Long].collect()
    assert(rows.nonEmpty)
    rows.foreach(bp => assert(bp >= 300 && bp <= 10000))
    assert(rows.sum <= 10000)
  }

  test("q231 best supplier: one winner per traded part, and it is truly minimal") {
    val df = run("q231_best_supplier").cache()
    try {
      val li = Tables.load(spark, sf001, "lineitem")
      assert(df.count() == li.select("l_partkey").distinct().count())
      assert(df.select("l_partkey").distinct().count() == df.count())
      // the winner's floor-bp unit price must not exceed any other
      // supplier's best offer for the same part
      val offers = li.groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("bo"))
        .select(col("l_partkey"), floor(col("bo") * 10000.0).cast("long").as("obp"))
      val beaten = df.join(offers, "l_partkey")
        .where(col("unit_bp") > col("obp")).count()
      assert(beaten == 0)
    } finally df.unpersist()
  }

  test("q232 OLS: regression line passes through the centroid of each group") {
    val rows = run("q232_trend_ols")
      .select("event_type", "slope_cents", "icept_cents")
      .as[(String, Double, Double)].collect()
    assert(rows.length == 5)
    val cents = Tables.events(spark, sf001).where(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_timestamp(ts) div 86400 - 19723").as("x"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("vc"))
      .groupBy("event_type").agg(avg("x").as("mx"), avg("vc").as("my"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (et, slope, icept) =>
      val (mx, my) = cents(et)
      // ŷ(mean x) == mean y is the normal-equation identity; outputs are
      // rounded 4dp so allow the rounding envelope scaled by |mx|
      assert(math.abs(slope * mx + icept - my) < 1e-4 * (math.abs(mx) + 1) + 1e-4)
    }
  }

  test("q233 hourly audit: shares are valid fractions and user counts are consistent") {
    val df = run("q233_hourly_hotkeys").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("n_users") > col("n")).count() == 0)
      assert(df.where(col("max_user_n") > col("n")).count() == 0)
      assert(df.where(col("user_bp") > lit(10000) || col("type_bp") > lit(10000)).count() == 0)
      val total = df.agg(sum("n")).as[Long].head()
      assert(total == Tables.events(spark, sf001).count())
    } finally df.unpersist()
  }

  test("q234 blowup: pairs = n² and the top-20 share budget holds") {
    val rows = run("q234_join_blowup")
      .select("n", "pairs", "share_bp").as[(Long, Long, Long)].collect()
    assert(rows.length == 20)
    rows.foreach { case (n, p, bp) => assert(p == n * n && bp >= 0 && bp <= 10000) }
    assert(rows.map(_._3).sum <= 10000)
    // ordered by n desc
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
  }

  test("q235 KMV: exact in the small-union regime, bounded error elsewhere") {
    val rows = run("q235_kmv_jaccard")
      .select("k_used", "n_union", "est_bp", "exact_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (kUsed, nUnion, est, exact) =>
      assert(kUsed <= 32 && kUsed > 0)
      // when the merged sketch holds the whole union, the adaptive-k
      // estimator IS the exact Jaccard
      if (nUnion <= 32) assert(est == exact)
      // KMV k=32 standard error ≈ 1/√32 ≈ 17.7%; 3500 bp is a ~2σ band
      assert(math.abs(est - exact) <= 3500)
    }
  }

  test("q236 lexical diversity: type/token/hapax ordering and bp bounds") {
    val rows = run("q236_lexical_diversity")
      .select("n_tokens", "n_types", "n_hapax", "ttr_bp", "hapax_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tok, typ, hap, ttr, hbp) =>
      assert(hap <= typ && typ <= tok)
      assert(ttr <= 10000 && hbp <= 10000)
    }
  }

  test("q238 copy matrix: pair counts dominate cluster counts, pairs ordered") {
    val rows = run("q238_copy_matrix")
      .select("sa", "sb", "n_pairs", "n_clusters").as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sa, sb, np, nc) =>
      assert(sa < sb)
      // every shared cluster contributes at least one cross-source pair
      assert(np >= nc && nc >= 1)
    }
  }

  test("q239 power law: point count bounded by node count, slope finite") {
    val r = run("q239_degree_powerlaw")
      .select("n_points", "n_nodes", "max_deg", "slope")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0 && r._1 <= r._2)
    assert(r._3 >= 1)
    assert(!r._4.isNaN && !r._4.isInfinite)
  }

  test("q240 conversion lag: rate is a valid fraction, quantiles ordered and non-negative") {
    val r = run("q240_conversion_lag")
      .select("n_viewers", "n_converted", "conv_bp", "p50_lag_s", "p90_lag_s")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._2 <= r._1 && r._3 <= 10000)
    assert(r._4 >= 0 && r._4 <= r._5)
  }

  test("q241 parent share: nation revenues sum EXACTLY to their region total") {
    val df = run("q241_parent_share").cache()
    try {
      assert(df.count() > 0)
      val broken = df.groupBy("r_name")
        .agg(sum("rev_cents").as("s"), max("region_cents").as("rc"),
          sum("share_bp").as("sbp"))
        .where(col("s") =!= col("rc") || col("sbp") > 10000)
        .count()
      assert(broken == 0)
    } finally df.unpersist()
  }

  test("q242 priority drift: L1 bounded by 2 (20000 bp), totals match orders") {
    val df = run("q242_priority_drift").cache()
    try {
      assert(df.count() > 0)
      assert(df.where(col("l1_bp") > 20000).count() == 0)
      val total = df.agg(sum("n_orders")).as[Long].head()
      assert(total == Tables.load(spark, sf001, "orders").count())
    } finally df.unpersist()
  }

  test("q243 pareto: the 80% prefix is a non-empty subset of the brand's parts") {
    val rows = run("q243_brand_pareto")
      .select("n_parts", "n_parts_80", "top_share_bp").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (np, n80, top) =>
      assert(n80 >= 1 && n80 <= np)
      assert(top >= 1 && top <= 10000)
    }
  }

  test("q244 weighted median: cuts match the brute-force weighted element rule") {
    val got = run("q244_weighted_median")
      .select("l_returnflag", "w_total", "p50_unit_bp", "p90_unit_bp")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    // brute force: sort each flag's (unit, weight) rows, walk the
    // cumulative weight to ceil(f·W) — the definition, O(n log n) per
    // group, fine at sf0.001
    val rows = Tables.load(spark, sf001, "lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"),
        col("l_quantity").cast("long").as("w"))
      .as[(String, Double, Long)].collect()
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val sorted = rs.map(r => (r._2, r._3)).sortBy(_._1)
      val total = sorted.map(_._2).sum
      def cutBp(f: Double): Long = {
        val target = math.ceil(total * f).toLong
        var cum = 0L
        val hit = sorted.find { case (_, w) => cum += w; cum >= target }.get._1
        math.floor(hit * 10000.0).toLong
      }
      val (_, wt, p50, p90) = got(flag)
      assert(wt == total)
      assert(p50 == cutBp(0.5) && p90 == cutBp(0.9))
    }
  }

  test("q245 merkle diff: damage counts equal the injected damage exactly") {
    val r = run("q245_merkle_diff")
      .select("n_buckets", "n_diff_buckets", "n_missing", "n_corrupt")
      .as[(Long, Long, Long, Long)].head()
    val docs = Tables.load(spark, sf001, "documents").select("doc_id").as[Long].collect()
    val missing = docs.count(_ % 97 == 0)
    val corrupt = docs.count(id => id % 101 == 0 && id % 97 != 0)
    assert(r._3 == missing && r._4 == corrupt)
    assert(r._2 <= r._1)
    // every damaged doc's bucket must have been flagged (digest sums
    // collide with ~2^-40 probability — deterministic fixture here)
    assert(r._2 >= 1 || (missing == 0 && corrupt == 0))
  }

  test("q246 log2 bands: every band's gap range lies inside [2^(b-1), 2^b)") {
    val rows = run("q246_log2_latency")
      .select("band", "min_gap", "max_gap").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, mn, mx) =>
      assert(mn <= mx)
      if (b == 0) assert(mn == 0 && mx == 0)
      else {
        assert(mn >= (1L << (b - 1).toInt))
        assert(mx < (1L << b.toInt))
      }
    }
  }

  test("q247 PIT join: every probe lands in exactly one bucket (match or none)") {
    val df = run("q247_pit_join")
    val total = df.agg(sum("n_orders")).as[Long].head()
    val probes = Tables.load(spark, sf001, "orders").where(col("o_custkey") < 100).count()
    // left join against non-overlapping contiguous intervals: exactly
    // one version (or none) per probe — no duplication, no loss
    assert(total == probes)
    assert(df.where(col("prio_30d_prior") === "none").count() == 1)
  }

  test("q248 skyline: counts match the brute-force dominance check per brand") {
    val got = run("q248_brand_skyline")
      .select("p_brand", "n_skyline").as[(String, Long)].collect().toMap
    assert(got.nonEmpty)
    val parts = Tables.load(spark, sf001, "part")
      .select(col("p_brand"),
        floor(col("p_retailprice") * 100.0 + 0.5).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .as[(String, Long, Long)].collect()
    parts.groupBy(_._1).foreach { case (brand, ps) =>
      val pts = ps.map(p => (p._2, p._3))
      val skyline = pts.count { case (pc, sz) =>
        !pts.exists { case (oc, os) =>
          (oc < pc && os >= sz) || (oc == pc && os > sz)
        }
      }
      assert(got(brand) == skyline, s"brand $brand")
    }
  }

  test("q249 decay: decayed never exceeds raw, ranking is by decayed score") {
    val rows = run("q249_decay_score")
      .select("raw_cents", "decayed_cents").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (raw, dec) => assert(dec <= raw && dec >= 0) }
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  test("q250 funnel: stages chain (n_in = previous n_out) and only ever shrink") {
    val rows = run("q250_curation_funnel")
      .orderBy("stage").select("stage", "n_in", "n_out", "drop_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { case (_, nIn, nOut, bp) =>
      assert(nOut <= nIn)
      assert(bp == (nIn - nOut) * 10000 / math.max(nIn, 1))
    }
    rows.sliding(2).foreach { case Array(prev, cur) => assert(cur._2 == prev._3)
                              case _ => () }
    assert(rows.head._2 == Tables.load(spark, sf001, "documents").count())
  }

  test("q251 incremental funnel: stages chain, only shrink, every stage works") {
    val rows = run("q251_incr_funnel")
      .orderBy("stage").select("stage", "n_in", "n_out", "drop_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    rows.foreach { case (_, nIn, nOut, bp) =>
      assert(nOut <= nIn, "a funnel stage can only shrink")
      assert(bp == (nIn - nOut) * 10000 / math.max(nIn, 1))
    }
    rows.sliding(2).foreach { case Array(prev, cur) => assert(cur._2 == prev._3)
                              case _ => () }
    // stage-1 input is exactly the three delta classes
    val docs = Tables.load(spark, sf001, "documents")
    val want = Seq(13, 17, 19)
      .map(m => docs.where(col("doc_id") % m === 0).count()).sum
    assert(rows.head._2 == want)
    // each class exercises its own stage on this fixture: gates,
    // exact-vs-base (re-ingests), near-dup-vs-base (re-crawls), split
    assert(rows.map(r => r._2 - r._3).drop(1).forall(_ > 0),
      "each post-raw stage should drop at least one doc at sf0.001")
  }

  test("q251 chain invariant: no funnel survivor collides with base, exactly or near-dup") {
    import graft.ops.DedupOps
    val docs = Tables.load(spark, sf001, "documents")
    val surv = graft.queries.R14Queries.incrFunnelStages(spark, sf001)
      .toMap.apply("train_split").cache()
    try {
      assert(surv.count() > 0, "the fresh (reversed) class should survive")
      // all survivors carry delta (negative) ids
      assert(surv.where(col("doc_id") >= 0).count() == 0)
      // exact: no survivor's text digest appears in the base corpus
      val baseMd5 = docs.select(md5(col("text")).as("h")).distinct()
      assert(surv.select(md5(col("text")).as("h"))
        .join(baseMd5, Seq("h"), "left_semi").count() == 0)
      // near-dup: re-derive signatures/sets INDEPENDENTLY of the funnel's
      // cached index and verify zero survivor×base pairs at Jaccard>=0.5
      val bsh = DedupOps.shingleRows(docs, "text", 5)
      val ssh = DedupOps.shingleRows(surv, "text", 5)
      val cand = DedupOps.minhashSignatureRows(ssh, 4)
        .select(col("doc_id").as("a"), col("band"), col("sig"))
        .join(DedupOps.minhashSignatureRows(bsh, 4)
          .select(col("doc_id").as("b"), col("band"), col("sig")), Seq("band", "sig"))
        .select("a", "b").distinct()
      val sets = bsh.groupBy("doc_id").agg(collect_list(col("s")).as("shs"))
        .unionByName(ssh.groupBy("doc_id").agg(collect_list(col("s")).as("shs")))
      assert(DedupOps.jaccardForPairs(cand, sets)
        .where(col("jaccard") >= 0.5).count() == 0,
        "a funnel survivor still near-duplicates a base doc")
    } finally surv.unpersist()
  }

  test("q303 dual-scope funnel: within-delta stage drops exactly one of each twin, survivors pairwise non-near-dup") {
    import graft.ops.DedupOps
    val stages = graft.queries.R14Queries.dualNeardupStages(spark, sf001).toMap
    val s3 = stages("neardup_vs_base").cache()
    val surv = stages("neardup_within_delta").cache()
    try {
      assert(surv.count() > 0)
      // the planted c3/c4 twins exercised the within-delta stage: it
      // must drop at least one doc at sf0.001
      assert(surv.count() < s3.count(),
        "within-delta banding dropped nothing — the twin fixture is dead")
      // for every base id with BOTH twins alive at stage 3, the stage-4
      // survivor must be the pair min (c=4 = id3 − 1, the more negative
      // id): a c3 surviving while its c4 sibling dropped would invert
      // the greedy convention. Twins are keyed by the exact id pair
      // (id4 = id3 − 1), not a mod decomposition — -(4m+4) is ≡ 0
      // mod 4 and would alias the next base id's class frame.
      val c3 = s3.select(col("doc_id").as("id3"))
        .where(expr("pmod(-doc_id, 4) = 3"))
      val bothAt3 = c3.withColumn("id4", col("id3") - 1)
        .join(s3.select(col("doc_id").as("id4")), "id4")
      val survIds = surv.select(col("doc_id")).cache()
      val twinKept3 = bothAt3
        .join(survIds.select(col("doc_id").as("id3")), "id3")
        .join(survIds.select(col("doc_id").as("id4")), "id4", "left_anti")
      assert(twinKept3.count() == 0,
        "a c3 twin survived while its smaller-id c4 sibling was dropped — survivor convention violated")
      // the sealed invariant: re-deriving banding + exact Jaccard on the
      // SURVIVOR set yields zero pairs at >= 0.5 — the greedy stage left
      // no detectable near-dup pair behind (covers twins and any
      // accidental cross-class pair alike)
      val ssh = DedupOps.shingleRows(surv, "text", 5)
      val pairs = DedupOps.candidatePairs(DedupOps.minhashSignatureRows(ssh, 4))
      val sets = ssh.groupBy("doc_id").agg(collect_list(col("s")).as("shs"))
      assert(DedupOps.jaccardForPairs(pairs, sets)
        .where(col("jaccard") >= 0.5).count() == 0,
        "two stage-4 survivors are still near-dups of each other")
      // and no survivor collides with base exactly
      val baseMd5 = Tables.load(spark, sf001, "documents")
        .select(md5(col("text")).as("h")).distinct()
      assert(surv.select(md5(col("text")).as("h"))
        .join(baseMd5, Seq("h"), "left_semi").count() == 0)
      survIds.unpersist()
    } finally { s3.unpersist(); surv.unpersist() }
  }

  test("q237 weekday baseline: counts match the independent daily aggregate") {
    val df = run("q237_weekday_baseline").cache()
    try {
      assert(df.count() > 0)
      val daily = Tables.events(spark, sf001)
        .select(col("event_type"), expr("unix_timestamp(ts) div 86400").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("want_n"))
      val mismatched = df.join(daily, Seq("event_type", "day"))
        .where(col("n") =!= col("want_n")).count()
      assert(mismatched == 0)
      // deviation floor: n ≥ 1 and base ≥ 2 ⇒ dev_bp ≥ -10000 + something
      assert(df.where(col("dev_bp") < -10000).count() == 0)
    } finally df.unpersist()
  }
}
