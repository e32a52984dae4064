package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-7 widening (q253–q258) that the
  * value-equality oracle cannot express: algebraic identities of the
  * TPC-H Q7/Q8 topologies cross-checked by independent recounts, the
  * Adamic–Adar weight-band and recompute identities, bigram-LM
  * probability-mass bounds, the token-budget share/allocation budget
  * laws, and AUC equivalence against a brute-force pairwise
  * Mann–Whitney count. All run the REGISTERED queries against sf0.001,
  * so the pinned behavior is exactly what the driver verifies.
  */
class R15InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q253 nation trade: no self-pairs, pair space bounded, one pair matches a direct recount") {
    val df = run("q253_nation_trade").cache()
    try {
      val rows = df.select("supp_nation", "cust_nation", "n_rows", "rev_cents")
        .as[(String, String, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (sn, cn, n, rev) =>
        assert(sn != cn)
        assert(n > 0 && rev > 0)
      }
      // 25 nations ⇒ at most 25·24 ordered pairs
      assert(rows.length <= 600)
      // independent recount of one pair with the same cents quantization
      val (sn0, cn0, _, rev0) = rows.head
      val li = Tables.load(spark, sf001, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
      val want = li
        .join(Tables.load(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(spark, sf001, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(spark, sf001, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Tables.load(spark, sf001, "nation").select(col("n_nationkey").as("k1"),
          col("n_name").as("sn")), col("s_nationkey") === col("k1"))
        .join(Tables.load(spark, sf001, "nation").select(col("n_nationkey").as("k2"),
          col("n_name").as("cn")), col("c_nationkey") === col("k2"))
        .where(col("sn") === sn0 && col("cn") === cn0)
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
          .cast("long")).as("r"))
        .as[Long].head()
      assert(want == rev0)
    } finally df.unpersist()
  }

  test("q254 market share: share is a valid bp fraction of a dominating total, grand total matches recount") {
    val df = run("q254_market_share").cache()
    try {
      val rows = df.select("o_year", "total_cents", "nation7_cents", "share_bp")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (_, tot, n7, bp) =>
        assert(n7 >= 0 && n7 <= tot)
        assert(bp >= 0 && bp <= 10000)
        // floor-bp identity
        assert(bp == n7 * 10000 / math.max(tot, 1L))
      }
      // grand total matches an independent PROMO×ASIA recount
      val asiaKeys = Tables.load(spark, sf001, "nation")
        .join(Tables.load(spark, sf001, "region").where(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val want = Tables.load(spark, sf001, "lineitem")
        .join(Tables.load(spark, sf001, "part").where(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.load(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(spark, sf001, "customer"), col("o_custkey") === col("c_custkey"))
        .join(asiaKeys, col("c_nationkey") === col("n_nationkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
          .cast("long"))).as[Long].head()
      assert(rows.map(_._2).sum == want)
    } finally df.unpersist()
  }

  test("q255 Adamic–Adar: weight band per common neighbor, order totality, top pair recomputes") {
    val df = run("q255_adamic_adar").cache()
    try {
      val rows = df.select("ca", "cb", "n_common", "aa_micro")
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      // per-part weight is floor(1e6/ln d), d ∈ [2, 50]: every common
      // neighbor contributes within [floor(1e6/ln 50), floor(1e6/ln 2)]
      val wMin = math.floor(1e6 / math.log(50)).toLong
      val wMax = math.floor(1e6 / math.log(2)).toLong
      rows.foreach { case (ca, cb, n, aa) =>
        assert(ca < cb)
        assert(n >= 1)
        assert(aa >= n * wMin && aa <= n * wMax)
      }
      // sorted by (aa desc, ca, cb) — a total order
      assert(rows.sameElements(rows.sortBy(r => (-r._4, r._1, r._2))))
      // recompute the top pair's score from scratch
      val (ca0, cb0, n0, aa0) = rows.head
      val e = Tables.load(spark, sf001, "lineitem")
        .join(Tables.load(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      val parts = e.groupBy("p").agg(count(lit(1)).as("deg"))
        .where(col("deg").between(2, 50))
      val shared = e.where(col("c") === ca0).select(col("p"))
        .intersect(e.where(col("c") === cb0).select(col("p")))
        .join(parts, "p")
        .agg(count(lit(1)).as("n"),
          sum(floor(lit(1e6) / log(col("deg"))).cast("long")).as("aa"))
        .as[(Long, Long)].head()
      assert(shared == ((n0, aa0)))
    } finally df.unpersist()
  }

  test("q256 surprisal: positive micro-nats under the vocab ceiling, smoothed mass stays sub-unit") {
    val df = run("q256_bigram_surprisal").cache()
    try {
      val rows = df.select("doc_id", "n_bg", "surprisal_micro")
        .as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      // −ln p > 0 for any smoothed bigram (p < 1 strictly: denominator
      // adds the full vocab), and the mean can never exceed the global
      // ceiling −ln(1/(max_ca + V)) = ln(max_ca + V)
      val tk = Tables.load(spark, sf001, "documents")
        .select(split(lower(col("text")), " ").as("tk"))
        .where(size(col("tk")) >= 2)
      val v = tk.select(explode(col("tk")).as("t")).agg(countDistinct("t")).as[Long].head()
      val bg = tk.select(explode(expr(
        "transform(sequence(0, size(tk) - 2), i -> struct(tk[i] AS a, tk[i + 1] AS b))")).as("g"))
        .select(col("g.a"), col("g.b"))
      val maxCa = bg.groupBy("a").agg(count(lit(1)).as("ca"))
        .agg(max("ca")).as[Long].head()
      val ceilMicro = math.ceil(math.log((maxCa + v).toDouble) * 1e6).toLong
      rows.foreach { case (_, n, sm) =>
        assert(n >= 1)
        assert(sm > 0 && sm <= ceilMicro)
      }
      // add-1 smoothing keeps per-history probability mass below 1:
      // Σ_observed (c(a,b)+1)/(c(a)+V) = (c(a)+distinct b)/(c(a)+V) ≤ 1
      val mass = bg.groupBy("a", "b").agg(count(lit(1)).as("cab"))
        .groupBy("a").agg(sum("cab").as("ca"), count(lit(1)).as("nb"))
        .select(((col("ca") + col("nb")) / (col("ca") + lit(v))).as("m"))
        .agg(max("m")).as[Double].head()
      assert(mass <= 1.0)
    } finally df.unpersist()
  }

  test("q257 token budget: shares sum to ≈10000 bp, allocation never exceeds the budget, epochs identity") {
    val rows = run("q257_token_budget")
      .select("source", "n_tok", "share_bp", "alloc_tok", "epochs_centi")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nSrc = rows.length
    val bpSum = rows.map(_._3).sum
    // each share floors away < 1 bp: total ∈ (10000 − nSrc, 10000]
    assert(bpSum <= 10000 && bpSum > 10000 - nSrc)
    assert(rows.map(_._4).sum <= 1000000000L)
    rows.foreach { case (_, nTok, bp, alloc, ep) =>
      assert(bp >= 0 && bp <= 10000)
      assert(alloc == bp * 1000000000L / 10000)
      assert(ep == alloc * 100 / nTok)
    }
  }

  test("q258 AUC: bp-bounded and identical to the brute-force pairwise Mann–Whitney on quantized scores") {
    val (npos, nneg, aucBp) = run("q258_auc_rank")
      .as[(Long, Long, Long)].head()
    assert(aucBp >= 0 && aucBp <= 10000)
    val emb = Tables.load(spark, sf001, "embeddings")
    assert(npos + nneg == emb.count())
    // brute-force: quantize every score, count pos>neg pairs (wins) and
    // ties in half-units — tiny at sf0.001, quadratic by design
    val q = emb.select(
      greatest(lit(-4096L), least(lit(4095L),
        floor(element_at(col("embedding"), 1) * 4096.0).cast("long"))).as("sq"),
      (col("label") < 5).cast("long").as("y"))
    val pos = q.where(col("y") === 1).select(col("sq").as("sp"))
    val neg = q.where(col("y") === 0).select(col("sq").as("sn"))
    val u2 = pos.crossJoin(neg)
      .agg(sum(when(col("sp") > col("sn"), 2L)
        .when(col("sp") === col("sn"), 1L).otherwise(0L)))
      .as[Long].head()
    assert(aucBp == u2 * 10000 / (2 * npos * nneg))
  }
}
