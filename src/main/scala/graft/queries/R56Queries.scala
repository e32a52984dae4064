package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-11 fourth widening — stats-maintenance POLICY, decided the
  * house way (the q377 schedule pattern applied to ANALYZE itself):
  *
  *  - q398 prices three histogram-refresh policies over a 4-step ingest
  *    with a drift planted mid-stream (q380's re-denomination shape):
  *    never rebuild (additive merges only), rebuild every delta, and
  *    rebuild on q380's out-of-range gate. Accuracy is graded per step
  *    against exact counts on the CURRENT range's quartile battery;
  *    cost is the extra full scans each policy pays. The gate policy is
  *    certified to match rebuild-every-delta's accuracy at one third of
  *    its rebuild cost — the reason drift gates exist;
  *  - q399 replaces q390's uniform salt with a per-key frontier (12x
  *    less dim replication for the same 2x balance gate);
  *  - q400 chooses WHERE the 32 range-partition boundaries sit on the
  *    naturally skewed events.value (the 256-bin sketch's cumulative
  *    wins: balanced, range-disjoint, 256 values of state);
  *  - q401 executes the pruning q400's layout exists for: zone maps
  *    read back from the applied assignments, a probe battery showing
  *    amp 1.0x / ~95% pruned on the range layout vs ~20x unprunable on
  *    hash, soundness (missed = 0) certified from data;
  *  - q402 executes the runtime bloom semi-join filter q351 priced:
  *    a 65536-bit broadcast bitmap probed in one keyed pass, no false
  *    negatives certified, measured FPP on the fill^4 bound, and the
  *    apply decision splitting the selective vs broad scenarios.
  */
object R56Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** q399's adaptive rule as a shared table builder: each key's salt is
    * the smallest power of two with f_k / salt ≤ n / target, capped at
    * 64. q403 executes the join at the chosen target through this SAME
    * function, so the decision and the execution cannot drift.
    */
  private[graft] def adaptiveSaltTable(kc: DataFrame, nk: DataFrame, target: Int): DataFrame =
    kc.crossJoin(broadcast(nk))
      .select(col("k"), expr(
        s"CAST(CASE WHEN f * $target <= n THEN 1 WHEN f * $target <= 2 * n THEN 2 " +
          s"WHEN f * $target <= 4 * n THEN 4 WHEN f * $target <= 8 * n THEN 8 " +
          s"WHEN f * $target <= 16 * n THEN 16 WHEN f * $target <= 32 * n THEN 32 " +
          "ELSE 64 END AS BIGINT)").as("sa"))

  /** The same ladder in DuckDB dialect over a `kc CROSS JOIN nk` scope
    * exposing columns f and n.
    */
  private[graft] def saltLadderSql(target: Int): String =
    s"CASE WHEN f * $target <= n THEN 1 WHEN f * $target <= 2 * n THEN 2 " +
      s"WHEN f * $target <= 4 * n THEN 4 WHEN f * $target <= 8 * n THEN 8 " +
      s"WHEN f * $target <= 16 * n THEN 16 WHEN f * $target <= 32 * n THEN 32 ELSE 64 END"

  /** q400's CHOSEN boundary rule as a shared builder — the 256-bin
    * sketch's cumulative mapped onto 32 partitions. q400 prices it,
    * q401 prunes on it, q405 classifies columns on it and LayoutSpec
    * writes it physically, all through these two functions, so the
    * decision and its appliers cannot drift. `mx` is the one-row
    * (a, w, n) stats frame over the value column `v`.
    */
  private[graft] def sketchBmap(rows: DataFrame, mx: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rows.crossJoin(broadcast(mx))
      .groupBy(expr("least(255, (v - a) * 256 div w)").as("b"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("cum", sum("bc").over(Window.orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(mx))
      .select(col("b"), expr("least(31, cum * 32 div (n + 1))").as("p"))
  }

  /** Every row of `rows` with its assigned sketch-range partition `p`. */
  private[graft] def sketchRangeAssign(rows: DataFrame, mx: DataFrame): DataFrame =
    rows.crossJoin(broadcast(mx))
      .withColumn("b", expr("least(255, (v - a) * 256 div w)"))
      .join(broadcast(sketchBmap(rows, mx)), "b")

  val specs: Seq[QuerySpec] = Seq(

    // q398 — ANALYZE-POLICY CHOOSER, EXECUTED: q380 built the drift
    // gate, q388 executed one rebuild; the OPERATIONAL question is the
    // standing policy. Four quarterly ingest steps; from step 3 on, the
    // values arrive shifted one full original range width up (the
    // persistent re-denomination bug — planted, q293 dead-fixture
    // rule: the natural corpus never drifts). Three policies maintain
    // the 16-bin histogram, all paying the same per-delta merge scans;
    // they differ in FULL rebuild scans: (1) never — boundaries frozen
    // at the step-1 build, deltas merged additively forever; (2)
    // every_delta — boundaries re-frozen on each step's whole prefix;
    // (3) on_gate — q380's trigger (out-of-range delta share > 1%)
    // fires the rebuild, measured to fire EXACTLY ONCE (step 3: 100%
    // of the delta out of range; steps 2 and 4 sit at <= 3 bp — the
    // gate separates drift from range jitter by four orders of
    // magnitude). Accuracy: at every step, the current prefix range's
    // four quartile predicates are estimated from each policy's
    // current histogram and graded against exact; a policy's
    // worst_qerr_bp is its max over all steps. Measured: never is
    // BLOWN from step 3 (drifted-region predicates estimate 0, and
    // bin 15's clamp-fattening overprices the old top quartile);
    // every_delta and on_gate both stay at ~1x; on_gate pays one
    // prefix rebuild where every_delta pays three. chosen = cheapest
    // in-band policy — the gate. Scale: maintenance cost IS the
    // readout (extra_scan_rows — at 100 TB the rebuilds are the bill);
    // the per-step grading passes are this query's grader convention.
    QuerySpec(
      "q398_analyze_policy",
      (s, d) => {
        val o0 = t(s, d, "orders").select(
          quarter(col("o_orderdate")).cast("long").as("st"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("v"))
        val w0 = o0.agg(expr("max(v) - min(v) + 1").as("w0"))
        val o = o0.crossJoin(broadcast(w0))
          .select(col("st"),
            expr("CASE WHEN st >= 3 THEN v + w0 ELSE v END").as("v"))
          .localCheckpoint(true) // eager: consumed by concurrent legs below
        def mxOf(cond: String): DataFrame = o.where(cond)
          .agg(min("v").as("bmin"), expr("max(v) - min(v) + 1").as("bw"))
        // the two reused boundary frames share no lineage below `o` —
        // materialize their checkpoints concurrently (graft.Par)
        val (mx1, mx3) = graft.Par.par2(
          mxOf("st <= 1").localCheckpoint(true),
          mxOf("st <= 3").localCheckpoint(true))
        def histOn(j: Int, mx: DataFrame): DataFrame =
          o.where(s"st <= $j").crossJoin(broadcast(mx))
            .groupBy(expr(R50Queries.histBin16("v", "bmin", "bw")).as("b"))
            .agg(count(lit(1)).as("cnt"))
            .crossJoin(broadcast(mx))
            .select(col("cnt"),
              expr("bmin + b * bw div 16").as("blo"),
              expr("bmin + (b + 1) * bw div 16 - 1").as("bhi"))
        def preds(j: Int): DataFrame = mxOf(s"st <= $j")
          .select(col("bmin").as("pmin"), col("bw").as("pw"),
            explode(sequence(lit(0L), lit(3L))).as("pred_id"))
          .select(col("pred_id"),
            expr("pmin + pred_id * pw div 4").as("lo"),
            expr("pmin + (pred_id + 1) * pw div 4 - 1").as("hi"))
        def estB(j: Int, mx: DataFrame): DataFrame =
          preds(j).join(broadcast(histOn(j, mx)), expr("bhi >= lo AND blo <= hi"), "left")
            .groupBy("pred_id")
            .agg(coalesce(sum(expr(
              "(cnt * greatest(0, least(hi, bhi) - greatest(lo, blo) + 1) * 1000000) div (bhi - blo + 1)")),
              lit(0L)).as("em"))
            .select(col("pred_id"), expr("em div 1000000").as("est"))
        def actB(j: Int): DataFrame =
          o.where(s"st <= $j").crossJoin(broadcast(preds(j)))
            .where(expr("v BETWEEN lo AND hi"))
            .groupBy("pred_id").agg(count(lit(1)).as("act"))
        // left join from est to act with coalesce(act, 0): a phantom
        // predicate (est > 0, act = 0 — no matching rows at a step) must
        // blow worst_qerr_bp, not silently vanish from the max (the q395
        // phantom_indep convention applied to the policy grader)
        //
        // The three policies reference 12 (step, boundary) grading legs
        // of which only EIGHT are distinct — (1..4, mx1) is shared by
        // never and gate's early steps, (3, mx3) by gate and every.
        // Grade each distinct leg ONCE (its 1-row max checkpointed, all
        // eight built concurrently via graft.Par — guide §2.6) and read
        // each policy's worst as the max over its legs' 1-row results:
        // identical maxima, 12 → 8 est/act passes, and the leg passes
        // overlap instead of running back-to-back.
        def legWorst(j: Int, mx: DataFrame): DataFrame =
          estB(j, mx).join(actB(j), Seq("pred_id"), "left")
            .select(expr("greatest(est * 10000 div greatest(coalesce(act, 0), 1), coalesce(act, 0) * 10000 div greatest(est, 1))")
              .as("qerr"))
            .agg(max("qerr").as("qerr"))
        val legKeys: Seq[(Int, String)] = Seq(
          1 -> "mx1", 2 -> "mx1", 3 -> "mx1", 4 -> "mx1",
          2 -> "mx2", 3 -> "mx3", 4 -> "mx4", 4 -> "mx3")
        val mxByName: Map[String, DataFrame] = Map(
          "mx1" -> mx1, "mx2" -> mxOf("st <= 2"), "mx3" -> mx3,
          "mx4" -> mxOf("st <= 4"))
        val legW: Map[(Int, String), DataFrame] =
          legKeys.zip(graft.Par(legKeys.map { case (j, mxn) =>
            () => legWorst(j, mxByName(mxn)).localCheckpoint(true)
          }: _*)).toMap
        def worstOf(steps: Seq[(Int, String)], name: String): DataFrame =
          steps.map(legW(_)).reduce(_ unionByName _).agg(max("qerr").as(name))
        val never = worstOf(Seq(1 -> "mx1", 2 -> "mx1", 3 -> "mx1", 4 -> "mx1"), "w_never")
        val every = worstOf(Seq(1 -> "mx1", 2 -> "mx2", 3 -> "mx3", 4 -> "mx4"), "w_every")
        val gate = worstOf(Seq(1 -> "mx1", 2 -> "mx1", 3 -> "mx3", 4 -> "mx3"), "w_gate")
        // the gate trace: oor share of each delta against the CURRENT
        // boundaries (mx1 for steps 2-3, mx3 for step 4) — fires once
        def oorShare(j: Int, mx: DataFrame): DataFrame =
          o.where(s"st = $j").crossJoin(broadcast(mx))
            .agg(expr("sum(CASE WHEN v < bmin OR v > bmin + bw - 1 THEN 1 ELSE 0 END) * 10000 div count(1)")
              .as(s"oor_bp_$j"))
        val fires = oorShare(2, mx1).crossJoin(broadcast(oorShare(3, mx1)))
          .crossJoin(broadcast(oorShare(4, mx3)))
          .select(expr("CAST((CASE WHEN oor_bp_2 > 100 THEN 1 ELSE 0 END) + (CASE WHEN oor_bp_3 > 100 THEN 1 ELSE 0 END) + (CASE WHEN oor_bp_4 > 100 THEN 1 ELSE 0 END) AS BIGINT)")
            .as("gate_fires"))
        def pr(j: Int): DataFrame = o.where(s"st <= $j").agg(count(lit(1)).as(s"p$j"))
        val scans = pr(2).crossJoin(broadcast(pr(3))).crossJoin(broadcast(pr(4)))
        val one = never.crossJoin(broadcast(every)).crossJoin(broadcast(gate))
          .crossJoin(broadcast(fires)).crossJoin(broadcast(scans))
        val legs = one.select(explode(array(
            struct(lit("1:never").as("policy"), lit(0L).as("rebuilds"),
              lit(0L).as("extra_scan_rows"), col("w_never").as("worst_qerr_bp")),
            struct(lit("2:every_delta").as("policy"), lit(3L).as("rebuilds"),
              expr("p2 + p3 + p4").as("extra_scan_rows"), col("w_every").as("worst_qerr_bp")),
            struct(lit("3:on_gate").as("policy"), col("gate_fires").as("rebuilds"),
              col("p3").as("extra_scan_rows"), col("w_gate").as("worst_qerr_bp")))).as("z"),
            col("gate_fires"))
          .select(col("z.policy").as("policy"), col("z.rebuilds").as("rebuilds"),
            col("z.extra_scan_rows").as("extra_scan_rows"),
            col("z.worst_qerr_bp").as("worst_qerr_bp"), col("gate_fires"))
          .withColumn("in_band",
            expr("CAST(CASE WHEN worst_qerr_bp <= 20000 THEN 1 ELSE 0 END AS BIGINT)"))
        legs.crossJoin(broadcast(legs.where(col("in_band") === 1L)
            .agg(min("extra_scan_rows").as("mn"))))
          .select(col("policy"), col("rebuilds"), col("extra_scan_rows"),
            col("worst_qerr_bp"), col("gate_fires"), col("in_band"),
            expr("CAST(CASE WHEN in_band = 1 AND extra_scan_rows = mn THEN 1 ELSE 0 END AS BIGINT)")
              .as("chosen"))
          .orderBy("policy")
      },
      Some {
        def mxSql(cond: String): String =
          s"SELECT min(v) AS bmin, max(v) - min(v) + 1 AS bw FROM o WHERE $cond"
        def histSql(j: Int, mxCte: String): String =
          s"""SELECT cnt, bmin + b * bw // 16 AS blo, bmin + (b + 1) * bw // 16 - 1 AS bhi
            FROM (SELECT least(15, greatest(0, (v - bmin) * 16 // bw)) AS b, count(*) AS cnt
                  FROM o CROSS JOIN $mxCte WHERE st <= $j GROUP BY 1) h CROSS JOIN $mxCte"""
        def predsSql(j: Int): String =
          s"""SELECT j AS pred_id, pmin + j * pw // 4 AS lo, pmin + (j + 1) * pw // 4 - 1 AS hi
            FROM (SELECT min(v) AS pmin, max(v) - min(v) + 1 AS pw FROM o WHERE st <= $j) m,
            (SELECT unnest(generate_series(0, 3)) AS j) g"""
        def qerrSql(j: Int, mxCte: String): String =
          s"""SELECT greatest(est * 10000 // greatest(coalesce(act, 0), 1), coalesce(act, 0) * 10000 // greatest(est, 1)) AS qerr
            FROM (SELECT p.pred_id, coalesce(sum((hb.cnt * greatest(0, least(p.hi, hb.bhi) - greatest(p.lo, hb.blo) + 1) * 1000000) // (hb.bhi - hb.blo + 1)), 0) // 1000000 AS est
                  FROM (${predsSql(j)}) p LEFT JOIN (${histSql(j, mxCte)}) hb ON hb.bhi >= p.lo AND hb.blo <= p.hi GROUP BY 1) e
            LEFT JOIN (SELECT p.pred_id, count(*) AS act FROM (${predsSql(j)}) p JOIN o ON o.st <= $j AND o.v BETWEEN p.lo AND p.hi GROUP BY 1) a ON a.pred_id = e.pred_id"""
        def worstSql(steps: Seq[(Int, String)]): String =
          steps.map { case (j, mx) => qerrSql(j, mx) }
            .map(x => s"SELECT qerr FROM ($x) q")
            .mkString("SELECT max(qerr) AS w FROM (", " UNION ALL ", ") u")
        val wNever = worstSql(Seq(1 -> "mx1", 2 -> "mx1", 3 -> "mx1", 4 -> "mx1"))
        val wEvery = worstSql(Seq(1 -> "mx1", 2 -> "mx2", 3 -> "mx3", 4 -> "mx4"))
        val wGate = worstSql(Seq(1 -> "mx1", 2 -> "mx1", 3 -> "mx3", 4 -> "mx3"))
        def oorSql(j: Int, mxCte: String): String =
          s"SELECT sum(CASE WHEN v < bmin OR v > bmin + bw - 1 THEN 1 ELSE 0 END) * 10000 // count(*) AS oor FROM o CROSS JOIN $mxCte WHERE st = $j"
        s"""WITH o0 AS (SELECT CAST(quarter(o_orderdate) AS BIGINT) AS st, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v FROM orders), w0 AS (SELECT max(v) - min(v) + 1 AS w0 FROM o0), o AS (SELECT st, CASE WHEN st >= 3 THEN v + (SELECT w0 FROM w0) ELSE v END AS v FROM o0), mx1 AS (${mxSql("st <= 1")}), mx2 AS (${mxSql("st <= 2")}), mx3 AS (${mxSql("st <= 3")}), mx4 AS (${mxSql("st <= 4")}), wn AS ($wNever), we AS ($wEvery), wg AS ($wGate), fires AS (SELECT (CASE WHEN (${oorSql(2, "mx1")}) > 100 THEN 1 ELSE 0 END) + (CASE WHEN (${oorSql(3, "mx1")}) > 100 THEN 1 ELSE 0 END) + (CASE WHEN (${oorSql(4, "mx3")}) > 100 THEN 1 ELSE 0 END) AS gate_fires), scans AS (SELECT (SELECT count(*) FROM o WHERE st <= 2) AS p2, (SELECT count(*) FROM o WHERE st <= 3) AS p3, (SELECT count(*) FROM o WHERE st <= 4) AS p4), legs AS (SELECT '1:never' AS policy, 0 AS rebuilds, 0 AS extra_scan_rows, (SELECT w FROM wn) AS worst_qerr_bp FROM scans UNION ALL SELECT '2:every_delta', 3, p2 + p3 + p4, (SELECT w FROM we) FROM scans UNION ALL SELECT '3:on_gate', (SELECT gate_fires FROM fires), p3, (SELECT w FROM wg) FROM scans), bands AS (SELECT *, CASE WHEN worst_qerr_bp <= 20000 THEN 1 ELSE 0 END AS in_band FROM legs), mn AS (SELECT min(CASE WHEN in_band = 1 THEN extra_scan_rows END) AS mn FROM bands) SELECT policy, CAST(rebuilds AS BIGINT) AS rebuilds, CAST(extra_scan_rows AS BIGINT) AS extra_scan_rows, CAST(worst_qerr_bp AS BIGINT) AS worst_qerr_bp, CAST((SELECT gate_fires FROM fires) AS BIGINT) AS gate_fires, CAST(in_band AS BIGINT) AS in_band, CAST(CASE WHEN in_band = 1 AND extra_scan_rows = (SELECT mn FROM mn) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM bands CROSS JOIN mn ORDER BY policy"""
      },
      "A/S ext: ANALYZE-policy chooser EXECUTED — never / every-delta / on-gate histogram maintenance priced over a 4-step ingest with a persistent drift planted at step 3; never is blown (zero estimates + clamp-fattened bin), the q380 gate fires exactly once and matches every-delta's accuracy at one third of its rebuild scans — chosen = the gate"),

    // q399 — ADAPTIVE PER-KEY SALT FRONTIER: q390 salted every sub-key
    // uniformly; on a zipf key that buys balance by replicating the
    // WHOLE dim 64x when only the head needed splitting. The adaptive
    // rule salts each key by its own mass — salt_k = the smallest power
    // of two with f_k / salt_k ≤ n / target — from the exact per-key
    // frequency table (a legitimate ANALYZE stat here: the planted key
    // domain is ≤ ~71 values; q386's bounded-domain class). Six
    // strategies on the q391 zipf corpus: no salt (the 8.2x-uniform
    // baseline — one partition owns g5), uniform 64-way (q390's answer:
    // ~1.6x but 64 replicas of EVERY key = 4544 dim rows), and the
    // adaptive rule at four nested targets (n/32 … n/256 — all four
    // salt tables derive from the ONE frequency pass; coarser targets
    // under-split the head and stall at ~2.6-3.7x because a 32-bucket
    // hash placement adds collision mass on top of sub-key mass —
    // the measured gap between the sub-key bound and what placement
    // delivers). The frontier's answer at every SF: target n/256 is
    // the first adaptive member inside q390's 2x gate, at ~368
    // replicas — TWELVE times less replication than uniform for the
    // same gate — and chosen picks it by min replication among gate
    // members. Scale: one keyed frequency pass + one loads pass per
    // candidate (the offline sweep); the shipped config is one
    // broadcast salt table, and replication is the 100 TB bill here.
    QuerySpec(
      "q399_adaptive_salt",
      (s, d) => {
        import R39Queries.{md5Bucket, skewSummary}
        // ONE corpus pass (guide §2.3 aggregate-before-you-shuffle):
        // every strategy leg's 32-way bucket hash depends only on
        // (k, rh % 64) — k has ≤71 distinct values by hhKeyed's
        // construction and every rung of the salt ladder divides 64
        // (powers of two ≤ 64), so pmod(rh, sa) = pmod(rh % 64, sa) and
        // rh itself never needs to leave this grid. Aggregating once to
        // the ≤71·64-row (k, r64, c) table replaces six corpus-scale
        // md5Bucket passes with six tiny folds; every leg's per-bucket
        // load is identical by Σ-additivity of the counts.
        val c64 = R54Queries.hhKeyed(t(s, d, "events"))
          .select(col("k"),
            expr("CAST(conv(substring(md5(concat('sl:', CAST(eid AS STRING))), 1, 10), 16, 10) AS BIGINT) % 64")
              .as("r64"))
          .groupBy("k", "r64").agg(count(lit(1)).as("c"))
          .localCheckpoint(false)
        val kc = c64.groupBy("k").agg(sum("c").as("f")).localCheckpoint(false)
        val nk = kc.agg(count(lit(1)).as("n_keys"), sum("f").as("n"))
        def saltOf(target: Int): DataFrame = adaptiveSaltTable(kc, nk, target)
        def summar(loads: DataFrame, name: String, repl: DataFrame): DataFrame =
          skewSummary(loads).crossJoin(broadcast(repl))
            .select(lit(name).as("strategy"), col("repl_rows"), col("parts_used"),
              col("max_load"), col("skew_bp"),
              expr("CAST(CASE WHEN skew_bp <= 20000 THEN 1 ELSE 0 END AS BIGINT)")
                .as("meets_bal"))
        val none = summar(
          c64.groupBy(md5Bucket(col("k"), 32).as("p")).agg(sum("c").as("c")),
          "1:none", nk.select(col("n_keys").as("repl_rows")))
        val uni = summar(
          c64.groupBy(md5Bucket(concat(col("k"), lit(":"),
            col("r64").cast("string")), 32).as("p")).agg(sum("c").as("c")),
          "2:uniform64", nk.select(expr("n_keys * 64").as("repl_rows")))
        val adapt = Seq(32, 64, 128, 256).map { tg =>
          val sa = saltOf(tg).localCheckpoint(false)
          summar(
            c64.join(broadcast(sa), "k")
              .groupBy(md5Bucket(concat(col("k"), lit(":"),
                pmod(col("r64"), col("sa")).cast("string")), 32).as("p"))
              .agg(sum("c").as("c")),
            f"${2 + Seq(32, 64, 128, 256).indexOf(tg) + 1}%d:adaptive_t$tg",
            sa.agg(sum("sa").as("repl_rows")))
        }
        val perS = (Seq(none, uni) ++ adapt).reduce(_ unionByName _)
        perS.crossJoin(broadcast(perS.where(col("meets_bal") === 1L)
            .agg(min("repl_rows").as("mn"))))
          .select(col("strategy"), col("repl_rows"), col("parts_used"),
            col("max_load"), col("skew_bp"), col("meets_bal"),
            expr("CAST(CASE WHEN meets_bal = 1 AND repl_rows = mn THEN 1 ELSE 0 END AS BIGINT)")
              .as("chosen"))
          .orderBy("strategy")
      },
      Some {
        import R39Queries.md5BucketSql
        val keySql = "CASE WHEN pu < 63 THEN 'g' || CAST(CAST(floor(log2(pu + 1)) AS BIGINT) AS VARCHAR) ELSE 'u' || CAST(pu AS VARCHAR) END"
        def adaptLeg(idx: Int, tg: Int): String =
          s"""SELECT '$idx:adaptive_t$tg' AS strategy,
            (SELECT sum(sa) FROM (SELECT CASE WHEN f * $tg <= (SELECT n FROM nk) THEN 1 WHEN f * $tg <= 2 * (SELECT n FROM nk) THEN 2 WHEN f * $tg <= 4 * (SELECT n FROM nk) THEN 4 WHEN f * $tg <= 8 * (SELECT n FROM nk) THEN 8 WHEN f * $tg <= 16 * (SELECT n FROM nk) THEN 16 WHEN f * $tg <= 32 * (SELECT n FROM nk) THEN 32 ELSE 64 END AS sa FROM kc) z) AS repl_rows,
            count(*) AS parts_used, max(c) AS max_load, max(c) * 32 * 10000 // sum(c) AS skew_bp
            FROM (SELECT ${md5BucketSql("ky.k || ':' || CAST(ky.rh % sa.sa AS VARCHAR)", 32)} AS p, count(*) AS c
                  FROM keyed ky JOIN (SELECT k, CASE WHEN f * $tg <= (SELECT n FROM nk) THEN 1 WHEN f * $tg <= 2 * (SELECT n FROM nk) THEN 2 WHEN f * $tg <= 4 * (SELECT n FROM nk) THEN 4 WHEN f * $tg <= 8 * (SELECT n FROM nk) THEN 8 WHEN f * $tg <= 16 * (SELECT n FROM nk) THEN 16 WHEN f * $tg <= 32 * (SELECT n FROM nk) THEN 32 ELSE 64 END AS sa FROM kc) sa ON sa.k = ky.k GROUP BY 1) g"""
        val legs = Seq(
          s"""SELECT '1:none' AS strategy, (SELECT n_keys FROM nk) AS repl_rows, count(*) AS parts_used, max(c) AS max_load, max(c) * 32 * 10000 // sum(c) AS skew_bp FROM (SELECT ${md5BucketSql("k", 32)} AS p, count(*) AS c FROM keyed GROUP BY 1) g""",
          s"""SELECT '2:uniform64', (SELECT n_keys * 64 FROM nk), count(*), max(c), max(c) * 32 * 10000 // sum(c) FROM (SELECT ${md5BucketSql("k || ':' || CAST(rh % 64 AS VARCHAR)", 32)} AS p, count(*) AS c FROM keyed GROUP BY 1) g""",
          adaptLeg(3, 32), adaptLeg(4, 64), adaptLeg(5, 128), adaptLeg(6, 256))
          .mkString(" UNION ALL ")
        s"""WITH keyed AS (SELECT $keySql AS k, CAST(concat('0x', substr(md5('sl:' || CAST(event_id AS VARCHAR)), 1, 10)) AS BIGINT) AS rh FROM (SELECT event_id, CAST(concat('0x', substr(md5('hh:' || CAST(event_id AS VARCHAR)), 1, 10)) AS BIGINT) % 128 AS pu FROM events) z), kc AS (SELECT k, count(*) AS f FROM keyed GROUP BY 1), nk AS (SELECT count(*) AS n_keys, sum(f) AS n FROM kc), legs AS ($legs), bands AS (SELECT *, CASE WHEN skew_bp <= 20000 THEN 1 ELSE 0 END AS meets_bal FROM legs), mn AS (SELECT min(CASE WHEN meets_bal = 1 THEN repl_rows END) AS mn FROM bands) SELECT strategy, CAST(repl_rows AS BIGINT) AS repl_rows, CAST(parts_used AS BIGINT) AS parts_used, CAST(max_load AS BIGINT) AS max_load, CAST(skew_bp AS BIGINT) AS skew_bp, CAST(meets_bal AS BIGINT) AS meets_bal, CAST(CASE WHEN meets_bal = 1 AND repl_rows = (SELECT mn FROM mn) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM bands CROSS JOIN mn ORDER BY strategy"""
      },
      "S/J ext: adaptive per-key salt frontier — each key salted by its own mass (smallest power of two meeting the per-sub-key target), four nested targets from ONE frequency pass next to no-salt and q390's uniform 64-way; target n/256 is the first gate member and ships 12x less dim replication than uniform for the same 2x balance"),

    // q400 — RANGE-PARTITION BOUNDARY CHOOSER (the write-side layout
    // decision): a table sorted-by-value prunes value predicates, but
    // WHERE the 32 boundaries sit decides whether the files are equal
    // or one writer drowns. events.value is the one genuinely skewed
    // numeric in the corpus (exponential-ish: equal-WIDTH boundaries
    // put 5.5-9.3x uniform in the densest partition and leave 2-5
    // partitions empty — measured, not planted). Four strategies, each
    // APPLIED (every row assigned, real loads measured): row-hash
    // (balanced ~1.0x but every partition spans the whole value range
    // — 496 of 496 range pairs overlap, zero pruning); equal-width
    // (range-disjoint but blown); boundaries read off the 256-bin
    // sketch's cumulative (q357/q381's summary driving a LAYOUT: the
    // bin→partition map is 256 rows of state, balance bounded by the
    // heaviest bin at ≤1.8x — inside the 2x gate); and exact element
    // quantiles (the ~1.0x gold standard, but its state is the full
    // value multiset — the sort a 100 TB writer cannot afford).
    // range_overlaps certifies disjointness from the APPLIED loads'
    // own min/max (self-join on the 32-row table), and chosen = the
    // cheapest strategy that is both in the balance gate and
    // range-disjoint: the sketch, at 256 values of state. Scale: the
    // sketch path is one map-side bin pass + a 256-row broadcast map —
    // repartitionByRange semantics without sampling the corpus twice.
    QuerySpec(
      "q400_range_boundaries",
      (s, d) => {
        import R39Queries.{md5Bucket, skewSummary}
        import org.apache.spark.sql.expressions.Window
        // eager: rows/mx are consumed by the four concurrent strategy
        // legs below; lazy final stages would be recomputed/raced
        val rows = t(s, d, "events").select(col("event_id").as("eid"),
          expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("v"))
          .localCheckpoint(true)
        val mx = rows.agg(min("v").as("a"), expr("max(v) - min(v) + 1").as("w"),
          count(lit(1)).as("n")).localCheckpoint(true)
        def summar(name: String, withP: DataFrame, state: DataFrame): DataFrame = {
          val loads = withP.groupBy("p").agg(count(lit(1)).as("c"),
            min("v").as("pmin"), max("v").as("pmax")).localCheckpoint(false)
          val ov = loads.as("x").join(broadcast(loads.as("y")),
              expr("x.p < y.p AND x.pmax >= y.pmin AND y.pmax >= x.pmin"))
            .agg(count(lit(1)).as("range_overlaps"))
          skewSummary(loads.select("p", "c"))
            .crossJoin(broadcast(ov)).crossJoin(broadcast(state))
            .select(lit(name).as("strategy"), col("parts_used"), col("max_load"),
              col("skew_bp"), col("range_overlaps"), col("state_units"),
              expr("CAST(CASE WHEN skew_bp <= 20000 THEN 1 ELSE 0 END AS BIGINT)")
                .as("meets_bal"),
              expr("CAST(CASE WHEN range_overlaps = 0 THEN 1 ELSE 0 END AS BIGINT)")
                .as("disjoint"))
        }
        // the four strategy legs are independent below rows/mx and each
        // materializes a `loads` checkpoint — build them concurrently
        // (graft.Par, guide §2.6)
        val legsPar = graft.Par(
          () => summar("1:hash",
            rows.withColumn("p",
              md5Bucket(concat(lit("h:"), col("eid").cast("string")), 32)),
            mx.select(lit(0L).as("state_units"))),
          () => summar("2:equal_width",
            rows.crossJoin(broadcast(mx))
              .withColumn("p", expr("least(31, (v - a) * 32 div w)")),
            mx.select(lit(2L).as("state_units"))),
          () => summar("3:sketch_cum256", sketchRangeAssign(rows, mx),
            mx.select(lit(256L).as("state_units"))),
          () => {
            val fracs = (1 to 31).map(_ / 32.0)
            val cuts = graft.ops.QuantileOps.exactElementQuantiles(
              rows.select("v"), "v", Seq.empty, fracs)
            val pExpr = "CAST(" + (1 to 31).map(i =>
              s"(CASE WHEN v > cut_$i THEN 1 ELSE 0 END)").mkString(" + ") + " AS BIGINT)"
            summar("4:exact_quantile",
              rows.crossJoin(broadcast(cuts)).withColumn("p", expr(pExpr)),
              mx.select(col("n").as("state_units")))
          })
        val perS = legsPar.reduce(_ unionByName _)
        perS.crossJoin(broadcast(perS
            .where(expr("meets_bal = 1 AND disjoint = 1"))
            .agg(min("state_units").as("mn"))))
          .select(col("strategy"), col("parts_used"), col("max_load"),
            col("skew_bp"), col("range_overlaps"), col("state_units"),
            col("meets_bal"), col("disjoint"),
            expr("CAST(CASE WHEN meets_bal = 1 AND disjoint = 1 AND state_units = mn THEN 1 ELSE 0 END AS BIGINT)")
              .as("chosen"))
          .orderBy("strategy")
      },
      Some {
        import R39Queries.md5BucketSql
        val exQ = graft.ops.QuantileOps.oracleSql(
          "(SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events) t",
          "v", Seq.empty, (1 to 31).map(_ / 32.0))
        val pSum = (1 to 31).map(i =>
          s"(CASE WHEN v > cut_$i THEN 1 ELSE 0 END)").mkString(" + ")
        def legSql(name: String, pSrc: String, state: String): String =
          s"""SELECT '$name' AS strategy, count(*) AS parts_used, max(c) AS max_load,
            max(c) * 32 * 10000 // sum(c) AS skew_bp,
            (SELECT count(*) FROM ($pSrc) x JOIN ($pSrc) y ON x.p < y.p AND x.pmax >= y.pmin AND y.pmax >= x.pmin) AS range_overlaps,
            $state AS state_units
            FROM ($pSrc) g"""
        val hashSrc = s"SELECT ${md5BucketSql("'h:' || CAST(event_id AS VARCHAR)", 32)} AS p, count(*) AS c, min(v) AS pmin, max(v) AS pmax FROM rows_s GROUP BY 1"
        val widthSrc = "SELECT least(31, (v - a) * 32 // w) AS p, count(*) AS c, min(v) AS pmin, max(v) AS pmax FROM rows_s CROSS JOIN mx GROUP BY 1"
        val sketchSrc = "SELECT bm.p, count(*) AS c, min(v) AS pmin, max(v) AS pmax FROM (SELECT v, least(255, (v - a) * 256 // w) AS b FROM rows_s CROSS JOIN mx) r JOIN bmap bm ON bm.b = r.b GROUP BY 1"
        val exactSrc = s"SELECT CAST($pSum AS BIGINT) AS p, count(*) AS c, min(v) AS pmin, max(v) AS pmax FROM rows_s CROSS JOIN cuts GROUP BY 1"
        s"""WITH rows_s AS (SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events), mx AS (SELECT min(v) AS a, max(v) - min(v) + 1 AS w, count(*) AS n FROM rows_s), bins AS (SELECT least(255, (v - a) * 256 // w) AS b, count(*) AS bc FROM rows_s CROSS JOIN mx GROUP BY 1), bmap AS (SELECT b, least(31, (sum(bc) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)) * 32 // ((SELECT n FROM mx) + 1)) AS p FROM bins), cuts AS (SELECT * FROM $exQ q), legs AS (${legSql("1:hash", hashSrc, "0")} UNION ALL ${legSql("2:equal_width", widthSrc, "2")} UNION ALL ${legSql("3:sketch_cum256", sketchSrc, "256")} UNION ALL ${legSql("4:exact_quantile", exactSrc, "(SELECT n FROM mx)")}), bands AS (SELECT *, CASE WHEN skew_bp <= 20000 THEN 1 ELSE 0 END AS meets_bal, CASE WHEN range_overlaps = 0 THEN 1 ELSE 0 END AS disjoint FROM legs), mn AS (SELECT min(CASE WHEN meets_bal = 1 AND disjoint = 1 THEN state_units END) AS mn FROM bands) SELECT strategy, CAST(parts_used AS BIGINT) AS parts_used, CAST(max_load AS BIGINT) AS max_load, CAST(skew_bp AS BIGINT) AS skew_bp, CAST(range_overlaps AS BIGINT) AS range_overlaps, CAST(state_units AS BIGINT) AS state_units, CAST(meets_bal AS BIGINT) AS meets_bal, CAST(disjoint AS BIGINT) AS disjoint, CAST(CASE WHEN meets_bal = 1 AND disjoint = 1 AND state_units = (SELECT mn FROM mn) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM bands CROSS JOIN mn ORDER BY strategy"""
      },
      "S/L ext: range-partition boundary chooser APPLIED — row-hash, equal-width, 256-bin-sketch-cumulative and exact-quantile boundaries all materialized into 32-way assignments of the naturally skewed events.value; balance and range-disjointness certified from the applied loads, and the sketch is chosen (in the 2x gate, zero overlapping ranges, 256 values of state vs the exact sort's full multiset)"),

    // q401 — ZONE-MAP PRUNING ON THE CHOSEN LAYOUT, EXECUTED: q400
    // picked the sketch-boundary range layout FOR pruning; this query
    // collects the pruning. The layout is materialized (every row
    // assigned), per-partition zone maps (min/max/rows) are read back
    // from the APPLIED assignment — the LayoutSpec convention, stats
    // from the artifact, not the plan — and a battery of three value
    // probes (the value windows of the three heaviest sketch
    // partitions: deterministic, guaranteed dense) is priced against
    // BOTH layouts. Per probe × layout: partitions whose zone map
    // intersects the probe, rows scanned (their total mass), exact
    // matching rows, amplification, and the SOUNDNESS certification —
    // matching rows outside the touched set (missed) must be ZERO,
    // the property that makes pruning a correctness-preserving
    // optimization rather than a sample. Measured: the range layout
    // touches exactly ONE partition per probe (amp = 1.0x, ~97% of
    // the table pruned) because disjoint ranges make zone maps sharp;
    // the hash layout's every zone map spans the whole value range —
    // all 32 partitions touched, amp ≈ 32x, pruned 0% — the q400
    // range_overlaps column turned into its scan bill. Scale: this
    // difference IS the 100 TB read path; the probes and zone maps
    // are 32-row arithmetic, the two assignment passes the apply.
    QuerySpec(
      "q401_zonemap_pruning",
      (s, d) => {
        import R39Queries.md5Bucket
        val rows = t(s, d, "events").select(col("event_id").as("eid"),
          expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").as("v"))
          .localCheckpoint(false)
        val mx = rows.agg(min("v").as("a"), expr("max(v) - min(v) + 1").as("w"),
          count(lit(1)).as("n")).localCheckpoint(false)
        def zones(assigned: DataFrame): DataFrame =
          assigned.groupBy("p").agg(count(lit(1)).as("c"),
            min("v").as("zmin"), max("v").as("zmax")).localCheckpoint(false)
        val zR = zones(sketchRangeAssign(rows, mx))
        val zH = zones(rows.withColumn("p",
          md5Bucket(concat(lit("h:"), col("eid").cast("string")), 32)))
        // the probe battery: the three heaviest range partitions' own
        // value windows (count desc, p asc — deterministic, dense)
        val probes = zR.orderBy(col("c").desc, col("p"))
          .limit(3).select(col("zmin").as("lo"), col("zmax").as("hi"))
          .withColumn("probe_id", expr("row_number() OVER (ORDER BY lo)"))
          .select(col("probe_id").cast("long").as("probe_id"), col("lo"), col("hi"))
          .localCheckpoint(false)
        def leg(name: String, z: DataFrame): DataFrame = {
          val touched = probes.join(broadcast(z),
              expr("zmax >= lo AND zmin <= hi"), "left")
            .groupBy("probe_id", "lo", "hi")
            .agg(count(col("p")).as("parts_touched"),
              coalesce(sum("c"), lit(0L)).as("rows_scanned"))
          val act = rows.crossJoin(broadcast(probes))
            .where(expr("v BETWEEN lo AND hi"))
            .groupBy("probe_id").agg(count(lit(1)).as("act_rows"))
          // soundness: matching rows OUTSIDE the touched partitions
          val missed = sketchRangeAssign(rows, mx)
            .withColumn("ph", md5Bucket(concat(lit("h:"), col("eid").cast("string")), 32))
            .select(col("v"), if (name.startsWith("1")) col("ph").as("p") else col("p"))
            .join(broadcast(z.select(col("p"), col("zmin"), col("zmax"))), "p")
            .crossJoin(broadcast(probes))
            .where(expr("v BETWEEN lo AND hi AND NOT (zmax >= lo AND zmin <= hi)"))
            .groupBy("probe_id").agg(count(lit(1)).as("mz"))
          touched.join(act, "probe_id")
            .join(missed, Seq("probe_id"), "left")
            .crossJoin(broadcast(mx.select("n")))
            .select(col("probe_id"), lit(name).as("layout"), col("lo"), col("hi"),
              col("act_rows"), col("parts_touched"), col("rows_scanned"),
              expr("rows_scanned * 10000 div greatest(act_rows, 1)").as("amp_bp"),
              coalesce(col("mz"), lit(0L)).as("missed"),
              expr("(n - rows_scanned) * 10000 div n").as("pruned_bp"))
        }
        leg("1:hash", zH).unionByName(leg("2:sketch_range", zR))
          .orderBy("probe_id", "layout")
      },
      Some {
        import R39Queries.md5BucketSql
        def legSql(name: String, zCte: String, pCol: String): String =
          s"""SELECT pr.probe_id, '$name' AS layout, pr.lo, pr.hi,
            (SELECT count(*) FROM rows_s WHERE v BETWEEN pr.lo AND pr.hi) AS act_rows,
            (SELECT count(*) FROM $zCte z WHERE z.zmax >= pr.lo AND z.zmin <= pr.hi) AS parts_touched,
            (SELECT coalesce(sum(z.c), 0) FROM $zCte z WHERE z.zmax >= pr.lo AND z.zmin <= pr.hi) AS rows_scanned,
            (SELECT count(*) FROM asg a JOIN $zCte z ON z.p = a.$pCol WHERE a.v BETWEEN pr.lo AND pr.hi AND NOT (z.zmax >= pr.lo AND z.zmin <= pr.hi)) AS missed
            FROM probes pr"""
        s"""WITH rows_s AS (SELECT event_id AS eid, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events), mx AS (SELECT min(v) AS a, max(v) - min(v) + 1 AS w, count(*) AS n FROM rows_s), bins AS (SELECT least(255, (v - a) * 256 // w) AS b, count(*) AS bc FROM rows_s CROSS JOIN mx GROUP BY 1), bmap AS (SELECT b, least(31, (sum(bc) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)) * 32 // ((SELECT n FROM mx) + 1)) AS p FROM bins), asg AS (SELECT r.eid, r.v, bm.p, ${md5BucketSql("'h:' || CAST(r.eid AS VARCHAR)", 32)} AS ph FROM (SELECT eid, v, least(255, (v - a) * 256 // w) AS b FROM rows_s CROSS JOIN mx) r JOIN bmap bm ON bm.b = r.b), zr AS (SELECT p, count(*) AS c, min(v) AS zmin, max(v) AS zmax FROM asg GROUP BY 1), zh AS (SELECT ph AS p, count(*) AS c, min(v) AS zmin, max(v) AS zmax FROM asg GROUP BY 1), probes AS (SELECT CAST(row_number() OVER (ORDER BY lo) AS BIGINT) AS probe_id, lo, hi FROM (SELECT zmin AS lo, zmax AS hi FROM zr ORDER BY c DESC, p LIMIT 3) t), legs AS (${legSql("1:hash", "zh", "ph")} UNION ALL ${legSql("2:sketch_range", "zr", "p")}) SELECT CAST(probe_id AS BIGINT) AS probe_id, layout, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, CAST(act_rows AS BIGINT) AS act_rows, CAST(parts_touched AS BIGINT) AS parts_touched, CAST(rows_scanned AS BIGINT) AS rows_scanned, CAST(rows_scanned * 10000 // greatest(act_rows, 1) AS BIGINT) AS amp_bp, CAST(missed AS BIGINT) AS missed, CAST(((SELECT n FROM mx) - rows_scanned) * 10000 // (SELECT n FROM mx) AS BIGINT) AS pruned_bp FROM legs ORDER BY probe_id, layout"""
      },
      "S/L ext: zone-map pruning on the chosen layout EXECUTED — per-partition zone maps read back from q400's applied sketch-range and hash assignments, a three-probe battery priced against both: the range layout touches ONE partition per probe (amp 1.0x, ~97% pruned, soundness certified by missed = 0), the hash layout's every zone spans the whole range (all partitions touched, amp ~32x) — q400's range_overlaps column turned into its scan bill"),

    // q402 — RUNTIME BLOOM SEMI-JOIN FILTER, EXECUTED: q351 priced the
    // (m, k) frontier and q95 inlined the probe into scan codegen; this
    // runs the filter as a RUNTIME join reduction and certifies what
    // the pricing promised. The build side is the filtered orders key
    // set hashed k = 4 ways into an m = 65536-bit bitmap (the bit SET
    // is what broadcasts — bounded by m, never by keys); the probe is
    // ONE KEYED pass over lineitem's distinct join keys (row identity
    // is irrelevant — all rows of a key pass or fail together, so the
    // probe costs ndv, not rows). Two scenarios, both APPLIED: the
    // selective mid-band predicate (~3% of keys; fill 0.3-26% across
    // SFs) and its broad complement (~97% of keys; fill saturates to
    // ~100% at sf0.1). Certified per scenario: NO FALSE NEGATIVES
    // (every true key reaches nh = 4 — the theorem, checked from
    // data), the measured false-positive rate inside twice the
    // realized-fill bound fill^4 (integer: fill_bp^4 / 1e12) PLUS a
    // flat 100 bp small-sample slack — at the selective scenario's low
    // fills the integer bound rounds to ~0 bp, so without the absolute
    // term one unlucky fp key among a few thousand probed non-members
    // (ordinary binomial noise) would fail a gate the theory never
    // promised; once fill is large enough for the bound to be
    // measurable the slack is negligible against it — and the
    // DECISION — apply_filter gates on measured row reduction >= 25%,
    // passing the selective scenario at every SF (96-99% of fact rows
    // never shuffle) and refusing the broad one (3% reduction at best,
    // total bitmap saturation at worst: the two distinct reasons a
    // runtime filter should be skipped, both visible in the row).
    // Scale: build is a keyed pass over the dim keys; the bitmap is
    // 65536 bits of broadcast state; the probe is map-side against the
    // broadcast set; only the graders touch exact membership.
    QuerySpec(
      "q402_runtime_bloom",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_orderkey").as("k"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("v"))
        val pred = o.agg(min("v").as("a"), expr("max(v) - min(v) + 1").as("w"))
          .selectExpr("a + w div 2 - w div 64 AS lo", "a + w div 2 + w div 64 AS hi")
          .localCheckpoint(false)
        val kc = t(s, d, "lineitem").groupBy(col("l_orderkey").as("k"))
          .agg(count(lit(1)).as("f")).localCheckpoint(false)
        // r14 NOTE (measured and REJECTED): fusing the two scenarios'
        // md5-cell passes and probe joins into shared oCells/kcCells/
        // cellFlags frames with one combined (nh1, nh2) grading pass
        // regressed QTime 1.9 -> 2.5-2.8 s. The fused probe keeps every
        // fact cell (the scenario bit-sets PARTITION the order keys, so
        // their union covers all cells) where this per-leg shape's inner
        // join against the SELECTIVE leg's bits prunes most rows before
        // the (k, f) aggregation, and the shared eager pins serialize
        // construction the single final action previously overlapped.
        def cellArr(kCol: String): Column = array((1 to 4).map(i =>
          expr(s"CAST(conv(substring(md5(concat('bf$i:', CAST($kCol AS STRING))), 1, 10), 16, 10) AS BIGINT) % 65536")): _*)
        def leg(name: String, cond: String): DataFrame = {
          val fo = o.crossJoin(broadcast(pred)).where(expr(cond))
            .select("k").localCheckpoint(false)
          val bits = fo.select(explode(cellArr("k")).as("cell")).distinct()
            .localCheckpoint(false)
          val probe = kc.select(col("k"), col("f"), explode(cellArr("k")).as("cell"))
            .join(broadcast(bits), "cell")
            .groupBy("k", "f").agg(count(lit(1)).as("nh"))
          // ONE keyed chain grades everything: membership truth, pass
          // verdict, and the no-false-negative theorem (a true key that
          // missed any of its own four cells would sit below nh = 4)
          // fold into a single aggregate over kc joined to probe + fo
          val flags = kc
            .join(probe.select("k", "nh"), Seq("k"), "left")
            .join(fo.withColumn("t", lit(1L)), Seq("k"), "left")
            .agg(count(lit(1)).as("probe_keys"), sum("f").as("fact_rows"),
              coalesce(sum("t"), lit(0L)).as("true_keys"),
              coalesce(sum(expr("f * t")), lit(0L)).as("true_rows"),
              sum(expr("CASE WHEN nh = 4 THEN 1 ELSE 0 END")).as("pass_keys"),
              sum(expr("CASE WHEN nh = 4 THEN f ELSE 0 END")).as("rows_pass"),
              sum(expr("CASE WHEN t = 1 AND (nh IS NULL OR nh < 4) THEN 1 ELSE 0 END"))
                .as("false_negs"))
          val nK = fo.agg(count(lit(1)).as("n_keys"))
          val nB = bits.agg(count(lit(1)).as("bits_set"))
          nK.crossJoin(broadcast(nB)).crossJoin(broadcast(flags))
            .select(lit(name).as("scenario"), col("n_keys"), col("bits_set"),
              expr("bits_set * 10000 div 65536").as("fill_bp"),
              col("fact_rows"), col("true_rows"), col("rows_pass"),
              expr("pass_keys - (true_keys - false_negs)").as("fp_keys"),
              expr("(pass_keys - (true_keys - false_negs)) * 10000 div greatest(probe_keys - true_keys, 1)")
                .as("fpp_bp"),
              expr("(bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) div 1000000000000")
                .as("fpp_bound_bp"),
              expr("CAST(CASE WHEN false_negs = 0 THEN 1 ELSE 0 END AS BIGINT)")
                .as("no_false_neg"),
              expr("CAST(CASE WHEN (pass_keys - (true_keys - false_negs)) * 10000 div greatest(probe_keys - true_keys, 1) <= 2 * ((bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) * (bits_set * 10000 div 65536) div 1000000000000) + 100 THEN 1 ELSE 0 END AS BIGINT)")
                .as("fp_ok"),
              expr("(fact_rows - rows_pass) * 10000 div fact_rows").as("reduction_bp"),
              expr("CAST(CASE WHEN (fact_rows - rows_pass) * 10000 div fact_rows >= 2500 THEN 1 ELSE 0 END AS BIGINT)")
                .as("apply_filter"),
              lit(65536L).as("state_bits"))
        }
        leg("1:selective_midband", "v BETWEEN lo AND hi")
          .unionByName(leg("2:broad_complement", "v NOT BETWEEN lo AND hi"))
          .orderBy("scenario")
      },
      Some {
        def cellSql(i: Int, k: String): String =
          s"CAST(concat('0x', substr(md5('bf$i:' || CAST($k AS VARCHAR)), 1, 10)) AS BIGINT) % 65536"
        def legSql(name: String, tag: String, cond: String): String = {
          val cells = (1 to 4).map(i => s"SELECT ${cellSql(i, "k")} AS cell FROM fo_$tag")
            .mkString(" UNION ALL ")
          val probes = (1 to 4).map(i => s"SELECT k, f, ${cellSql(i, "k")} AS cell FROM kc")
            .mkString(" UNION ALL ")
          s"""SELECT '$name' AS scenario, n_keys, bits_set, fill_bp, fact_rows, true_rows, rows_pass,
            pass_keys - (true_keys - false_negs) AS fp_keys,
            (pass_keys - (true_keys - false_negs)) * 10000 // greatest(probe_keys - true_keys, 1) AS fpp_bp,
            fill_bp * fill_bp * fill_bp * fill_bp // 1000000000000 AS fpp_bound_bp,
            CASE WHEN false_negs = 0 THEN 1 ELSE 0 END AS no_false_neg,
            CASE WHEN (pass_keys - (true_keys - false_negs)) * 10000 // greatest(probe_keys - true_keys, 1) <= 2 * (fill_bp * fill_bp * fill_bp * fill_bp // 1000000000000) + 100 THEN 1 ELSE 0 END AS fp_ok,
            (fact_rows - rows_pass) * 10000 // fact_rows AS reduction_bp,
            CASE WHEN (fact_rows - rows_pass) * 10000 // fact_rows >= 2500 THEN 1 ELSE 0 END AS apply_filter
            FROM (
              WITH fo_$tag AS (SELECT k FROM o CROSS JOIN pred WHERE $cond),
              bits AS (SELECT DISTINCT cell FROM ($cells) u),
              probe AS (SELECT k, f, count(*) AS nh FROM ($probes) pu JOIN bits USING (cell) GROUP BY 1, 2),
              passk AS (SELECT k, f FROM probe WHERE nh = 4),
              truek AS (SELECT kc.k, kc.f FROM kc JOIN fo_$tag fx ON fx.k = kc.k)
              SELECT (SELECT count(*) FROM fo_$tag) AS n_keys,
                (SELECT count(*) FROM bits) AS bits_set,
                (SELECT count(*) FROM bits) * 10000 // 65536 AS fill_bp,
                (SELECT sum(f) FROM kc) AS fact_rows,
                (SELECT count(*) FROM kc) AS probe_keys,
                (SELECT coalesce(sum(f), 0) FROM truek) AS true_rows,
                (SELECT count(*) FROM truek) AS true_keys,
                (SELECT count(*) FROM passk) AS pass_keys,
                (SELECT coalesce(sum(f), 0) FROM passk) AS rows_pass,
                (SELECT count(*) FROM truek t WHERE t.k NOT IN (SELECT k FROM passk)) AS false_negs
            ) agg"""
        }
        s"""WITH o AS (SELECT o_orderkey AS k, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v FROM orders), pred AS (SELECT a + w // 2 - w // 64 AS lo, a + w // 2 + w // 64 AS hi FROM (SELECT min(v) AS a, max(v) - min(v) + 1 AS w FROM o) m), kc AS (SELECT l_orderkey AS k, count(*) AS f FROM lineitem GROUP BY 1), legs AS (${legSql("1:selective_midband", "sel", "v BETWEEN lo AND hi")} UNION ALL ${legSql("2:broad_complement", "broad", "v NOT BETWEEN lo AND hi")}) SELECT scenario, CAST(n_keys AS BIGINT) AS n_keys, CAST(bits_set AS BIGINT) AS bits_set, CAST(fill_bp AS BIGINT) AS fill_bp, CAST(fact_rows AS BIGINT) AS fact_rows, CAST(true_rows AS BIGINT) AS true_rows, CAST(rows_pass AS BIGINT) AS rows_pass, CAST(fp_keys AS BIGINT) AS fp_keys, CAST(fpp_bp AS BIGINT) AS fpp_bp, CAST(fpp_bound_bp AS BIGINT) AS fpp_bound_bp, CAST(no_false_neg AS BIGINT) AS no_false_neg, CAST(fp_ok AS BIGINT) AS fp_ok, CAST(reduction_bp AS BIGINT) AS reduction_bp, CAST(apply_filter AS BIGINT) AS apply_filter, CAST(65536 AS BIGINT) AS state_bits FROM legs ORDER BY scenario"""
      },
      "S/J ext: runtime bloom semi-join filter EXECUTED — the filtered dim keys hashed 4 ways into a 65536-bit broadcast bitmap, the fact side probed in ONE keyed pass over distinct join keys; no-false-negative certified from data, measured FPP inside twice the realized-fill bound fill^4 plus a flat 100 bp small-sample slack (the bound rounds to 0 at low fills, where one noise fp key would otherwise fail an unpromised gate), and the apply decision gates on measured row reduction (selective mid-band passes at 96-99% reduction, the broad complement is refused for both reasons a runtime filter gets skipped: selectivity and bitmap saturation)"))
}
