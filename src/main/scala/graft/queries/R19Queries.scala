package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-6 widening, sixth batch: data-quality audit and customer-
  * analytics operators — a calendar-gap completeness audit (the "did
  * ingestion skip a day?" page), fixed-band RFM segmentation (the
  * marketing-analytics staple expressed as pure map-side scoring),
  * a Benford first-digit conformance audit (fraud/quality screening),
  * and HITS hubs-and-authorities on the customer–part bipartite graph
  * (the non-PageRank member of the power-iteration family, unrolled
  * with an integer micro-grid renormalization per step so both
  * engines agree bit-for-bit).
  *
  * Scale notes per query; the family-wide rule: every per-row score
  * is a constant-threshold CASE (map-side, codegen'd), every
  * iteration's normalizer is a broadcast scalar, and nothing global
  * ever exceeds |nations|, 9 digits, or |parts| rows.
  */
object R19Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** floor-to-cents quantizer (R11Queries convention). */
  private def cents(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")

  /** q284's operator core, shared with ScaleSlopeSpec so the measured
    * scale exponent is measured on EXACTLY the registered plan: 2.5
    * unrolled HITS power iterations (a¹ h¹ a² h² a³) over a distinct
    * bipartite edge table (c, p), integer micro-grid renormalized per
    * level. Iteration layout: the edge set is materialized TWICE, each
    * copy pre-partitioned by the key its joins use (p-side for
    * score-of-parts lookups, c-side for score-of-customers) and lazily
    * localCheckpoint'ed — after that one-time dual layout the EDGES
    * NEVER MOVE AGAIN: every iteration's join reuses the checkpoint's
    * hash partitioning on both sides (the groupBy outputs are
    * hash-partitioned on the same key and width), so each round
    * shuffles only the score table (≤ |parts| or |customers| rows —
    * dimension-sized, never fact-sized). That is also the 100 TB
    * answer: at 1e10 edges the per-iteration cost is a map-side stream
    * of the pinned layout + one small-table exchange, the same shape
    * as q137's PageRank. Each raw per-level aggregate is pinned before
    * its dual use inside normalize (max + scaling join), so no level
    * is ever derived twice. Measured (QTime, 32 threads, sf0.1, warm):
    * 7.1–7.4 s naive → 3.6 s; the remainder is the one-time fact join
    * + distinct building the edge set (q288 pays the same ~2 s for the
    * identical build), not the iterations. Returns (p, score) for the
    * final authority level a³.
    */
  private[graft] def hitsAuthority(edgeTable: DataFrame): DataFrame = {
    // eager: the two layout legs below consume `edges` concurrently — a
    // lazy final stage would be recomputed and raced by both
    val edges = edgeTable.localCheckpoint(true)
    // the two pinned layouts share no lineage below `edges` — overlap
    // their checkpoint materializations (graft.Par, guide §2.6). A
    // per-layout repartition+distinct (skipping this shared pin) was
    // measured AND REJECTED: the doubled distinct costs what the saved
    // shuffle buys back.
    val (edgesByP, edgesByC) = graft.Par.par2(
      edges.repartition(col("p")).localCheckpoint(false),
      edges.repartition(col("c")).localCheckpoint(false))
    // the raw aggregate is referenced TWICE inside a normalize (the
    // max and the scaling join) — checkpoint the INPUT, not the
    // output (each level has exactly one downstream consumer, so an
    // output pin would only add materialization cost)
    def normalize(df: DataFrame, key: String, raw: String): DataFrame = {
      val pinned = df.localCheckpoint(false)
      val mx = pinned.agg(max(raw).as("mx"))
      pinned.crossJoin(broadcast(mx))
        .select(col(key), expr(s"$raw * 1000000 div mx").as("score"))
    }
    // a¹(p) = Σ_c 1e6  (h⁰ ≡ 1e6), normalized
    val a1 = normalize(
      edgesByP.groupBy("p").agg((count(lit(1)) * 1000000L).as("raw")), "p", "raw")
    // h¹(c) = Σ_p a¹(p), normalized
    val h1 = normalize(
      edgesByP.join(a1, Seq("p")).groupBy("c").agg(sum("score").as("raw")),
      "c", "raw")
    // a²(p) = Σ_c h¹(c), normalized
    val a2 = normalize(
      edgesByC.join(h1, Seq("c")).groupBy("p").agg(sum("score").as("raw")),
      "p", "raw")
    // h²(c) = Σ_p a²(p), normalized
    val h2 = normalize(
      edgesByP.join(a2, Seq("p")).groupBy("c").agg(sum("score").as("raw")),
      "c", "raw")
    // a³(p) = Σ_c h²(c), normalized — reported
    normalize(
      edgesByC.join(h2, Seq("c")).groupBy("p").agg(sum("score").as("raw")),
      "p", "raw")
  }

  val specs: Seq[QuerySpec] = Seq(

    // q281 — CALENDAR-GAP AUDIT per nation: which nations have days
    // with no orders, and how long is the longest dark stretch? The
    // observed-day set per nation is a distinct over (nation, day) —
    // pre-shrunk map-side before its one shuffle; the global calendar
    // span is a broadcast 1-row aggregate; the max-gap scan is a lag
    // window over each nation's OBSERVED days (≤ span rows, keyed by
    // nation). Interior gaps only — the leading/trailing edge is
    // reported through the first/last observed day columns instead,
    // so a nation that starts trading late isn't conflated with one
    // that went dark mid-history.
    QuerySpec(
      "q281_calendar_gaps",
      (s, d) => {
        val days = t(s, d, "orders")
          .join(t(s, d, "customer").select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("day"))
          .distinct()
        val span = days.agg(min("day").as("d0"), max("day").as("d1"))
        val w = Window.partitionBy("n_name").orderBy("day")
        days.withColumn("gap", col("day") - lag("day", 1).over(w) - 1L)
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_days_observed"),
            min("day").as("first_day"), max("day").as("last_day"),
            max(coalesce(col("gap"), lit(0L))).as("max_gap_days"))
          .crossJoin(broadcast(span))
          .withColumn("coverage_bp",
            expr("n_days_observed * 10000 div (d1 - d0 + 1)"))
          .select("n_name", "n_days_observed", "first_day", "last_day",
            "max_gap_days", "coverage_bp")
          .orderBy("n_name")
      },
      Some("""WITH days AS (SELECT DISTINCT n_name, CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM days), g AS (SELECT n_name, day, day - lag(day) OVER (PARTITION BY n_name ORDER BY day) - 1 AS gap FROM days) SELECT n_name, CAST(count(*) AS BIGINT) AS n_days_observed, CAST(min(day) AS BIGINT) AS first_day, CAST(max(day) AS BIGINT) AS last_day, CAST(max(coalesce(gap, 0)) AS BIGINT) AS max_gap_days, CAST(count(*) * 10000 // (d1 - d0 + 1) AS BIGINT) AS coverage_bp FROM g, span GROUP BY n_name, d0, d1 ORDER BY n_name"""),
      "§2.12/A ext: per-nation calendar completeness — distinct-day shrink, interior max-gap, coverage bp"),

    // q282 — RFM SEGMENTATION with fixed business bands: recency (days
    // since last order vs the corpus's final day), frequency (order
    // count), monetary (lifetime cents) each scored 1–5 by constant
    // thresholds (bands documented in-line; chosen to spread the
    // sf0.01 distribution, quantile-free ON PURPOSE — banding must not
    // drift as the corpus grows, and the scoring stays a stateless
    // map over the per-customer aggregate). One groupBy(custkey) is
    // the only fact shuffle; the named segments are the standard RFM
    // marketing taxonomy as a priority CASE.
    QuerySpec(
      "q282_rfm_segments",
      (s, d) => {
        val per = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long")).as("last_day"),
            count(lit(1)).as("f"), sum(cents(col("o_totalprice"))).as("m"))
        val ref = per.agg(max("last_day").as("ref_day"))
        val scored = per.crossJoin(broadcast(ref))
          .withColumn("days_since", col("ref_day") - col("last_day"))
          .withColumn("r_score",
            when(col("days_since") <= 180L, 5L).when(col("days_since") <= 365L, 4L)
              .when(col("days_since") <= 730L, 3L)
              .when(col("days_since") <= 1095L, 2L).otherwise(1L))
          .withColumn("f_score",
            when(col("f") >= 13L, 5L).when(col("f") >= 10L, 4L)
              .when(col("f") >= 7L, 3L).when(col("f") >= 4L, 2L).otherwise(1L))
          .withColumn("m_score",
            when(col("m") >= 300000000L, 5L).when(col("m") >= 240000000L, 4L)
              .when(col("m") >= 180000000L, 3L)
              .when(col("m") >= 120000000L, 2L).otherwise(1L))
          .withColumn("segment",
            when(col("r_score") >= 4L && col("f_score") >= 4L &&
              col("m_score") >= 4L, "champions")
              .when(col("r_score") >= 4L && col("f_score") >= 3L, "loyal")
              .when(col("r_score") >= 4L, "recent")
              .when(col("r_score") <= 2L && col("f_score") >= 4L, "at_risk")
              .when(col("r_score") <= 2L && col("f_score") <= 2L, "hibernating")
              .otherwise("regular"))
        scored.groupBy("segment")
          .agg(count(lit(1)).as("n_customers"), sum("m").as("total_cents"),
            expr("sum(r_score * 100 + f_score * 10 + m_score) div count(1)")
              .as("avg_rfm_code"))
          .orderBy("segment")
      },
      Some("""WITH per AS (SELECT o_custkey, max(CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)) AS last_day, CAST(count(*) AS BIGINT) AS f, CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS m FROM orders GROUP BY 1), ref AS (SELECT max(last_day) AS ref_day FROM per), sc AS (SELECT f, m, CASE WHEN ref_day - last_day <= 180 THEN 5 WHEN ref_day - last_day <= 365 THEN 4 WHEN ref_day - last_day <= 730 THEN 3 WHEN ref_day - last_day <= 1095 THEN 2 ELSE 1 END AS r_score, CASE WHEN f >= 13 THEN 5 WHEN f >= 10 THEN 4 WHEN f >= 7 THEN 3 WHEN f >= 4 THEN 2 ELSE 1 END AS f_score, CASE WHEN m >= 300000000 THEN 5 WHEN m >= 240000000 THEN 4 WHEN m >= 180000000 THEN 3 WHEN m >= 120000000 THEN 2 ELSE 1 END AS m_score FROM per, ref), seg AS (SELECT *, CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions' WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal' WHEN r_score >= 4 THEN 'recent' WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk' WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating' ELSE 'regular' END AS segment FROM sc) SELECT segment, CAST(count(*) AS BIGINT) AS n_customers, CAST(sum(m) AS BIGINT) AS total_cents, CAST(sum(r_score * 100 + f_score * 10 + m_score) // count(*) AS BIGINT) AS avg_rfm_code FROM seg GROUP BY 1 ORDER BY 1"""),
      "A/§2.4 ext: fixed-band RFM segmentation — stateless constant-threshold scoring, one fact shuffle"),

    // q283 — BENFORD FIRST-DIGIT AUDIT of order totals: does the
    // leading digit of o_totalprice follow log10(1 + 1/d)? The
    // screening test fraud teams run on financial columns — a
    // conforming corpus deviates little; fabricated or clipped data
    // jumps out. Expected shares are the Benford CDF pre-quantized to
    // micro units (constants below, same literals in both engines);
    // observed shares are integer basis-point-of-a-million via the
    // broadcast total. One map-side digit extraction + a 9-group
    // aggregation: nothing here exceeds 9 rows after the scan.
    QuerySpec(
      "q283_benford_audit",
      (s, d) => {
        val dig = t(s, d, "orders")
          .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
            .cast("long").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n_obs"))
        val tot = dig.agg(sum("n_obs").as("n_total"))
        dig.crossJoin(broadcast(tot))
          .withColumn("obs_micro", expr("n_obs * 1000000 div n_total"))
          .withColumn("benford_micro",
            when(col("digit") === 1L, 301030L).when(col("digit") === 2L, 176091L)
              .when(col("digit") === 3L, 124939L).when(col("digit") === 4L, 96910L)
              .when(col("digit") === 5L, 79181L).when(col("digit") === 6L, 66947L)
              .when(col("digit") === 7L, 57992L).when(col("digit") === 8L, 51153L)
              .otherwise(45757L))
          .withColumn("dev_micro", col("obs_micro") - col("benford_micro"))
          .select("digit", "n_obs", "obs_micro", "benford_micro", "dev_micro")
          .orderBy("digit")
      },
      Some("""WITH dig AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit, CAST(count(*) AS BIGINT) AS n_obs FROM orders GROUP BY 1), tot AS (SELECT sum(n_obs) AS n_total FROM dig) SELECT digit, n_obs, CAST(n_obs * 1000000 // n_total AS BIGINT) AS obs_micro, CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS BIGINT) AS benford_micro, CAST(n_obs * 1000000 // n_total - CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153 ELSE 45757 END AS BIGINT) AS dev_micro FROM dig, tot ORDER BY digit"""),
      "A/E4 ext: Benford first-digit conformance — micro-grid expected shares, 9-row audit table"),

    // q284 — HITS HUBS & AUTHORITIES on the customer–part purchase
    // graph (customers are hubs, parts authorities): 2.5 unrolled
    // power iterations (a¹ h¹ a² h² a³) over the distinct edge set,
    // each step one keyed join + aggregation with an integer
    // micro-grid max-renormalization (scores live on [0, 1e6]; the
    // max is a broadcast scalar, so both engines round identically.
    // Overflow bound: raw ≤ degree·1e6, and the normalize multiplies
    // by 1e6 again, so BIGINT holds while max node degree < ~9.2e6 —
    // comfortably true at every tested SF; past that, pre-divide raw
    // by 1e3 before scaling to reclaim headroom). The edge DISTINCT
    // pre-shrinks the fact table once; every iteration then costs
    // |edges| keyed rows — the same per-step bound as the q137
    // PageRank, but on a bipartite graph with per-side normalization.
    // Top-10 part authorities, total-ordered.
    QuerySpec(
      "q284_hits_authority",
      (s, d) => {
        val edges = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct()
        hitsAuthority(edges)
          .select(col("p").as("p_partkey"), col("score").as("auth_micro"))
          .orderBy(col("auth_micro").desc, col("p_partkey"))
          .limit(10)
      },
      Some("""WITH edges AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p FROM lineitem JOIN orders ON l_orderkey = o_orderkey), a1r AS (SELECT p, count(*) * 1000000 AS raw FROM edges GROUP BY 1), a1 AS (SELECT p, raw * 1000000 // (SELECT max(raw) FROM a1r) AS score FROM a1r), h1r AS (SELECT c, sum(score) AS raw FROM edges JOIN a1 USING (p) GROUP BY 1), h1 AS (SELECT c, raw * 1000000 // (SELECT max(raw) FROM h1r) AS score FROM h1r), a2r AS (SELECT p, sum(score) AS raw FROM edges JOIN h1 USING (c) GROUP BY 1), a2 AS (SELECT p, raw * 1000000 // (SELECT max(raw) FROM a2r) AS score FROM a2r), h2r AS (SELECT c, sum(score) AS raw FROM edges JOIN a2 USING (p) GROUP BY 1), h2 AS (SELECT c, raw * 1000000 // (SELECT max(raw) FROM h2r) AS score FROM h2r), a3r AS (SELECT p, sum(score) AS raw FROM edges JOIN h2 USING (c) GROUP BY 1), a3 AS (SELECT p, raw * 1000000 // (SELECT max(raw) FROM a3r) AS score FROM a3r) SELECT p AS p_partkey, CAST(score AS BIGINT) AS auth_micro FROM a3 ORDER BY auth_micro DESC, p_partkey LIMIT 10"""),
      "§2.13/graph ext: HITS authorities via unrolled integer power iteration — micro-grid renormalized steps"))
}
