package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-4 continuation — the curation/analytics operators a pipeline
  * team reaches for after the retrieval/dedup quality gates of R5Queries:
  * semantic (embedding-space) dedup inside the shared IVF cells (q171),
  * the two classic user-activity analyses (streaks q172, cohort retention
  * q173), and data-layout / embedding-infra ops (Z-order clustering,
  * random-projection dim reduction, content-defined chunking) in the
  * batches that follow. All fully DuckDB-oracled.
  */
object R6Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private val emL2 = ScaleQueries.emL2
  private val dot =
    "round(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1, len(a.embedding))]) / (a.nrm * b.nrm), 6)"

  val specs: Seq[QuerySpec] = Seq(

    // q171 — SEMANTIC dedup (SemDeDup-style): inside each IVF cell of the
    // shared index, a vector is dropped when some LOWER-id vector in the
    // same cell has cosine >= 0.4 (one-pass first-occurrence variant: the
    // killer need not itself survive — the deterministic single-join
    // approximation of the greedy kept-set rule, which would need a
    // sequential scan). This is the embedding-space twin of MinHash
    // near-dup (q34): cluster first so the pairwise check is cell-local,
    // never corpus×corpus. Output: each dropped vector with its earliest
    // same-cell killer and the max within-cell cosine that doomed it.
    // Scale shape: the cell equi-join is the indexed candidate generator
    // (|cell|² pairs per cell, cells bounded by the quantizer); one
    // groupBy on the dropped id. τ=0.4 sits above the within-cell
    // cosine p99 (~0.32 at sf0.01) so drops are real near-dups, not mass
    // deletion: 19 drops at sf0.01, 235 at sf0.1.
    QuerySpec(
      "q171_semantic_dedup",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        val al = ScaleQueries.ivfFlat(s, d)
        val a = al.select(col("vec_id").as("aid"), col("embedding").as("ae"), col("cell"))
        val b = al.select(col("vec_id").as("bid"), col("embedding").as("be"), col("cell"))
        a.join(b, Seq("cell"))
          .where(col("aid") < col("bid"))
          .select(col("bid"), col("cell"), col("aid"),
            round(expr("cosine_sim(ae, be)"), 6).as("cos_r"))
          .where(col("cos_r") >= 0.4)
          .groupBy(col("bid").as("vec_id"))
          .agg(first(col("cell")).as("cell"),
            min(col("aid")).as("dup_of"),
            max(col("cos_r")).as("max_cos"))
          .select(col("vec_id"), col("cell").cast("long").as("cell"),
            col("dup_of"), col("max_cos"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, $emL2 AS nrm FROM embeddings), asg AS (SELECT a.vec_id, a.embedding, a.nrm, b.vec_id AS cell, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot DESC, b.vec_id) AS rn FROM e a CROSS JOIN (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 8) b), cells AS (SELECT vec_id, embedding, nrm, cell FROM asg WHERE rn = 1) SELECT b.vec_id AS vec_id, CAST(b.cell AS BIGINT) AS cell, min(a.vec_id) AS dup_of, max($dot) AS max_cos FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id WHERE $dot >= 0.4 GROUP BY 1, 2 ORDER BY vec_id"""),
      "E3/E2 ext: semantic dedup — cell-local cosine near-dups dropped by first occurrence"),

    // q172 — activity STREAKS (gaps-and-islands): per user, maximal runs
    // of consecutive active days via the classic day-minus-row_number
    // island key — the sessionization-by-calendar analysis (DAU streaks,
    // "7-day habit" metrics). The window partitions by user_id (bounded
    // per-user day counts), islands then aggregate map-side; the
    // longest-streak start comes from a join-back on the tiny per-user
    // streak table, not an argmax window.
    QuerySpec(
      "q172_streaks",
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val isl = days.withColumn("g",
          datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
        val st = isl.groupBy("user_id", "g")
          .agg(count(lit(1)).as("len"), min("day").as("start"))
        val mx = st.groupBy("user_id")
          .agg(sum("len").as("n_active_days"), count(lit(1)).as("n_streaks"),
            max("len").as("max_streak"))
        mx.join(st, Seq("user_id"))
          .where(col("len") === col("max_streak"))
          .groupBy("user_id", "n_active_days", "n_streaks", "max_streak")
          .agg(date_format(min("start"), "yyyy-MM-dd").as("max_streak_start"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), isl AS (SELECT user_id, day, CAST(day - DATE '1970-01-01' AS INT) - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g FROM days), st AS (SELECT user_id, g, count(*) AS len, min(day) AS start FROM isl GROUP BY 1, 2), mx AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak FROM st GROUP BY 1) SELECT m.user_id, m.n_active_days, m.n_streaks, m.max_streak, strftime(min(s.start), '%Y-%m-%d') AS max_streak_start FROM mx m JOIN st s ON s.user_id = m.user_id AND s.len = m.max_streak GROUP BY 1, 2, 3, 4 ORDER BY 1"""),
      "§2.5/§2.12 ext: gaps-and-islands — per-user consecutive-day streaks"),

    // q173 — COHORT RETENTION: users grouped by first-activity week, each
    // later active week bucketed by whole weeks since the cohort week —
    // the triangular retention matrix every growth dashboard draws. Week
    // offsets are exact multiples of 7 days (both sides date_trunc to
    // Monday) so the division is exact, no interpolation hazard. Scale
    // shape: distinct user-weeks (one shuffle), the per-user min is a
    // partial agg, the join-back re-uses the user key partitioning.
    QuerySpec(
      "q173_cohort_retention",
      (s, d) => {
        val uw = t(s, d, "events")
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val coh = uw.groupBy("user_id").agg(min("wk").as("cw"))
        uw.join(coh, Seq("user_id"))
          .withColumn("week_offset",
            (datediff(col("wk"), col("cw")) / 7).cast("long"))
          .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk FROM events), coh AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1) SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, CAST((wk - cw) // 7 AS BIGINT) AS week_offset, count(DISTINCT uw.user_id) AS n_users FROM uw JOIN coh ON uw.user_id = coh.user_id GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
      "§2.4/§2.12 ext: cohort retention matrix by first-activity week"))
}
