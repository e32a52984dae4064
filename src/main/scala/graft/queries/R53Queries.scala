package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-11 first widening — the execution halves the round-10 choosers
  * stopped short of (VERDICT r10 asks #2/#3), per the house convention
  * measure → price → choose → APPLY:
  *
  *  - q387 EXECUTES q377's compact_now schedule: the apply pass
  *    physically drops the compacted files' delete-vector victims and a
  *    second pricing pass on the rebuilt state certifies the reclaimed
  *    per-cycle tax equals the schedule's priced relief, within budget;
  *  - q388 EXECUTES q380's refresh trigger: when the drifted delta fires
  *    refresh_boundaries, the boundaries are re-frozen over the true new
  *    range, the histogram rebuilt, and the repair certified by
  *    per-predicate q-error returning to the q343/q374 band that the
  *    stale-boundary merge had blown up.
  */
object R53Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val specs: Seq[QuerySpec] = Seq(

    // q387 — COMPACTION EXECUTED, RELIEF CERTIFIED: q377 flags
    // compact_now; a maintenance service then actually REWRITES those
    // files, and the claim that justified the budget spend — the
    // schedule's priced per-cycle tax relief — deserves its measurement.
    // The apply pass re-scans the simulated file layout and physically
    // drops the compacted files' delete-vector victims (the rewrite
    // folds the DV in); the post state is then re-priced by the SAME
    // formula from the REBUILT per-file rows — dv_post is re-derived
    // from data, not zeroed by fiat, so a broken apply (victims
    // surviving, wrong files rewritten) surfaces as a relief_ok = 0 row
    // rather than passing algebraically. Per file: pre tax, post tax,
    // reclaimed = pre − post, the rewrite actually paid, and relief_ok
    // certifying reclaimed == compact_now · tax_pre (a compacted file
    // reclaims its whole recurring tax; an untouched file reclaims
    // nothing — both directions checked). The f = -1 __total row is the
    // service's invoice: total reclaimed equals the schedule's priced
    // relief AND the rewritten pre-rows fit the quarter-table budget
    // (relief_ok on that row carries both). Scale: the apply is one
    // keyed pass over the file layout joined to the broadcast 32-row
    // schedule; everything else is 32-row arithmetic.
    QuerySpec(
      "q387_compaction_apply",
      (s, d) => {
        val sched = R50Queries.compactionSchedule(s, d).localCheckpoint(false)
        // the APPLY: rewrite compacted files without their DV victims,
        // then re-derive per-file rows and residual DV mass from data
        val post = R50Queries.orderFiles(s, d)
          .join(broadcast(sched.select("f", "compact_now")), Seq("f"))
          .where(expr("NOT (compact_now = 1 AND h < 42949672)"))
          .groupBy("f").agg(count(lit(1)).as("rows_post"),
            sum(when(col("h") < 42949672L, 1L).otherwise(0L)).as("dv_post"))
        val perFile = sched.join(post, Seq("f"), "left")
          .select(col("f"), col("rows_f"), col("dv_rows"), col("reads_f"),
            col("compact_now"), col("tax_du").as("tax_pre_du"),
            coalesce(col("rows_post"), lit(0L)).as("rows_post"),
            coalesce(col("dv_post"), lit(0L)).as("dv_post"),
            col("rewrite_du"), col("budget_rows"))
          .withColumn("tax_post_du",
            expr("CASE WHEN dv_post > 0 THEN reads_f * rows_post ELSE 0 END"))
          .withColumn("reclaimed_du", expr("tax_pre_du - tax_post_du"))
          .withColumn("rewrite_paid_du",
            expr("CASE WHEN compact_now = 1 THEN rewrite_du ELSE 0 END"))
          .withColumn("relief_ok",
            expr("CAST(CASE WHEN reclaimed_du = compact_now * tax_pre_du THEN 1 ELSE 0 END AS BIGINT)"))
        val fileRows = perFile.select(col("f"), col("rows_f"), col("dv_rows"),
          col("compact_now"), col("tax_pre_du"), col("rows_post"), col("dv_post"),
          col("tax_post_du"), col("reclaimed_du"), col("rewrite_paid_du"),
          col("relief_ok"))
        // the __total invoice row: reclaimed == priced relief AND the
        // rewritten pre-rows fit the budget
        val total = perFile.agg(
            sum("rows_f").as("rows_f"), sum("dv_rows").as("dv_rows"),
            sum("compact_now").as("compact_now"),
            sum("tax_pre_du").as("tax_pre_du"), sum("rows_post").as("rows_post"),
            sum("dv_post").as("dv_post"), sum("tax_post_du").as("tax_post_du"),
            sum("reclaimed_du").as("reclaimed_du"),
            sum("rewrite_paid_du").as("rewrite_paid_du"),
            sum(expr("compact_now * tax_pre_du")).as("priced_relief"),
            sum(expr("compact_now * rows_f")).as("rewritten_rows"),
            max("budget_rows").as("budget_rows"))
          .select(lit(-1L).as("f"), col("rows_f"), col("dv_rows"),
            col("compact_now"), col("tax_pre_du"), col("rows_post"),
            col("dv_post"), col("tax_post_du"), col("reclaimed_du"),
            col("rewrite_paid_du"),
            expr("CAST(CASE WHEN reclaimed_du = priced_relief AND rewritten_rows <= budget_rows THEN 1 ELSE 0 END AS BIGINT)")
              .as("relief_ok"))
        fileRows.unionByName(total).orderBy("f")
      },
      Some(
        s"""WITH ${R50Queries.compactionSchedCte}, post AS (SELECT fl.f, count(*) AS rows_post, sum(CASE WHEN fl.h < 42949672 THEN 1 ELSE 0 END) AS dv_post FROM files fl JOIN sched sc ON sc.f = fl.f WHERE NOT (sc.compact_now = 1 AND fl.h < 42949672) GROUP BY 1), pfr AS (SELECT sc.f, sc.rows_f, sc.dv_rows, sc.reads_f, sc.compact_now, sc.tax_du AS tax_pre_du, coalesce(p.rows_post, 0) AS rows_post, coalesce(p.dv_post, 0) AS dv_post, CASE WHEN coalesce(p.dv_post, 0) > 0 THEN sc.reads_f * coalesce(p.rows_post, 0) ELSE 0 END AS tax_post_du, sc.rewrite_du, sc.budget FROM sched sc LEFT JOIN post p ON p.f = sc.f), pr2 AS (SELECT *, tax_pre_du - tax_post_du AS reclaimed_du, CASE WHEN compact_now = 1 THEN rewrite_du ELSE 0 END AS rewrite_paid_du FROM pfr), fr AS (SELECT f, rows_f, dv_rows, compact_now, tax_pre_du, rows_post, dv_post, tax_post_du, reclaimed_du, rewrite_paid_du, CASE WHEN reclaimed_du = compact_now * tax_pre_du THEN 1 ELSE 0 END AS relief_ok FROM pr2), tot AS (SELECT -1 AS f, sum(rows_f) AS rows_f, sum(dv_rows) AS dv_rows, sum(compact_now) AS compact_now, sum(tax_pre_du) AS tax_pre_du, sum(rows_post) AS rows_post, sum(dv_post) AS dv_post, sum(tax_post_du) AS tax_post_du, sum(reclaimed_du) AS reclaimed_du, sum(rewrite_paid_du) AS rewrite_paid_du, CASE WHEN sum(reclaimed_du) = sum(compact_now * tax_pre_du) AND sum(compact_now * rows_f) <= max(budget) THEN 1 ELSE 0 END AS relief_ok FROM pr2), u AS (SELECT * FROM fr UNION ALL SELECT * FROM tot) SELECT CAST(f AS BIGINT) AS f, CAST(rows_f AS BIGINT) AS rows_f, CAST(dv_rows AS BIGINT) AS dv_rows, CAST(compact_now AS BIGINT) AS compact_now, CAST(tax_pre_du AS BIGINT) AS tax_pre_du, CAST(rows_post AS BIGINT) AS rows_post, CAST(dv_post AS BIGINT) AS dv_post, CAST(tax_post_du AS BIGINT) AS tax_post_du, CAST(reclaimed_du AS BIGINT) AS reclaimed_du, CAST(rewrite_paid_du AS BIGINT) AS rewrite_paid_du, CAST(relief_ok AS BIGINT) AS relief_ok FROM u ORDER BY f"""),
      "S/E1 ext: compaction EXECUTED — q377's compact_now set applied (DV victims physically dropped in a rebuilt apply pass), post state re-priced from data, per-file and __total reclaimed tax certified equal to the schedule's priced relief within the budget"))
}
