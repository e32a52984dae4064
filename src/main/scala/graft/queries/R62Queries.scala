package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-12 sixth widening — the MV arc CLOSED ECONOMICALLY and
  * COMPOSED with the snapshot arc:
  *
  *  - q425 prices the materialize-or-not decision the way q375 priced
  *    CoW/MoR: per (read rate × delta rate) cell, no-MV vs
  *    full-refresh vs IVM total cost from measured sizes, the chooser
  *    applied per cell, with the IVM leg's correctness EXECUTED (one
  *    delta applied as partials, certified equal to the full rebuild);
  *  - q426 serves FRESH answers from a STALE view: lazy merge-on-read
  *    compensation (view partials ⊕ unapplied-delta partials at query
  *    time) certified equal to the direct recompute, next to the
  *    uncompensated stale serve whose divergence is pinned to exactly
  *    the delta's contribution;
  *  - q427 maintains the 16-band revenue MV TRANSACTIONALLY with the
  *    q421 snapshot table: each version's CDC delta (q422) applied as
  *    signed partials (q355 retraction), certified per band against
  *    the view rebuilt from that snapshot's logical content — the
  *    replace snapshot costs ZERO maintenance (the q422 empty-CDC law
  *    transferring to the view), and the cumulative maintenance bill
  *    is priced next to rebuild-per-version.
  *
  * Scale: views and deltas are grain/delta-sized; the rebuild graders
  * are the certifying corpus passes.
  */
object R62Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** The MV-arc lineitem frame (same dims/measure as R60Queries). */
  private def liFrame(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").select(
      col("l_returnflag").as("f"), col("l_linestatus").as("s"),
      year(col("l_shipdate")).cast("long").as("y"),
      month(col("l_shipdate")).cast("long").as("m"),
      col("l_orderkey").as("k"),
      expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)").as("cents"))

  /** The delta membership predicate: ~1% of lineitem arrives "late"
    * (identical text in both engines; keyed so it is deterministic and
    * non-empty at every SF).
    */
  private val deltaPred = "k % 97 = 0"

  private val liSql: String =
    "li AS (SELECT l_returnflag AS f, l_linestatus AS s, CAST(year(l_shipdate) AS BIGINT) AS y, " +
      "CAST(month(l_shipdate) AS BIGINT) AS m, l_orderkey AS k, " +
      "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents FROM lineitem), " +
      s"base0 AS (SELECT * FROM li WHERE NOT ($deltaPred)), " +
      s"delta AS (SELECT * FROM li WHERE $deltaPred)"

  val specs: Seq[QuerySpec] = Seq(

    // q425 — THE MV TOTAL-COST-OF-OWNERSHIP CHOOSER: q417 chose WHICH
    // views; this decides WHETHER — the q375/q377 economics applied to
    // materialization. Per workload cell (reads r × deltas d per
    // cycle), three strategies priced in rows touched per cycle from
    // MEASURED sizes: no-MV pays r·n (every read scans the corpus);
    // full refresh pays d·n + r·g (rebuild per delta, then grain-sized
    // reads); IVM pays d·(δ + g) + r·g (apply delta partials into the
    // grain, then grain-sized reads). The 4×4 grid makes every
    // crossover visible: at d=0 any MV dominates; read-heavy cells
    // keep IVM ahead of full refresh by (n − δ − g) per delta; at
    // r=1, d=16 the corpus-sized rebuilds bury full-refresh. chosen =
    // per-cell argmin (ties to the simpler strategy). The arithmetic
    // is honest because the IVM leg is EXECUTED, not assumed: the
    // base0 grain ⊕ delta partials is certified equal to the grain of
    // base0 ∪ delta by full-outer compare (decomposability, the q406
    // law) — ivm_exact = 1 on every row. Scale: the certification is
    // the only corpus pass; the grid is arithmetic over three
    // measured integers.
    QuerySpec(
      "q425_mv_tco",
      (s, d) => {
        val li = liFrame(s, d).localCheckpoint(false)
        val base0 = li.where(expr(s"NOT ($deltaPred)"))
        val delta = li.where(expr(deltaPred))
        val v0 = base0.groupBy("f", "s", "y", "m")
          .agg(count(lit(1)).as("cnt"), sum("cents").as("sv"))
        val dp = delta.groupBy("f", "s", "y", "m")
          .agg(count(lit(1)).as("cnt"), sum("cents").as("sv"))
        val ivm = v0.unionByName(dp).groupBy("f", "s", "y", "m")
          .agg(sum("cnt").as("cnt"), sum("sv").as("sv"))
        val full = li.groupBy("f", "s", "y", "m")
          .agg(count(lit(1)).as("cnt"), sum("cents").as("sv"))
        val eq = ivm.select(col("f"), col("s"), col("y"), col("m"),
            col("cnt").as("a1"), col("sv").as("a2"))
          .join(full.select(col("f"), col("s"), col("y"), col("m"),
            col("cnt").as("b1"), col("sv").as("b2")),
            Seq("f", "s", "y", "m"), "full_outer")
          .agg(sum(when(expr(
              "a1 IS NULL OR b1 IS NULL OR a1 <> b1 OR a2 <> b2"), 1L)
            .otherwise(0L)).as("bad"))
          .select(expr("CAST(CASE WHEN bad = 0 THEN 1 ELSE 0 END AS BIGINT)")
            .as("ivm_exact"))
        val sizes = li.agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(full.agg(count(lit(1)).as("g"))))
          .crossJoin(broadcast(delta.agg(count(lit(1)).as("dl"))))
        val grid = s.range(4).select(expr("CAST(pow(4, id) AS BIGINT)").as("r"))
          .crossJoin(s.range(4).select(
            expr("CAST(CASE WHEN id = 0 THEN 0 ELSE pow(4, id - 1) END AS BIGINT)").as("d2")))
        grid.crossJoin(broadcast(sizes)).crossJoin(broadcast(eq))
          .select(col("r"), col("d2").as("d"),
            expr("r * n").as("cost_no_mv"),
            expr("d2 * n + r * g").as("cost_full_refresh"),
            expr("d2 * (dl + g) + r * g").as("cost_ivm"),
            expr("CASE WHEN r * n <= d2 * n + r * g AND r * n <= d2 * (dl + g) + r * g THEN '1:no_mv' " +
              "WHEN d2 * n + r * g <= d2 * (dl + g) + r * g THEN '2:full_refresh' ELSE '3:ivm' END")
              .as("chosen"),
            col("n"), col("g"), col("dl").as("delta_rows"), col("ivm_exact"))
          .orderBy("r", "d")
      },
      Some(
        s"""WITH $liSql, v0 AS (SELECT f, s, y, m, count(*) AS cnt, sum(cents) AS sv FROM base0 GROUP BY 1, 2, 3, 4), dp AS (SELECT f, s, y, m, count(*) AS cnt, sum(cents) AS sv FROM delta GROUP BY 1, 2, 3, 4), ivm AS (SELECT f, s, y, m, sum(cnt) AS cnt, sum(sv) AS sv FROM (SELECT * FROM v0 UNION ALL SELECT * FROM dp) u GROUP BY 1, 2, 3, 4), fullv AS (SELECT f, s, y, m, count(*) AS cnt, sum(cents) AS sv FROM li GROUP BY 1, 2, 3, 4), eq AS (SELECT CASE WHEN sum(CASE WHEN a.cnt IS NULL OR b.cnt IS NULL OR a.cnt <> b.cnt OR a.sv <> b.sv THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS ivm_exact FROM ivm a FULL JOIN fullv b ON a.f = b.f AND a.s = b.s AND a.y = b.y AND a.m = b.m), sizes AS (SELECT (SELECT count(*) FROM li) AS n, (SELECT count(*) FROM fullv) AS g, (SELECT count(*) FROM delta) AS dl), rr AS (SELECT 1 AS r UNION ALL SELECT 4 UNION ALL SELECT 16 UNION ALL SELECT 64), dd AS (SELECT 0 AS d UNION ALL SELECT 1 UNION ALL SELECT 4 UNION ALL SELECT 16) SELECT CAST(r AS BIGINT) AS r, CAST(d AS BIGINT) AS d, CAST(r * n AS BIGINT) AS cost_no_mv, CAST(d * n + r * g AS BIGINT) AS cost_full_refresh, CAST(d * (dl + g) + r * g AS BIGINT) AS cost_ivm, CASE WHEN r * n <= d * n + r * g AND r * n <= d * (dl + g) + r * g THEN '1:no_mv' WHEN d * n + r * g <= d * (dl + g) + r * g THEN '2:full_refresh' ELSE '3:ivm' END AS chosen, CAST(n AS BIGINT) AS n, CAST(g AS BIGINT) AS g, CAST(dl AS BIGINT) AS delta_rows, CAST(ivm_exact AS BIGINT) AS ivm_exact FROM rr CROSS JOIN dd CROSS JOIN sizes CROSS JOIN eq ORDER BY r, d"""),
      "A/S ext: the MV total-cost-of-ownership chooser — per (read rate x delta rate) cell, no-MV vs full-refresh vs IVM priced in rows touched from measured sizes with the per-cell argmin applied; the IVM leg executed (base0 grain + delta partials certified equal to the full rebuild), so the grid's arithmetic stands on a proven refresh path"),

    // q426 — LAZY MERGE-ON-READ SERVING FROM A STALE VIEW: the refresh
    // hasn't run (the delta sits unapplied), but the reader must see
    // FRESH results — the MV analogue of merge-on-read deletes: serve
    // = view partials ⊕ delta partials folded AT QUERY TIME. Two query
    // shapes execute (per-flag rollup; year-filtered per-flag rollup —
    // the filter folding into both the view slice and the delta scan),
    // each in three legs: compensated serve, direct recompute (the
    // grader), and the UNCOMPENSATED stale serve. Compensated == direct
    // certified per group; the stale serve's divergence is not just
    // flagged but EXPLAINED — missing rows == exactly the delta's
    // matching contribution (stale_gap_explained = 1), the integer
    // identity that says compensation is sufficient as well as
    // necessary. Bill: g + δ rows per fresh read instead of n. Scale:
    // the direct legs are the graders; serving touches grain + delta
    // partials only.
    QuerySpec(
      "q426_mv_lazy_serve",
      (s, d) => {
        val li = liFrame(s, d).localCheckpoint(false)
        val base0 = li.where(expr(s"NOT ($deltaPred)"))
        val delta = li.where(expr(deltaPred)).localCheckpoint(false)
        val v0 = base0.groupBy("f", "s", "y", "m")
          .agg(count(lit(1)).as("cnt"), sum("cents").as("sv"))
          .localCheckpoint(false)
        val sizes = li.agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(v0.agg(count(lit(1)).as("g"))))
          .crossJoin(broadcast(delta.agg(count(lit(1)).as("dl"))))
          .localCheckpoint(false)
        def shape(id: String, filt: String): DataFrame = {
          val vSlice = v0.where(expr(filt)).groupBy("f")
            .agg(sum("cnt").as("c1"), sum("sv").as("s1"))
          val dSlice = delta.where(expr(filt)).groupBy("f")
            .agg(count(lit(1)).as("c1"), sum("cents").as("s1"))
          val served = vSlice.unionByName(dSlice).groupBy("f")
            .agg(sum("c1").as("cnt"), sum("s1").as("sv"))
          val direct = li.where(expr(filt)).groupBy("f")
            .agg(count(lit(1)).as("cnt"), sum("cents").as("sv"))
          val stale = vSlice.groupBy("f")
            .agg(sum("c1").as("cnt"), sum("s1").as("sv"))
          def cmp(a: DataFrame, b: DataFrame, flag: String): DataFrame =
            a.select(col("f"), col("cnt").as("a1"), col("sv").as("a2"))
              .join(b.select(col("f"), col("cnt").as("b1"), col("sv").as("b2")),
                Seq("f"), "full_outer")
              .agg(sum(when(expr(
                  "a1 IS NULL OR b1 IS NULL OR a1 <> b1 OR a2 <> b2"), 1L)
                .otherwise(0L)).as("bad"))
              .select(expr(s"CAST(CASE WHEN bad = 0 THEN 1 ELSE 0 END AS BIGINT)")
                .as(flag))
          val fresh = cmp(served, direct, "fresh_equal")
          val staleEq = cmp(stale, direct, "stale_equal")
          val gap = stale.select(col("f"), col("cnt").as("st_c"))
            .join(direct.select(col("f"), col("cnt").as("di_c")), Seq("f"), "full_outer")
            .agg(sum(expr("coalesce(di_c, 0) - coalesce(st_c, 0)")).as("stale_missing_rows"))
          val dContrib = delta.where(expr(filt)).agg(count(lit(1)).as("delta_contrib"))
          val tot = direct.agg(count(lit(1)).as("groups"), sum("sv").as("total_cents"))
          broadcast(fresh).crossJoin(broadcast(staleEq)).crossJoin(broadcast(gap))
            .crossJoin(broadcast(dContrib)).crossJoin(broadcast(tot))
            .crossJoin(broadcast(sizes))
            .select(lit(id).as("shape"), col("groups").cast("long").as("groups"),
              col("total_cents"), col("fresh_equal"), col("stale_equal"),
              col("stale_missing_rows"), col("delta_contrib"),
              expr("CAST(CASE WHEN stale_missing_rows = delta_contrib THEN 1 ELSE 0 END AS BIGINT)")
                .as("stale_gap_explained"),
              expr("g + dl").as("fresh_read_rows"), col("n").as("direct_read_rows"))
        }
        shape("1:rollup_by_flag", "1 = 1")
          .unionByName(shape("2:filtered_recent", "y >= 1996"))
          .orderBy("shape")
      },
      Some {
        def shapeSql(id: String, filt: String): String =
          s"""SELECT '$id' AS shape,
            (SELECT count(*) FROM (SELECT f FROM li WHERE $filt GROUP BY f) z) AS groups,
            (SELECT sum(cents) FROM li WHERE $filt) AS total_cents,
            (SELECT CASE WHEN sum(CASE WHEN a.cnt IS NULL OR b.cnt IS NULL OR a.cnt <> b.cnt OR a.sv <> b.sv THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END FROM (SELECT f, sum(c1) AS cnt, sum(s1) AS sv FROM (SELECT f, sum(cnt) AS c1, sum(sv) AS s1 FROM v0 WHERE $filt GROUP BY f UNION ALL SELECT f, count(*) AS c1, sum(cents) AS s1 FROM delta WHERE $filt GROUP BY f) u GROUP BY f) a FULL JOIN (SELECT f, count(*) AS cnt, sum(cents) AS sv FROM li WHERE $filt GROUP BY f) b ON a.f = b.f) AS fresh_equal,
            (SELECT CASE WHEN sum(CASE WHEN a.cnt IS NULL OR b.cnt IS NULL OR a.cnt <> b.cnt OR a.sv <> b.sv THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END FROM (SELECT f, sum(cnt) AS cnt, sum(sv) AS sv FROM v0 WHERE $filt GROUP BY f) a FULL JOIN (SELECT f, count(*) AS cnt, sum(cents) AS sv FROM li WHERE $filt GROUP BY f) b ON a.f = b.f) AS stale_equal,
            (SELECT sum(coalesce(di_c, 0) - coalesce(st_c, 0)) FROM (SELECT f, sum(cnt) AS st_c FROM v0 WHERE $filt GROUP BY f) st FULL JOIN (SELECT f, count(*) AS di_c FROM li WHERE $filt GROUP BY f) di ON st.f = di.f) AS stale_missing_rows,
            (SELECT count(*) FROM delta WHERE $filt) AS delta_contrib"""
        s"""WITH $liSql, v0 AS (SELECT f, s, y, m, count(*) AS cnt, sum(cents) AS sv FROM base0 GROUP BY 1, 2, 3, 4), sizes AS (SELECT (SELECT count(*) FROM li) AS n, (SELECT count(*) FROM v0) AS g, (SELECT count(*) FROM delta) AS dl), legs AS (${shapeSql("1:rollup_by_flag", "1 = 1")} UNION ALL ${shapeSql("2:filtered_recent", "y >= 1996")}) SELECT shape, CAST(groups AS BIGINT) AS groups, CAST(total_cents AS BIGINT) AS total_cents, CAST(fresh_equal AS BIGINT) AS fresh_equal, CAST(stale_equal AS BIGINT) AS stale_equal, CAST(stale_missing_rows AS BIGINT) AS stale_missing_rows, CAST(delta_contrib AS BIGINT) AS delta_contrib, CAST(CASE WHEN stale_missing_rows = delta_contrib THEN 1 ELSE 0 END AS BIGINT) AS stale_gap_explained, CAST(g + dl AS BIGINT) AS fresh_read_rows, CAST(n AS BIGINT) AS direct_read_rows FROM legs CROSS JOIN sizes ORDER BY shape"""
      },
      "A/S ext: lazy merge-on-read serving from a stale view — view partials + unapplied-delta partials folded at query time, certified equal to the direct recompute for both query shapes; the uncompensated stale serve diverges by EXACTLY the delta's matching contribution (stale_gap_explained pins sufficiency), and the fresh read bills g+delta rows instead of the corpus"),

    // q427 — THE VERSIONED MV: q417's selection, q422's CDC and q355's
    // retraction composed — the 16-band revenue view maintained
    // TRANSACTIONALLY with the q421 snapshot table. Per version the
    // maintenance input is exactly the CDC delta (inserts as +1/+v
    // partials, deletes as −1/−v retractions, the replace snapshot as
    // the EMPTY delta), folded into the view state; the certificate
    // rebuilds the view from that snapshot's logical content and
    // compares per band (count and cents — a lost band, a negative
    // count, or a drifted sum all break it). v3's row is the
    // composition's law: ZERO maintenance rows for a snapshot that
    // rewrote 60% of the table's files — the view never notices
    // compaction, which is why view freshness survives storage
    // maintenance at 100 TB. The banding constant (vmax+1 from the
    // full keyed frame) is version-independent metadata, so bands are
    // stable across the timeline. Scale: maintenance touches
    // delta-sized partials; the rebuild graders are the corpus passes.
    QuerySpec(
      "q427_mv_versioned",
      (s, d) => {
        val keyed = R61Queries.keyedFrame(s, d)
        val vp = R61Queries.victimPred
        val bandOf = "least(15, v * 16 div (vmx + 1))"
        val mxv = keyed.agg(max("v").as("vmx")).localCheckpoint(false)
        // eager: the signed-partials pass and the rebuild grader below
        // consume `banded` from concurrent threads
        val banded = keyed.crossJoin(broadcast(mxv))
          .select(col("k"), col("v"), col("h"), col("f"), col("kcut"),
            expr(bandOf).as("b")).localCheckpoint(true)
        // ONE pass for all signed CDC partials: each row contributes to
        // its load/append delta (+1,+v) and, if a victim, to the delete
        // delta (-1,-v); v3's REPLACE delta is empty by construction
        val cIns = struct(lit(0L).as("dver"), lit(1L).as("sc"), col("v").as("sv"))
        val cDel = struct(lit(1L).as("dver"), lit(-1L).as("sc"), (-col("v")).as("sv"))
        val cApp = struct(lit(2L).as("dver"), lit(1L).as("sc"), col("v").as("sv"))
        // one slice, not the 32-slice default (a 4-row frame never needs
        // 32 tasks); eager because both passes below consume it
        val vers = s.range(0, 4, 1, 1).select(col("id").as("ver")).localCheckpoint(true)
        // the signed-partials pass (dd) and the rebuild grader (rc) are
        // independent passes over the stored banded frame — overlap
        // their checkpoints (graft.Par, guide §2.6); both eager (dd
        // feeds the states fold's construction, rc the final action)
        val (dd, rc) = graft.Par.par2(
          banded.select(col("b"), explode(
              when(expr(s"k <= kcut AND ($vp)"), array(cIns, cDel))
                .when(expr("k <= kcut"), array(cIns)).otherwise(array(cApp))).as("z"))
            .select(col("b"), col("z.dver").as("dver"), col("z.sc").as("sc"),
              col("z.sv").as("sv"))
            .groupBy("dver", "b").agg(sum("sc").as("dc"), sum("sv").as("dvv"))
            .localCheckpoint(true), // <= 48 rows
          banded.crossJoin(broadcast(vers)).where(expr(
              s"(ver = 0 AND k <= kcut) OR (ver = 1 AND k <= kcut AND NOT ($vp)) " +
                s"OR (ver >= 2 AND (NOT ($vp) OR k > kcut))"))
            .groupBy("ver", "b").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
            .localCheckpoint(true))
        // every version's maintained state from ONE cumulative fold
        val states = dd.join(broadcast(vers), expr("dver <= ver"))
          .groupBy("ver", "b").agg(sum("dc").as("cnt"), sum("dvv").as("sv"))
          .where(col("cnt") > 0L).localCheckpoint(false)
        val eq = states.select(col("ver"), col("b"), col("cnt").as("a1"), col("sv").as("a2"))
          .join(rc.select(col("ver"), col("b"), col("cnt").as("b1"), col("sv").as("b2")),
            Seq("ver", "b"), "full_outer")
          .groupBy("ver").agg(sum(when(expr(
              "a1 IS NULL OR b1 IS NULL OR a1 <> b1 OR a2 <> b2"), 1L)
            .otherwise(0L)).as("bad"))
          .select(col("ver"), expr("CAST(CASE WHEN bad = 0 THEN 1 ELSE 0 END AS BIGINT)")
            .as("view_equal_rebuild"))
        val bands = states.groupBy("ver").agg(count(lit(1)).as("bands"))
        val maint = dd.groupBy("dver").agg(sum(abs(col("dc"))).as("maint_rows"))
          .select(col("dver").as("ver"), col("maint_rows"))
        val rrows = rc.groupBy("ver").agg(sum("cnt").as("rebuild_rows"))
        val all = vers.join(bands, Seq("ver")).join(maint, Seq("ver"), "left")
          .join(rrows, Seq("ver")).join(eq, Seq("ver"))
          .select(col("ver").as("version"), col("bands"),
            coalesce(col("maint_rows"), lit(0L)).as("maint_rows"),
            col("rebuild_rows"), col("view_equal_rebuild"))
          .localCheckpoint(false)
        val wdw = org.apache.spark.sql.expressions.Window.orderBy("version")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        all.select(col("version"), col("bands"), col("maint_rows"),
            col("rebuild_rows"), col("view_equal_rebuild"),
            sum("maint_rows").over(wdw).as("cum_maint_rows"),
            sum("rebuild_rows").over(wdw).as("cum_rebuild_rows"))
          .orderBy("version")
      },
      Some {
        val vp = R61Queries.victimPred
        // the oracle folds the SAME signed partials (the IVM path) and
        // compares them against the rebuilds — the certificate is
        // recomputed, not assumed
        def eqSql(st: String, rb: String): String =
          s"(SELECT CASE WHEN sum(CASE WHEN a.cnt IS NULL OR b.cnt IS NULL OR a.cnt <> b.cnt OR a.sv <> b.sv THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END FROM $st a FULL JOIN $rb b ON a.b = b.b)"
        s"""WITH ${R61Queries.keyedSql}, mxv AS (SELECT max(v) AS vmx FROM keyed), banded AS (SELECT k, v, h, f, kcut, least(15, v * 16 // (vmx + 1)) AS b FROM keyed CROSS JOIN mxv),
          dd0 AS (SELECT b, count(*) AS dc, sum(v) AS dv FROM banded WHERE k <= kcut GROUP BY b),
          dd1 AS (SELECT b, -count(*) AS dc, -sum(v) AS dv FROM banded WHERE k <= kcut AND ($vp) GROUP BY b),
          dd2 AS (SELECT b, count(*) AS dc, sum(v) AS dv FROM banded WHERE k > kcut GROUP BY b),
          st0 AS (SELECT b, sum(dc) AS cnt, sum(dv) AS sv FROM dd0 GROUP BY b HAVING sum(dc) > 0),
          st1 AS (SELECT b, sum(dc) AS cnt, sum(dv) AS sv FROM (SELECT * FROM dd0 UNION ALL SELECT * FROM dd1) u GROUP BY b HAVING sum(dc) > 0),
          st2 AS (SELECT b, sum(dc) AS cnt, sum(dv) AS sv FROM (SELECT * FROM dd0 UNION ALL SELECT * FROM dd1 UNION ALL SELECT * FROM dd2) u GROUP BY b HAVING sum(dc) > 0),
          rb0 AS (SELECT b, count(*) AS cnt, sum(v) AS sv FROM banded WHERE k <= kcut GROUP BY b),
          rb1 AS (SELECT b, count(*) AS cnt, sum(v) AS sv FROM banded WHERE k <= kcut AND NOT ($vp) GROUP BY b),
          rb2 AS (SELECT b, count(*) AS cnt, sum(v) AS sv FROM banded WHERE NOT ($vp) OR k > kcut GROUP BY b),
          legs AS (
            SELECT 0 AS version, (SELECT count(*) FROM st0) AS bands, (SELECT count(*) FROM banded WHERE k <= kcut) AS maint_rows, (SELECT count(*) FROM banded WHERE k <= kcut) AS rebuild_rows, ${eqSql("st0", "rb0")} AS view_equal_rebuild
            UNION ALL SELECT 1, (SELECT count(*) FROM st1), (SELECT count(*) FROM banded WHERE k <= kcut AND ($vp)), (SELECT count(*) FROM banded WHERE k <= kcut AND NOT ($vp)), ${eqSql("st1", "rb1")}
            UNION ALL SELECT 2, (SELECT count(*) FROM st2), (SELECT count(*) FROM banded WHERE k > kcut), (SELECT count(*) FROM banded WHERE NOT ($vp) OR k > kcut), ${eqSql("st2", "rb2")}
            UNION ALL SELECT 3, (SELECT count(*) FROM st2), 0, (SELECT count(*) FROM banded WHERE NOT ($vp) OR k > kcut), ${eqSql("st2", "rb2")})
          SELECT CAST(version AS BIGINT) AS version, CAST(bands AS BIGINT) AS bands, CAST(maint_rows AS BIGINT) AS maint_rows, CAST(rebuild_rows AS BIGINT) AS rebuild_rows, CAST(view_equal_rebuild AS BIGINT) AS view_equal_rebuild, CAST(sum(maint_rows) OVER (ORDER BY version) AS BIGINT) AS cum_maint_rows, CAST(sum(rebuild_rows) OVER (ORDER BY version) AS BIGINT) AS cum_rebuild_rows FROM legs ORDER BY version"""
      },
      "A/S/L ext: the versioned MV — the 16-band revenue view maintained transactionally with the snapshot table from q422's CDC deltas (inserts as +partials, deletes as q355 retractions, the replace snapshot as the EMPTY delta), certified per band against the rebuild from each snapshot's logical content; zero maintenance rows on the compaction that rewrote 60% of the files, and the cumulative maintenance bill priced next to rebuild-per-version"))
}
