package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-12 third widening — the rewrite arc's CATALOG and two more
  * members:
  *
  *  - q412 mines the RELY-constraint catalog q407/FkJoinEliminationRule
  *    consume: every name-matched PK-FK candidate edge in the schema
  *    audited from data in one sweep (nulls / orphans / duplicate pks),
  *    with the reverse edge as the built-in negative control;
  *  - q413 prices outer→inner join conversion: the null-rejecting test
  *    evaluated AS DATA (the predicate probed at NULL), both forms
  *    executed against a dim subset that genuinely null-extends, and
  *    the legality verdict certified against the measured equality;
  *  - q414 pushes the aggregate through UNION ALL: per-branch partial
  *    dedup cuts the final distinct's shuffle to the partials' size,
  *    certified equal to the naive global dedup.
  */
object R59Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val specs: Seq[QuerySpec] = Seq(

    // q412 — THE RELY-CONSTRAINT CATALOG, MINED: q407 audited one edge;
    // the schema has seven name-matched PK-FK candidates, and the
    // catalog a warehouse optimizer consults is the AUDIT OF ALL OF
    // THEM — one ANALYZE-grade sweep arming join elimination (and
    // orphan-safe outer→inner conversion, q413) for every dimension
    // join in the workload. Per edge: fk nulls, orphans (fact keys with
    // no pk), duplicate pks, and the valid verdict — exactly what
    // plans/RiConstraints.validate checks before registering, run here
    // as the registry's bulk loader. The eighth edge is the REVERSE of
    // the customer edge (customer "fact" → orders "pk"): it fails the
    // uniqueness leg outright — every customer's key repeats once per
    // order — the built-in control showing the audit discriminates
    // DIRECTION, not just table pairs. Measured: all seven forward
    // edges valid at every SF (TPC-H referential integrity), the
    // reverse edge never. Scale: each edge is one anti-join + one keyed dup count
    // over tables the workload joins anyway; the catalog is 8 rows of
    // state that deletes whole subtrees from plans.
    QuerySpec(
      "q412_ri_catalog",
      (s, d) => {
        def edge(id: String, fact: DataFrame, fk: String,
            dim: DataFrame, pk: String): DataFrame = {
          val f = fact.select(col(fk).as("fk")).localCheckpoint(false)
          val p = dim.select(col(pk).as("pk")).localCheckpoint(false)
          val nulls = f.agg(sum(when(col("fk").isNull, 1L).otherwise(0L)).as("fk_nulls"),
            count(lit(1)).as("fact_rows"))
          val orphans = f.join(p, col("fk") === col("pk"), "left_anti")
            .agg(count(lit(1)).as("orphans"))
          val dups = p.groupBy("pk").agg(count(lit(1)).as("c"))
            .agg(sum(when(col("c") > 1L, 1L).otherwise(0L)).as("dup_pks"),
              count(lit(1)).as("pk_keys"))
          nulls.crossJoin(broadcast(orphans)).crossJoin(broadcast(dups))
            .select(lit(id).as("edge"), col("fact_rows"), col("pk_keys"),
              col("fk_nulls"), col("orphans"), col("dup_pks"),
              expr("CAST(CASE WHEN fk_nulls = 0 AND orphans = 0 AND dup_pks = 0 THEN 1 ELSE 0 END AS BIGINT)")
                .as("valid"))
        }
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val cu = t(s, d, "customer"); val su = t(s, d, "supplier")
        val pa = t(s, d, "part"); val na = t(s, d, "nation"); val re = t(s, d, "region")
        Seq(
          edge("1:lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
          edge("2:lineitem.l_partkey->part", li, "l_partkey", pa, "p_partkey"),
          edge("3:lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
          edge("4:orders.o_custkey->customer", o, "o_custkey", cu, "c_custkey"),
          edge("5:customer.c_nationkey->nation", cu, "c_nationkey", na, "n_nationkey"),
          edge("6:supplier.s_nationkey->nation", su, "s_nationkey", na, "n_nationkey"),
          edge("7:nation.n_regionkey->region", na, "n_regionkey", re, "r_regionkey"),
          edge("8:REVERSE customer.c_custkey->orders", cu, "c_custkey", o, "o_custkey"))
          .reduce(_ unionByName _)
          .orderBy("edge")
      },
      Some {
        def edgeSql(id: String, factT: String, fk: String, dimT: String, pk: String): String =
          s"""SELECT '$id' AS edge,
            (SELECT count(*) FROM $factT) AS fact_rows,
            (SELECT count(DISTINCT $pk) FROM $dimT) AS pk_keys,
            (SELECT sum(CASE WHEN $fk IS NULL THEN 1 ELSE 0 END) FROM $factT) AS fk_nulls,
            (SELECT count(*) FROM $factT WHERE $fk NOT IN (SELECT $pk FROM $dimT)) AS orphans,
            (SELECT sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) FROM (SELECT $pk, count(*) AS c FROM $dimT GROUP BY 1) g) AS dup_pks"""
        val edges = Seq(
          edgeSql("1:lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          edgeSql("2:lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          edgeSql("3:lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          edgeSql("4:orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
          edgeSql("5:customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
          edgeSql("6:supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
          edgeSql("7:nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
          edgeSql("8:REVERSE customer.c_custkey->orders", "customer", "c_custkey", "orders", "o_custkey"))
          .mkString(" UNION ALL ")
        // pk_keys for the Spark side is count over the RAW pk column
        // rows (dup-aware grouping count); DuckDB mirrors with the
        // grouped count — identical because grouping counts keys
        s"""WITH legs AS ($edges) SELECT edge, CAST(fact_rows AS BIGINT) AS fact_rows, CAST(pk_keys AS BIGINT) AS pk_keys, CAST(fk_nulls AS BIGINT) AS fk_nulls, CAST(orphans AS BIGINT) AS orphans, CAST(dup_pks AS BIGINT) AS dup_pks, CAST(CASE WHEN fk_nulls = 0 AND orphans = 0 AND dup_pks = 0 THEN 1 ELSE 0 END AS BIGINT) AS valid FROM legs ORDER BY edge"""
      },
      "J ext: the RELY-constraint catalog mined — all seven name-matched PK-FK edges of the schema audited from data in one sweep (nulls/orphans/duplicate pks, the exact RiConstraints.validate gate), plus the reverse customer edge as the control failing both ways; 8 rows of state that let the optimizer delete whole join subtrees"),

    // q413 — OUTER→INNER CONVERSION, THE LEGALITY CERTIFIED AS DATA: a
    // left join kept "to be safe" blocks reorder, broadcast choice and
    // elimination; converting it to inner is legal exactly when the
    // predicate above it is NULL-REJECTING (a null-extended row cannot
    // survive). That test is evaluated here the engine's way — the
    // predicate PROBED AT NULL on a one-row frame (reject = NULL input
    // does not satisfy) — and then both join forms EXECUTE against a
    // dim deliberately cut to 60% of nations so the outer join
    // genuinely null-extends (~40% of orders orphaned; with the full
    // dim TPC-H RI would make the two forms vacuously equal and
    // certify nothing — the q293 dead-fixture rule). Scenario 1
    // (segment equality) rejects NULL → converted inner certified
    // EQUAL; scenario 2 (IS NULL — the "find the orphans" predicate)
    // tolerates NULL → the forms DIVERGE by exactly the orphaned
    // orders, and the conversion verdict refuses. audit_correct pins
    // verdict == measured equality in both scenarios. Scale: the
    // legality probe is one row; the executed legs are the graders.
    QuerySpec(
      "q413_outer_to_inner",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_custkey").as("fk"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
          .localCheckpoint(false)
        val dim = t(s, d, "customer").where(col("c_nationkey") < 15)
          .select(col("c_custkey").as("pk"), col("c_mktsegment").as("seg"))
          .localCheckpoint(false)
        def leg(id: String, predSql: String): DataFrame = {
          // the legality probe: the predicate evaluated on a one-row
          // frame whose seg IS NULL — rejecting iff it does not pass
          val probe = o.sparkSession.range(1).toDF("x")
            .select(lit(null).cast("string").as("seg"))
            .agg(sum(when(expr(predSql), 1L).otherwise(0L)).as("null_pass"))
            .select(expr("CAST(CASE WHEN null_pass = 0 THEN 1 ELSE 0 END AS BIGINT)")
              .as("null_rejecting"))
          val outer = o.join(dim, col("fk") === col("pk"), "left_outer")
            .where(expr(predSql))
            .agg(count(lit(1)).as("rows_outer"), sum("cents").as("cents_outer"))
          val inner = o.join(dim, col("fk") === col("pk"))
            .where(expr(predSql))
            .agg(count(lit(1)).as("rows_inner"), sum("cents").as("cents_inner"))
          probe.crossJoin(broadcast(outer)).crossJoin(broadcast(inner))
            .select(lit(id).as("scenario"), col("null_rejecting"),
              col("rows_outer"), col("rows_inner"),
              coalesce(col("cents_outer"), lit(0L)).as("cents_outer"),
              coalesce(col("cents_inner"), lit(0L)).as("cents_inner"),
              expr("CAST(CASE WHEN rows_outer = rows_inner AND coalesce(cents_outer, 0) = coalesce(cents_inner, 0) THEN 1 ELSE 0 END AS BIGINT)")
                .as("equal_results"),
              col("null_rejecting").as("convert"))
        }
        leg("1:seg_equality", "seg = 'BUILDING'")
          .unionByName(leg("2:seg_is_null", "seg IS NULL"))
          .withColumn("audit_correct",
            expr("CAST(CASE WHEN convert = equal_results THEN 1 ELSE 0 END AS BIGINT)"))
          .orderBy("scenario")
      },
      Some {
        def legSql(id: String, pred: String): String =
          s"""SELECT '$id' AS scenario,
            (SELECT CASE WHEN sum(CASE WHEN $pred THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END FROM (SELECT CAST(NULL AS VARCHAR) AS seg) z) AS null_rejecting,
            (SELECT count(*) FROM o LEFT JOIN dim ON dim.pk = o.fk WHERE $pred) AS rows_outer,
            (SELECT count(*) FROM o JOIN dim ON dim.pk = o.fk WHERE $pred) AS rows_inner,
            (SELECT coalesce(sum(cents), 0) FROM o LEFT JOIN dim ON dim.pk = o.fk WHERE $pred) AS cents_outer,
            (SELECT coalesce(sum(cents), 0) FROM o JOIN dim ON dim.pk = o.fk WHERE $pred) AS cents_inner"""
        s"""WITH o AS (SELECT o_custkey AS fk, CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents FROM orders), dim AS (SELECT c_custkey AS pk, c_mktsegment AS seg FROM customer WHERE c_nationkey < 15), legs AS (${legSql("1:seg_equality", "seg = 'BUILDING'")} UNION ALL ${legSql("2:seg_is_null", "seg IS NULL")}), k AS (SELECT *, CASE WHEN rows_outer = rows_inner AND cents_outer = cents_inner THEN 1 ELSE 0 END AS equal_results FROM legs) SELECT scenario, CAST(null_rejecting AS BIGINT) AS null_rejecting, CAST(rows_outer AS BIGINT) AS rows_outer, CAST(rows_inner AS BIGINT) AS rows_inner, CAST(cents_outer AS BIGINT) AS cents_outer, CAST(cents_inner AS BIGINT) AS cents_inner, CAST(equal_results AS BIGINT) AS equal_results, CAST(null_rejecting AS BIGINT) AS convert, CAST(CASE WHEN null_rejecting = equal_results THEN 1 ELSE 0 END AS BIGINT) AS audit_correct FROM k ORDER BY scenario"""
      },
      "J ext: outer->inner conversion legality certified as data — the null-rejecting test probed at NULL on a one-row frame, both join forms executed against a dim cut to 60% of nations so the outer join genuinely null-extends; the equality predicate converts (certified equal), IS NULL refuses (forms diverge by exactly the orphans), audit_correct pins verdict == measurement"),

    // q414 — AGGREGATE PUSHED THROUGH UNION ALL: the distinct-customer
    // rollup over a two-branch union (first half-year ∪ second) dedups
    // n rows globally; pushing the dedup INTO each branch first sends
    // only the partial distinct sets — ~10x fewer rows at every SF —
    // into the final merge, and the re-dedup of the partials is exact
    // because distinct-of-union == distinct-of-union-of-distincts (set
    // algebra, certified here by count and checksum). The same push is
    // what makes branch-local pre-aggregation legal for any
    // decomposable aggregate over partitioned/unioned tables — at
    // 100 TB each branch dedups on its own executors and only
    // partial sets cross the wire. chosen = fewer rows into the final
    // exchange. Scale: the naive leg's global dedup IS the grader.
    QuerySpec(
      "q414_agg_through_union",
      (s, d) => {
        val o = t(s, d, "orders").select(col("o_custkey").as("c"),
          month(col("o_orderdate")).cast("long").as("m"))
        val b1 = o.where(col("m") <= 6).select("c")
        val b2 = o.where(col("m") > 6).select("c")
        val naiveIn = b1.unionAll(b2)
        val nIn = naiveIn.agg(count(lit(1)).as("rows_naive"))
        val naive = naiveIn.distinct()
          .agg(count(lit(1)).as("nd_naive"), sum("c").as("ck_naive"))
        val d1 = b1.distinct().localCheckpoint(false)
        val d2 = b2.distinct().localCheckpoint(false)
        val pIn = d1.agg(count(lit(1)).as("p1"))
          .crossJoin(broadcast(d2.agg(count(lit(1)).as("p2"))))
        val pushed = d1.unionAll(d2).distinct()
          .agg(count(lit(1)).as("nd_push"), sum("c").as("ck_push"))
        val one = nIn.crossJoin(broadcast(naive)).crossJoin(broadcast(pIn))
          .crossJoin(broadcast(pushed))
          .withColumn("equal_results",
            expr("CAST(CASE WHEN nd_naive = nd_push AND ck_naive = ck_push THEN 1 ELSE 0 END AS BIGINT)"))
        one.select(explode(array(
            struct(lit("1:global_dedup").as("variant"),
              col("rows_naive").as("rows_into_final")),
            struct(lit("2:pushed_dedup").as("variant"),
              expr("p1 + p2").as("rows_into_final")))).as("z"),
            col("rows_naive"), col("p1"), col("p2"), col("nd_naive"),
            col("ck_naive"), col("equal_results"))
          .select(col("z.variant").as("variant"),
            col("z.rows_into_final").as("rows_into_final"),
            col("nd_naive").as("distinct_out"), col("ck_naive").as("checksum"),
            col("equal_results"),
            expr("(rows_naive - (p1 + p2)) * 10000 div rows_naive").as("saved_bp"),
            expr("CAST(CASE WHEN z.rows_into_final = least(rows_naive, p1 + p2) THEN 1 ELSE 0 END AS BIGINT)")
              .as("chosen"))
          .orderBy("variant")
      },
      Some(
        """WITH o AS (SELECT o_custkey AS c, CAST(month(o_orderdate) AS BIGINT) AS m FROM orders), b1 AS (SELECT c FROM o WHERE m <= 6), b2 AS (SELECT c FROM o WHERE m > 6), ni AS (SELECT count(*) AS rows_naive FROM (SELECT c FROM b1 UNION ALL SELECT c FROM b2) u), na AS (SELECT count(*) AS nd_naive, sum(c) AS ck_naive FROM (SELECT DISTINCT c FROM (SELECT c FROM b1 UNION ALL SELECT c FROM b2) u) z), p1 AS (SELECT count(*) AS p1 FROM (SELECT DISTINCT c FROM b1) x), p2 AS (SELECT count(*) AS p2 FROM (SELECT DISTINCT c FROM b2) x), pu AS (SELECT count(*) AS nd_push, sum(c) AS ck_push FROM (SELECT DISTINCT c FROM (SELECT DISTINCT c FROM b1 UNION ALL SELECT DISTINCT c FROM b2) u) z), base AS (SELECT * FROM ni CROSS JOIN na CROSS JOIN p1 CROSS JOIN p2 CROSS JOIN pu), legs AS (SELECT '1:global_dedup' AS variant, rows_naive AS rows_into_final FROM base UNION ALL SELECT '2:pushed_dedup', p1 + p2 FROM base) SELECT variant, CAST(rows_into_final AS BIGINT) AS rows_into_final, CAST(nd_naive AS BIGINT) AS distinct_out, CAST(ck_naive AS BIGINT) AS checksum, CAST(CASE WHEN nd_naive = nd_push AND ck_naive = ck_push THEN 1 ELSE 0 END AS BIGINT) AS equal_results, CAST((rows_naive - (p1 + p2)) * 10000 // rows_naive AS BIGINT) AS saved_bp, CAST(CASE WHEN rows_into_final = least(rows_naive, p1 + p2) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM legs CROSS JOIN base ORDER BY variant"""),
      "A/J ext: aggregate pushed through UNION ALL — per-branch dedup sends only the partial distinct sets (~10x fewer rows) into the final merge, certified exact by set algebra (count + checksum vs the global dedup); the push that makes branch-local pre-aggregation legal for any decomposable aggregate"))
}
