package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-7 widening, part 5: ordered event-pattern matching (q317) —
  * the CEP / MATCH_RECOGNIZE capability Spark has no native operator
  * for, expressed as bounded per-user range joins with a deterministic
  * lexicographic-minimum match policy.
  */
object R32Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val specs: Seq[QuerySpec] = Seq(

    // q317 — ORDERED EVENT-PATTERN MATCH (view → click → purchase with
    // per-step deadlines): for each user, find the EARLIEST completed
    // instance of the 3-step pattern where the click lands within 12 h
    // after the view and the purchase within 24 h after the click
    // (deadlines sized to the corpus cadence: ~11 h median inter-event
    // gap, so the tight-funnel 1h/2h variant fires for ~1 user — 83
    // users convert at 12h/24h, a live fixture).
    // "Earliest" is the lexicographic minimum over valid (tv, tc, tp)
    // triples — ONE min(struct(...)) aggregate, the deterministic match
    // policy MATCH_RECOGNIZE calls "after match skip": both engines
    // order structs field-wise, so the chosen triple is identical
    // bit-for-bit with zero tie-break windows. Plan shape: two
    // user-keyed joins with range predicates — everything co-partitions
    // on user_id, so a 100-TB run is one user shuffle and per-user
    // sort-merge; candidate fan-out per user is bounded by events-per-
    // user × deadline width, the CEP state bound. Reports the matched
    // timestamps, per-step lags, and total span per converting user.
    QuerySpec(
      "q317_event_pattern",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_timestamp(col("ts")).as("es"))
        def leg(tpe: String, as: String) =
          ev.where(col("event_type") === tpe)
            .select(col("user_id"), col("es").as(as))
        leg("view", "tv")
          .join(leg("click", "tc"), "user_id")
          .where(col("tc") > col("tv") && col("tc") <= col("tv") + 43200L)
          .join(leg("purchase", "tp"), "user_id")
          .where(col("tp") > col("tc") && col("tp") <= col("tc") + 86400L)
          .groupBy("user_id")
          .agg(min(struct(col("tv"), col("tc"), col("tp"))).as("m"),
            count(lit(1)).as("n_matches"))
          .select(col("user_id"),
            col("m.tv").as("view_es"),
            (col("m.tc") - col("m.tv")).as("click_lag_s"),
            (col("m.tp") - col("m.tc")).as("purchase_lag_s"),
            (col("m.tp") - col("m.tv")).as("span_s"),
            col("n_matches"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es FROM events), v AS (SELECT user_id, es AS tv FROM ev WHERE event_type = 'view'), c AS (SELECT user_id, es AS tc FROM ev WHERE event_type = 'click'), p AS (SELECT user_id, es AS tp FROM ev WHERE event_type = 'purchase'), m AS (SELECT v.user_id, v.tv, c.tc, p.tp FROM v JOIN c ON c.user_id = v.user_id AND c.tc > v.tv AND c.tc <= v.tv + 43200 JOIN p ON p.user_id = v.user_id AND p.tp > c.tc AND p.tp <= c.tc + 86400), best AS (SELECT user_id, min(struct_pack(tv := tv, tc := tc, tp := tp)) AS m, count(*) AS n_matches FROM m GROUP BY 1) SELECT user_id, m.tv AS view_es, m.tc - m.tv AS click_lag_s, m.tp - m.tc AS purchase_lag_s, m.tp - m.tv AS span_s, n_matches FROM best ORDER BY user_id"""),
      "§2.12/§2.3 ext: ordered event-pattern match (CEP) — per-step deadlines, lexicographic-min match policy"))
}
