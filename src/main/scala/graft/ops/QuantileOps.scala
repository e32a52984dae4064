package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-ELEMENT quantiles (the ceil(frac·n)-th smallest value, never an
  * interpolation — interpolated percentiles are the cross-engine one-ulp
  * hazard ADVICE r3 flagged) computed WITHOUT a global sort.
  *
  * Global ranks come from a two-level offset scheme: values hash into
  * `buckets` fixed-width buckets between the (per-group) min and max, the
  * bucket-total table (≤ buckets rows per group at ANY data size) yields
  * per-bucket rank offsets via a cumulative window, and within-bucket
  * ranks come from a bucket-partitioned window. The only window whose
  * partition doesn't shrink with the data is the offset cum over the
  * bounded bucket table — the q148-class exception. With per-group
  * windows every partition is bounded by distinct-values-per-bucket, so
  * the plan survives columns that are unique per row (a naive
  * cum-over-distinct-values degenerates to a global sort there: 583k of
  * 600k lineitem prices are distinct at sf0.1).
  */
object QuantileOps {

  /** Per-group exact-element quantile cuts.
    *
    * @param df        input rows
    * @param valueCol  numeric column (cast to double internally; null
    *                  values are excluded from ranks and counts)
    * @param groupCols grouping columns (empty = one global group)
    * @param fracs     quantile fractions, each mapped to rank ceil(frac·n)
    * @param buckets   fixed-width bucket count for the offset level
    * @return one row per group: groupCols ++ (cut_1 … cut_k) named
    *         `cut_<i>` in fracs order, plus `n` (group row count)
    */
  def exactElementQuantiles(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      fracs: Seq[Double],
      buckets: Int = 65536): DataFrame = {
    require(fracs.nonEmpty, "need at least one quantile fraction")
    val g = if (groupCols.isEmpty) Seq(lit(1L).as("__g")) else groupCols.map(col)
    val gNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val v = col(valueCol).cast("double")

    // nulls are excluded up front (mirrored in oracleSql): Spark windows
    // sort nulls FIRST and DuckDB sorts them LAST, so an unfiltered
    // nullable column would silently shift every rank on one side only
    val base = df.select(g :+ v.as("__v"): _*).where(col("__v").isNotNull)
    // distinct-value counts per group — the ONE exchange of raw rows;
    // group min/max/count then derive from this table (min/max are
    // invariant under dedup, n = Σ counts), so raw rows shuffle once,
    // not twice
    val pc0 = base.groupBy(gNames.map(col) :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val mm = pc0.groupBy(gNames.map(col): _*)
      .agg(min("__v").as("__mn"), max("__v").as("__mx"), sum("__c").as("n"))
    // bucket by fixed-width ranges; the mn==mx degenerate group
    // collapses into bucket 0
    val pc = pc0.join(mm, gNames)
      .withColumn("__bkt", when(col("__mx") === col("__mn"), lit(0L))
        .otherwise(least(lit(buckets - 1L), floor(
          (col("__v") - col("__mn")) * buckets / (col("__mx") - col("__mn"))).cast("long"))))
    val wOff = Window.partitionBy(gNames.map(col): _*).orderBy("__bkt")
    val off = pc.groupBy(gNames.map(col) :+ col("__bkt"): _*).agg(sum("__c").as("__bc"))
      .withColumn("__boff", coalesce(
        sum("__bc").over(wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gNames.map(col) :+ col("__bkt") :+ col("__boff"): _*)
    val wIn = Window.partitionBy(gNames.map(col) :+ col("__bkt"): _*).orderBy("__v")
    val cum = pc.join(off, gNames :+ "__bkt")
      .withColumn("__cum", col("__boff") +
        sum("__c").over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cutAggs = fracs.zipWithIndex.map { case (f, i) =>
      min(when(col("__cum") >= ceil(col("n") * f), col("__v"))).as(s"cut_${i + 1}")
    }
    cum.groupBy(gNames.map(col): _*)
      .agg(max("n").as("n"), cutAggs: _*)
      .drop(if (groupCols.isEmpty) "__g" else "__nonexistent")
  }

  /** WEIGHTED exact-element quantiles: the cut for fraction f is the
    * smallest value whose cumulative WEIGHT reaches ceil(f·W) (W = total
    * group weight) — the weighted generalization of the element rule,
    * computed with the same two-level bucket-offset scheme (per-value
    * partial weights replace per-value counts, so the plan inherits the
    * no-global-sort property verbatim). Weights must be positive
    * integers (BIGINT-exact cumulative sums — the determinism story
    * depends on it; quantize fractional weights first).
    *
    * Returns groupCols ++ (w_total, cut_1 … cut_k).
    */
  def weightedElementQuantiles(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      groupCols: Seq[String],
      fracs: Seq[Double],
      buckets: Int = 65536): DataFrame = {
    require(fracs.nonEmpty, "need at least one quantile fraction")
    val g = if (groupCols.isEmpty) Seq(lit(1L).as("__g")) else groupCols.map(col)
    val gNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val v = col(valueCol).cast("double")
    // Enforce — not just document — the positive-integer-weight
    // precondition: the cast("long") TRUNCATES fractional weights toward
    // zero (quantize upstream if that matters), and any row left with
    // __w <= 0 after truncation is dropped here. Zero/negative weights
    // would otherwise corrupt the cumulative-weight ranks silently (a
    // negative weight makes __cum non-monotone within its bucket); the
    // filter makes the contract hold by construction, mirroring the
    // `WHERE __w > 0` in weightedOracleSql.
    val base = df.select(g :+ v.as("__v") :+ col(weightCol).cast("long").as("__w"): _*)
      .where(col("__v").isNotNull && col("__w") > 0)
    val pc0 = base.groupBy(gNames.map(col) :+ col("__v"): _*).agg(sum("__w").as("__c"))
    val mm = pc0.groupBy(gNames.map(col): _*)
      .agg(min("__v").as("__mn"), max("__v").as("__mx"), sum("__c").as("w_total"))
    val pc = pc0.join(mm, gNames)
      .withColumn("__bkt", when(col("__mx") === col("__mn"), lit(0L))
        .otherwise(least(lit(buckets - 1L), floor(
          (col("__v") - col("__mn")) * buckets / (col("__mx") - col("__mn"))).cast("long"))))
    val wOff = Window.partitionBy(gNames.map(col): _*).orderBy("__bkt")
    val off = pc.groupBy(gNames.map(col) :+ col("__bkt"): _*).agg(sum("__c").as("__bc"))
      .withColumn("__boff", coalesce(
        sum("__bc").over(wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(gNames.map(col) :+ col("__bkt") :+ col("__boff"): _*)
    val wIn = Window.partitionBy(gNames.map(col) :+ col("__bkt"): _*).orderBy("__v")
    val cum = pc.join(off, gNames :+ "__bkt")
      .withColumn("__cum", col("__boff") +
        sum("__c").over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cutAggs = fracs.zipWithIndex.map { case (f, i) =>
      min(when(col("__cum") >= ceil(col("w_total") * f), col("__v"))).as(s"cut_${i + 1}")
    }
    cum.groupBy(gNames.map(col): _*)
      .agg(max("w_total").as("w_total"), cutAggs: _*)
      .drop(if (groupCols.isEmpty) "__g" else "__nonexistent")
  }

  /** DuckDB CTE mirror of [[weightedElementQuantiles]] — identical
    * bucket math and ceil ranks, weights summed as BIGINT.
    * Returns SQL selecting groupCols ++ w_total ++ cut_i from `<from>`.
    */
  def weightedOracleSql(from: String, valueCol: String, weightCol: String,
      groupCols: Seq[String], fracs: Seq[Double], buckets: Int = 65536): String = {
    val gSel = if (groupCols.isEmpty) "1 AS __g" else groupCols.mkString(", ")
    val gNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val gList = gNames.mkString(", ")
    val cuts = fracs.zipWithIndex.map { case (f, i) =>
      s"min(CASE WHEN __cum >= ceil(w_total * $f) THEN __v END) AS cut_${i + 1}"
    }.mkString(", ")
    val outCols = (if (groupCols.isEmpty) "" else s"$gList, ") + s"w_total, ${
      fracs.indices.map(i => s"cut_${i + 1}").mkString(", ")}"
    s"""(WITH qb AS (SELECT $gSel, CAST($valueCol AS DOUBLE) AS __v, CAST($weightCol AS BIGINT) AS __w FROM $from WHERE $valueCol IS NOT NULL AND CAST($weightCol AS BIGINT) > 0),
qpc0 AS (SELECT $gList, __v, CAST(sum(__w) AS BIGINT) AS __c FROM qb GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}, __v),
qmm AS (SELECT $gList, min(__v) AS __mn, max(__v) AS __mx, CAST(sum(__c) AS BIGINT) AS w_total FROM qpc0 GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}),
qpc AS (SELECT z.*, CASE WHEN __mx = __mn THEN 0 ELSE least($buckets - 1, CAST(floor((__v - __mn) * $buckets / (__mx - __mn)) AS BIGINT)) END AS __bkt, w_total FROM qpc0 z JOIN qmm USING ($gList)),
qoff AS (SELECT $gList, __bkt, CAST(coalesce(sum(__bc) OVER (PARTITION BY $gList ORDER BY __bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS __boff FROM (SELECT $gList, __bkt, sum(__c) AS __bc FROM qpc GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}, __bkt) b),
qcum AS (SELECT qpc.__v, qpc.w_total, ${gNames.map(n => s"qpc.$n").mkString(", ")}, qoff.__boff + CAST(sum(qpc.__c) OVER (PARTITION BY ${gNames.map(n => s"qpc.$n").mkString(", ")}, qpc.__bkt ORDER BY qpc.__v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS __cum FROM qpc JOIN qoff ON ${gNames.map(n => s"qpc.$n = qoff.$n").mkString(" AND ")} AND qpc.__bkt = qoff.__bkt)
SELECT $outCols FROM (SELECT $gList, max(w_total) AS w_total, $cuts FROM qcum GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}) f)"""
  }

  /** Convenience single-fraction form: groupCols ++ (n, cut). */
  def exactElementQuantile(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      frac: Double,
      buckets: Int = 65536): DataFrame =
    exactElementQuantiles(df, valueCol, groupCols, Seq(frac), buckets)
      .withColumnRenamed("cut_1", "cut")

  /** The matching DuckDB CTE body for one group set + fraction list —
    * kept next to the Spark implementation so query oracles replay the
    * IDENTICAL arithmetic (same bucket math, same ceil ranks).
    * Returns SQL selecting groupCols ++ n ++ cut_i from `<from>`.
    */
  def oracleSql(from: String, valueCol: String, groupCols: Seq[String],
      fracs: Seq[Double], buckets: Int = 65536): String = {
    val gSel = if (groupCols.isEmpty) "1 AS __g" else groupCols.mkString(", ")
    val gNames = if (groupCols.isEmpty) Seq("__g") else groupCols
    val gList = gNames.mkString(", ")
    val cuts = fracs.zipWithIndex.map { case (f, i) =>
      s"min(CASE WHEN __cum >= ceil(n * $f) THEN __v END) AS cut_${i + 1}"
    }.mkString(", ")
    val outCols = (if (groupCols.isEmpty) "" else s"$gList, ") + s"n, ${
      fracs.indices.map(i => s"cut_${i + 1}").mkString(", ")}"
    s"""(WITH qb AS (SELECT $gSel, CAST($valueCol AS DOUBLE) AS __v FROM $from WHERE $valueCol IS NOT NULL),
qpc0 AS (SELECT $gList, __v, count(*) AS __c FROM qb GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}, __v),
qmm AS (SELECT $gList, min(__v) AS __mn, max(__v) AS __mx, CAST(sum(__c) AS BIGINT) AS n FROM qpc0 GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}),
qpc AS (SELECT z.*, CASE WHEN __mx = __mn THEN 0 ELSE least($buckets - 1, CAST(floor((__v - __mn) * $buckets / (__mx - __mn)) AS BIGINT)) END AS __bkt, n FROM qpc0 z JOIN qmm USING ($gList)),
qoff AS (SELECT $gList, __bkt, CAST(coalesce(sum(__bc) OVER (PARTITION BY $gList ORDER BY __bkt ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS __boff FROM (SELECT $gList, __bkt, sum(__c) AS __bc FROM qpc GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}, __bkt) b),
qcum AS (SELECT qpc.__v, qpc.n, ${gNames.map(n => s"qpc.$n").mkString(", ")}, qoff.__boff + CAST(sum(qpc.__c) OVER (PARTITION BY ${gNames.map(n => s"qpc.$n").mkString(", ")}, qpc.__bkt ORDER BY qpc.__v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS __cum FROM qpc JOIN qoff ON ${gNames.map(n => s"qpc.$n = qoff.$n").mkString(" AND ")} AND qpc.__bkt = qoff.__bkt)
SELECT $outCols FROM (SELECT $gList, max(n) AS n, $cuts FROM qcum GROUP BY ${gNames.indices.map(_ + 1).mkString(", ")}) f)"""
  }
}
