package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed scalably from
  * primitives (preference order (a) of the build brief — no custom
  * SparkPlan needed).
  */
object JoinOps {

  /** As-of join: for each left row, the latest right row with
    * rightTime <= leftTime on the same key.
    *
    * Implemented as the union-merge idiom: tag both sides, sort within
    * each key by (time, tag, rightId) and carry the last non-null right id
    * forward — ONE shuffle + sort over left+right, no range join and no
    * per-row probe. This is the shape that survives 100 TB: the window is
    * keyed, so parallelism = #keys, and no executor ever materializes more
    * than its partition.
    *
    * Right rows at exactly leftTime match (<=); ties among right rows on
    * the same timestamp resolve to the largest rightId.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key), col(leftTime).as("t"),
      col(leftId).as("l_id"), lit(null).cast("long").as("r_id"), lit(1).as("tag"))
    val r = right.select(col(key), col(rightTime).as("t"),
      lit(null).cast("long").as("l_id"), col(rightId).as("r_id"), lit(0).as("tag"))
    // right rows (tag 0) sort before left rows at the same instant → <=
    val w = Window.partitionBy(key).orderBy(col("t"), col("tag"), col("r_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("matched", last("r_id", ignoreNulls = true).over(w))
      .where(col("tag") === 1 && col("matched").isNotNull)
      .select(col(key), col("l_id").as(leftId), col("t").as(leftTime),
        col("matched").as(rightId))
  }

  /** LEFT as-of join with a match tolerance: every left row survives,
    * matched to the latest right row with rightTime in
    * [leftTime - tolerance, leftTime] on the same key, or null id/time
    * when no right row falls in the window. Same union-merge single
    * keyed shuffle as [[asofJoin]] — the globally-latest right row at or
    * before leftTime either lies inside the tolerance window or proves
    * no right row does, so the tolerance is a post-filter on the carried
    * struct, never a range join. Callers should pre-deduplicate right
    * rows to one per (key, time) for deterministic ids (q58's rule).
    *
    * Returns (key, leftId, leftTime, rightId nullable, `<rightId>_ts`
    * nullable) with `toleranceSec` applied inclusively — the matched
    * time column is suffixed so callers with identical left/right time
    * names never collide.
    */
  def asofJoinWithin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      leftId: String, rightId: String, toleranceSec: Long): DataFrame = {
    val rrowType = "struct<rt:timestamp,rid:bigint>"
    val l = left.select(col(key), col(leftTime).as("t"),
      col(leftId).as("l_id"), lit(null).cast(rrowType).as("rrow"), lit(1).as("tag"))
    val r = right.select(col(key), col(rightTime).as("t"),
      lit(null).cast("long").as("l_id"),
      struct(col(rightTime).as("rt"), col(rightId).cast("long").as("rid")).as("rrow"),
      lit(0).as("tag"))
    val w = Window.partitionBy(key).orderBy(col("t"), col("tag"), col("rrow.rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // EXACT interval comparison, not floored-epoch seconds: timestamps
    // carry sub-second precision, and a whole-second diff would admit a
    // right row up to 1s outside the window that an exact-interval
    // oracle rejects
    val inWin = col("m").isNotNull &&
      col("m.rt") >= col("t") - expr(s"INTERVAL $toleranceSec SECOND")
    r.unionByName(l)
      .withColumn("m", last("rrow", ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col(key), col("l_id").as(leftId), col("t").as(leftTime),
        when(inWin, col("m.rid")).as(rightId),
        when(inWin, col("m.rt")).as(s"${rightId}_ts"))
  }

  /** Bloom-filter semi-join: a driver-built Bloom filter over the build
    * side's keys pre-filters the fact side BEFORE the exact semi-join —
    * at scale this drops most fact rows ahead of the shuffle for the
    * price of one broadcast bitset. False positives are removed by the
    * exact join, so the result is identical to a plain left-semi join
    * (the oracle is EXISTS SQL). The probe is a codegen Expression
    * (functions.BloomMightContain), so the filter inlines into the scan's
    * whole-stage-codegen span instead of splitting it at a UDF boundary.
    */
  def bloomSemiJoin(fact: DataFrame, build: DataFrame, factKey: String,
      buildKey: String, fpp: Double = 0.01): DataFrame = {
    // the probe is long-keyed (mightContainLong); a string key would
    // hash build-side bytes but probe long casts — silently dropping
    // every match — so reject non-integral keys up front
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
    require(integral(fact.schema(factKey).dataType) &&
      integral(build.schema(buildKey).dataType),
      s"bloomSemiJoin requires integral key columns, got " +
        s"${fact.schema(factKey).dataType}/${build.schema(buildKey).dataType}")
    val n = math.max(build.count(), 1L)
    val bloom = build.stat.bloomFilter(buildKey, n, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    import org.apache.spark.sql.graft.ColumnBridge
    val probe = ColumnBridge.column(graft.functions.BloomMightContain(
      ColumnBridge.expression(col(factKey).cast("long")), bc))
    fact
      .where(col(factKey).isNotNull && probe)
      .join(build.select(col(buildKey)),
        col(factKey) === col(buildKey), "left_semi")
  }
}
