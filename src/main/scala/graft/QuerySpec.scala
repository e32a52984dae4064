package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-registered query: a Spark implementation plus (usually) a
  * DuckDB-dialect oracle SQL string the driver checks it against at sf0.01.
  *
  * Determinism rules (see SURVEY.md §5.2): every query ends in a total
  * `orderBy`, floating aggregates are rounded, integer outputs are cast to
  * BIGINT on both sides, and no raw timestamp columns are emitted (epoch
  * seconds instead) so the Spark-parquet vs DuckDB value compare is exact.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

object Tables {
  /** All driver tables are single parquet files under the sf dir (TESTDATA.md). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    * rejects. Read nanos as long and convert with exact integer division to
    * a microsecond timestamp (`div`, not `/` — the nano count overflows
    * double precision). DuckDB oracles mirror this with CAST(ts AS
    * TIMESTAMP), which also truncates ns → us.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
