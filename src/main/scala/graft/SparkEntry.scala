package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.AllQueries

/** Driver contract — see SURVEY.md §7 and TESTDATA.md. */
object SparkEntry {

  /** Flagship query (bucketize + group-agg + sort, the reference's most
    * query-like shape — DataCorrelator.java:41-51) on sf0.001; driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_bucket_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    AllQueries.specs.map(q => q.name -> q.fn).toMap

  /** DuckDB-dialect oracle SQL per query; omitted entries get the
    * driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    AllQueries.specs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
