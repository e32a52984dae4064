package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** CSV scans matching the reference's two read shapes (SURVEY.md §2.1
  * S1/S2) plus its cast-dirty-to-null cleaning idiom.
  */
object CsvSource {

  /** Header + inferSchema two-pass read (reference:
    * TfIdfCalculator.java:33-36, RandomForest.java:31-34,
    * DataCorrelator.java:31-33).
    */
  def inferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** Header-only, all-string read (reference: SpamClassification.java:38-39;
    * ragged trailing columns surface as _c2.._cN).
    */
  def allString(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv").option("header", true).load(path)

  /** The reference's `col(c).cast("Double")` coerces junk values to null
    * (DataCorrelator.java:34-36) — Spark 2.3 non-ANSI semantics. Spark 4
    * is ANSI by default, where that cast THROWS; try_cast restores the
    * reference behavior without disabling ANSI session-wide.
    */
  def castDirtyToDouble(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)")))
}
