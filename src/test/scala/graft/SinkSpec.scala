package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Write-side coverage (SURVEY.md §2.1 note: the reference has no file
  * sinks; the engine's are Spark's writers): partitioned parquet with
  * partition pruning on read-back, and CSV round-trip.
  */
class SinkSpec extends SparkSpecBase {

  test("partitionBy write prunes partitions on filtered read") {
    val dir = Files.createTempDirectory("sink").toString
    Tables.load(spark, sf001, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(s"$dir/orders_by_year")

    val back = spark.read.parquet(s"$dir/orders_by_year").where(col("yr") === 1996)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "expected partition filters in scan")
    val expected = Tables.load(spark, sf001, "orders")
      .where(year(col("o_orderdate")) === 1996).count()
    assert(back.count() == expected)
  }

  test("csv round-trip preserves rows") {
    val dir = Files.createTempDirectory("sinkcsv").toString
    val src = Tables.load(spark, sf001, "region")
    src.write.mode("overwrite").option("header", true).csv(s"$dir/region_csv")
    val back = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$dir/region_csv")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
  }

  test("q60 IVF ANN returns one deterministic neighbor per query") {
    val q = SparkEntry.queries("q60_ivf_ann")
    val a = q(spark, sf001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = q(spark, sf001).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b) // seeded quantizer ⇒ repeatable
    assert(a.map(_._1).distinct.size == a.size) // one row per query
    assert(a.nonEmpty)
  }
}
