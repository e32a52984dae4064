package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._

/** Salted aggregation under heavy key skew: a 500k-row set where one key
  * owns 90% of rows — the shape where a direct groupBy funnels into one
  * reducer at cluster scale. Results must equal the direct aggregation
  * exactly (counts) / to rounding (double sums).
  */
class SkewSpec extends SparkSpecBase {

  test("saltedSumCount equals direct aggregation on a 90%-skewed key") {
    val df = spark.range(500000)
      .select(col("id"),
        when(pmod(col("id"), lit(10)) < 9, "hot")
          .otherwise(concat(lit("k"), pmod(col("id"), lit(97))))
          .as("key"),
        (col("id") % 1000).cast("double").as("v"))
    val salted = SkewOps.saltedSumCount(df, Seq("key"), col("id"), "v", 32)
      .select(col("key"), round(col("total"), 4).as("total"), col("cnt"))
    val direct = df.groupBy("key")
      .agg(round(sum("v"), 4).as("total"), count(lit(1)).as("cnt"))
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
    // the hot key really is hot
    assert(direct.where(col("key") === "hot").head().getLong(2) === 450000L)
  }
}
