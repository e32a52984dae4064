package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{GenPartition, GenScan}

/** The DataSource V2 generator table (sources.GenSource): correctness of
  * the generated rows plus the two scale-critical planning behaviors —
  * id-range filter pushdown shrinking the PLANNED partitions (not just
  * the scanned rows) and column pruning reaching the reader schema.
  */
class GenSourceSpec extends SparkSpecBase {

  private def gen(rows: Long, parts: Int = 8) =
    spark.read.format("graftgen")
      .option("rows", rows).option("parts", parts).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): GenScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[GenScan]
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("generates the arithmetic row formula") {
    val rows = gen(10, parts = 3).orderBy("id").collect()
    assert(rows.length == 10)
    val r7 = rows(7)
    assert(r7.getLong(0) == 7L)
    assert(r7.getLong(1) == 7L % 97)
    assert(r7.getDouble(2) == ((7L * 37) % 1000) / 10.0)
    assert(r7.getString(3) == "g" + (7 % 5))
  }

  test("row count is exact across partition splits") {
    // rows not divisible by parts: slice arithmetic must neither drop
    // nor duplicate boundary ids
    assert(gen(1001, parts = 7).count() == 1001L)
    assert(gen(5, parts = 8).count() == 5L) // more parts than rows
  }

  test("id range predicates prune planned partitions") {
    val df = gen(100000, parts = 8).where(col("id") >= 96000)
    val scan = scanOf(df)
    // [96000, 100000) of 100k rows → the scan plans over 4k rows, so the
    // 8-way split covers ONLY that residual range
    val parts = scan.planInputPartitions().map(_.asInstanceOf[GenPartition])
    assert(parts.map(p => p.end - p.start).sum == 4000L,
      s"partitions cover ${parts.mkString(",")} — pushdown didn't narrow the range")
    assert(parts.forall(_.start >= 96000L))
    assert(df.count() == 4000L)
  }

  test("an empty pushed range plans zero partitions") {
    val df = gen(1000).where(col("id") === 5000L)
    assert(scanOf(df).planInputPartitions().isEmpty)
    assert(df.count() == 0L)
  }

  test("non-id predicates stay residual and still filter correctly") {
    val df = gen(1000).where(col("tag") === "g3")
    // tag isn't pushable: the scan still covers all 1000 ids...
    val parts = scanOf(df).planInputPartitions().map(_.asInstanceOf[GenPartition])
    assert(parts.map(p => p.end - p.start).sum == 1000L)
    // ...and Spark's post-scan Filter applies the residual
    assert(df.count() == 200L)
  }

  test("column pruning reaches the reader schema") {
    val df = gen(100).select("bucket", "tag")
    assert(scanOf(df).readSchema().fieldNames.toSeq == Seq("bucket", "tag"))
  }
}
