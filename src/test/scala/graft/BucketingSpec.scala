package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (the 100 TB pattern): writing both fact
  * tables bucketed by the join key lets the join run with NO exchange on
  * either side — at cluster scale this is the difference between a
  * one-off ETL shuffle and shuffling the fact table on every query.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of tables bucketed on the key plans without a shuffle") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and cannot move per-session
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-BHJ
    s.sql("DROP TABLE IF EXISTS li_b")
    s.sql("DROP TABLE IF EXISTS o_b")
    // the in-memory catalog forgets tables between JVM runs but the
    // warehouse dirs persist → LOCATION_ALREADY_EXISTS; clear them
    for (t <- Seq("li_b", "o_b")) {
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        { val st = java.nio.file.Files.walk(p)
          try st.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally st.close() }
      }
    }

    Tables.load(s, sf001, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.load(s, sf001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_b")

    val joined = s.table("li_b")
      .join(s.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not re-shuffle either bucketed side
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"unexpected exchange under the join:\n$plan")

    val expected = Tables.load(s, sf001, "lineitem")
      .join(Tables.load(s, sf001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)
  }
}
