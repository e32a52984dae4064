package graft

/** Semantic invariants of the round-8 operations widening (q347–q350):
  * the salting direction and load-conservation algebra of the skew
  * planner, retention monotonicity, the advisor's schema-implied
  * verdicts, and the compaction plan's conservation + contiguity
  * contracts (the properties start-fit packing exists to provide).
  */
class R39InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q347 low-cardinality keys skew, salting helps, loads conserve") {
    val rows = run("q347_shuffle_skew")
      .select("variant", "n_keys", "parts_used", "max_load", "min_load", "skew_bp")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 4)
    val byV = rows.map(r => r._1 -> r).toMap
    val flag = byV("l_returnflag")
    val salted = byV("l_returnflag_salt16")
    // 3 keys can use at most 3 partitions; the planner must show it
    assert(flag._2 == 3 && flag._3 == 3, s"flag variant should occupy 3 partitions: $flag")
    // salting multiplies keys and must strictly improve occupancy + skew
    assert(salted._2 == 48 || salted._2 <= 48, s"salt16 key count wrong: $salted")
    assert(salted._3 > flag._3, s"salting did not spread partitions: $salted vs $flag")
    assert(salted._6 < flag._6, s"salting did not reduce skew: $salted vs $flag")
    rows.foreach { r =>
      assert(r._4 >= r._5 && r._3 <= 32, s"load bounds broken: $r")
      // pigeonhole: max_load >= n_rows/32, so skew can never sit under par
      assert(r._6 >= 10000, s"max load cannot be below the uniform level: $r")
    }
  }

  test("q348 retention pricing is monotone and bounded") {
    val rows = run("q348_retention_pricing")
      .select("cutoff_d", "rows_dropped", "bytes_dropped", "bytes_share_bp")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 5)
    rows.foreach(r => assert(r._4 >= 0 && r._4 <= 10000, s"share out of range: $r"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3,
        s"longer retention must drop no more than shorter: $a -> $b")
    }
  }

  test("q349 verdicts follow the schema: tiny sets materialize, near-keys do not") {
    val rows = run("q349_rollup_advisor")
      .select("set_name", "n_groups", "base_rows", "reduction_bp", "materialize")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 6)
    val byS = rows.map(r => r._1 -> r).toMap
    assert(byS("returnflag x linestatus")._2 == 6, "flag x status must have 6 groups")
    assert(byS("returnflag x linestatus")._5 == 1, "6-group rollup must materialize")
    assert(byS("orderkey")._5 == 0, "a near-key dimension must not materialize")
    rows.foreach { r =>
      assert(r._2 <= r._3, s"groups exceed rows: $r")
      assert((r._5 == 1) == (r._4 <= 500), s"verdict inconsistent with threshold: $r")
    }
  }

  test("q350 compaction conserves bytes/days and keeps day ranges contiguous") {
    val rows = run("q350_compaction_plan")
      .select("bin", "n_days", "day_lo", "day_hi", "bin_bytes", "fill_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // conservation: the plan covers every day and every byte exactly once
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val dayBytes = li.groupBy(org.apache.spark.sql.functions.expr(
        "unix_timestamp(l_shipdate) div 86400").as("dk"))
      .agg(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.expr(
        "8 + 8 + 8 + 4 + 8 + 8 + 8 + 8 + length(l_returnflag) + length(l_linestatus) + 8"))
        .as("b"))
    val (nDays, totBytes) = dayBytes
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("b"))
      .as[(Long, Long)].collect().head
    assert(rows.map(_._2).sum == nDays, "day count not conserved")
    assert(rows.map(_._5).sum == totBytes, "bytes not conserved")
    // contiguity: bins tile the calendar in order (pruning survives)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 > a._4, s"bin day ranges overlap or disorder: $a -> $b")
    }
    // start-fit bound: a bin overfills by at most one day's bytes, and
    // every bin except possibly the last is at least target-full minus
    // one day — weaker, SF-safe form: fill is positive and bounded 3x
    rows.foreach(r => assert(r._6 > 0 && r._6 < 30000, s"fill out of band: $r"))
  }
}
