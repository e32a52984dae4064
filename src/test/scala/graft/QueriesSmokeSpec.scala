package graft

/** Every registered query runs end-to-end at sf0.001 and returns a sane
  * shape (the driver's t1 smoke, locally). Value-level correctness is the
  * DuckDB oracle's job (scripts/check_oracle.py / driver t2).
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // q12 legitimately returns 0 rows at sf0.001 (every customer has orders)
  private val mayBeEmpty = Set("q12_join_anti")

  for (spec <- graft.queries.AllQueries.specs) {
    test(s"${spec.name} runs at sf0.001") {
      val df = spec.fn(spark, sf001)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(spec.name)) assert(n > 0, s"${spec.name} returned no rows")
    }
  }
}
