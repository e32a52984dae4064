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

  // The declared rows-only set: queries whose semantics are NOT oracle-
  // expressible (MLlib KMeans) and are instead pinned by ScalaTest floors
  // (AnnRecallSpec). Anything else missing an oracle is a query that
  // would silently ship value-unchecked — fail structurally, not in
  // round-review archaeology.
  test("every registered query carries oracleSql except the declared rows-only set") {
    // empty since r13: q60 now routes IVF search through the
    // Lloyd-trained quantizer and is DuckDB-oracled like everything else
    val declaredRowsOnly = Set.empty[String]
    val unoracled = graft.queries.AllQueries.specs
      .filter(_.oracle.isEmpty).map(_.name).toSet
    assert(unoracled == declaredRowsOnly,
      s"undeclared oracle-less queries: ${(unoracled -- declaredRowsOnly).toSeq.sorted.mkString(", ")}" +
        s"; stale declarations: ${(declaredRowsOnly -- unoracled).toSeq.sorted.mkString(", ")}")
  }

  // q12 legitimately returns 0 rows at sf0.001 (every customer has orders);
  // q208's delta-probe pair set is empty at the 50-doc sf0.001 (no
  // cross-delta phash pair within Hamming 8 — 1 pair at sf0.01, 77 at
  // sf0.1, both oracle-verified)
  private val mayBeEmpty = Set("q12_join_anti", "q208_incr_phash")

  for (spec <- graft.queries.AllQueries.specs) {
    test(s"${spec.name} runs at sf0.001") {
      val df = spec.fn(spark, sf001)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(spec.name)) assert(n > 0, s"${spec.name} returned no rows")
    }
  }
}
