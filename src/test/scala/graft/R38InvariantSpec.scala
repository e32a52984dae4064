package graft

/** Semantic invariants of the round-8 physical-design/statistics layer
  * (q341–q346): the FD verdicts the TPC-H schema guarantees, the z-order
  * tradeoff's direction and file-cover completeness, histogram q-error
  * floors and the disjoint-cover identity, the dictionary spectrum's two
  * ends, the bloom filter's no-false-negative conservation, and the join
  * planner's cost-model consistency.
  */
class R38InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q341 verdicts match the schema: keys hold, multi-line orders violate") {
    val rows = run("q341_fd_profile")
      .select("fd", "n_rows", "n_det", "n_viol_det", "fd_holds", "det_is_key")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 8)
    val byFd = rows.map(r => r._1 -> r).toMap
    // primary keys determine everything and profile as keys
    for (fd <- Seq("orders: o_orderkey -> o_custkey",
        "customer: c_custkey -> c_mktsegment")) {
      val r = byFd(fd)
      assert(r._5 == 1 && r._6 == 1 && r._4 == 0, s"key FD not clean: $r")
      assert(r._2 == r._3, s"key determinant NDV != rows: $r")
    }
    // a real non-key FD: nation -> region holds without being a row key
    val nat = byFd("nation: n_nationkey -> n_regionkey")
    assert(nat._5 == 1, s"nation FD should hold: $nat")
    // multi-line orders carry mixed return flags: the FD must be violated
    val lrf = byFd("lineitem: l_orderkey -> l_returnflag")
    assert(lrf._5 == 0 && lrf._4 > 0, s"l_orderkey -> l_returnflag should fail: $lrf")
    // violating determinants can never exceed determinants
    rows.foreach(r => assert(r._4 <= r._3, s"viol > det: $r"))
  }

  test("q342 z-layout prunes the secondary key, pays on the primary, covers all files") {
    val rows = run("q342_zorder_pricing")
      .select("pred_key", "files_lex", "files_z", "rows_lex", "rows_z", "rows_exact")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 16)
    val (pkP, skP) = rows.partition(_._1 == "l_partkey")
    // lex layout cannot prune the unsorted key: every suppkey predicate
    // scans all 32 files; z must beat it on every one
    skP.foreach { r =>
      assert(r._2 >= 30, s"lex should scan ~all files for suppkey: $r")
      assert(r._3 < r._2, s"z-layout failed to prune suppkey: $r")
      assert(r._5 < r._4, s"z scanned no fewer rows than lex on suppkey: $r")
    }
    // on the lex-sorted key, lex is at least as good as z (the tradeoff)
    pkP.foreach(r => assert(r._2 <= r._3, s"z beat lex on the lex key: $r"))
    // scanned rows always bound the exact rows (min/max skipping is safe)
    rows.foreach { r =>
      assert(r._4 >= r._6 && r._5 >= r._6, s"pruning dropped matching rows: $r")
    }
    // the 8 predicates per key tile the key range: union of exact == table
    val total = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(pkP.map(_._6).sum == total, "partkey predicate tiling incomplete")
    assert(skP.map(_._6).sum == total, "suppkey predicate tiling incomplete")
  }

  test("q343 q-error floors at 1, wide predicates tile the domain exactly") {
    val rows = run("q343_hist_selectivity")
      .select("pred_id", "est_rows", "act_rows", "qerr_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r._4 >= 10000, s"q-error below 1: $r")
      assert(r._3 > 0, s"degenerate predicate (no rows): $r")
    }
    // the six sextile predicates partition [vmin, vmax]: actuals sum to n
    val orders = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(rows.filter(_._1 <= 5).map(_._3).sum == orders, "sextile tiling incomplete")
  }

  test("q344 dictionary wins on flags, loses on unique names") {
    val rows = run("q344_encoding_pricing")
      .select("col_name", "ndv", "n_rows", "idx_bits", "dict_bytes", "plain_bytes", "ratio_bp")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 10)
    val byCol = rows.map(r => r._1 -> r).toMap
    // 2-value flag: 1 bit/row → ratio far under parity
    val ls = byCol("lineitem.l_linestatus")
    assert(ls._2 == 2 && ls._4 == 1 && ls._7 < 2000, s"flag column should pack 5x+: $ls")
    // every-value-distinct column: the dictionary must COST bytes
    val cn = byCol("customer.c_name")
    assert(cn._2 == cn._3 && cn._7 > 10000, s"unique column should lose: $cn")
    // bit width is exactly ceil(log2(ndv)) for every row
    rows.foreach { r =>
      val bits = if (r._2 == 1) 1L else 64 - java.lang.Long.numberOfLeadingZeros(r._2 - 1)
      assert(r._4 == bits, s"idx_bits mismatch: $r expected $bits")
    }
  }

  test("q345 bloom conserves rows and never false-negatives") {
    val r = run("q345_bloom_calibration")
      .select("n_keys", "bits_set", "nonmember_keys", "fp_keys",
        "rows_member", "rows_false_pass", "rows_filtered")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // k=3 hashes on n keys can set at most 3n (and at least 1) bits
    assert(r._2 >= 1 && r._2 <= 3 * r._1, s"bit load out of range: $r")
    assert(r._4 <= r._3, s"more fp keys than nonmembers: $r")
    // conservation: the three row classes partition orders exactly, and
    // every member row passes (blooms have no false negatives)
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val total = orders.count()
    assert(r._5 + r._6 + r._7 == total, s"row classes do not partition orders: $r")
    val memberRows = orders.join(
      spark.read.parquet(s"$sf001/customer.parquet")
        .where($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey".as("o_custkey")),
      Seq("o_custkey")).count()
    assert(r._5 == memberRows, s"member rows miscounted: ${r._5} vs $memberRows")
  }

  test("q346 planner costs are consistent with the chosen strategy") {
    val rows = run("q346_join_planner")
      .select("join_edge", "build_bytes", "probe_bytes", "bcast_cost",
        "shuffle_cost", "strategy", "saved_bytes")
      .as[(String, Long, Long, Long, Long, String, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r._4 == r._2 * 32 && r._5 == r._2 + r._3, s"cost algebra broken: $r")
      if (r._6 == "broadcast")
        assert(r._2 <= 10485760 && r._4 < r._5 && r._7 == r._5 - r._4,
          s"broadcast chosen but costs disagree: $r")
      else assert(r._7 == 0, s"shuffle chosen but saved_bytes nonzero: $r")
    }
    // the model must flip somewhere on this schema: tiny dims broadcast,
    // fact-sized builds shuffle
    assert(rows.exists(_._6 == "broadcast") && rows.exists(_._6 == "shuffle"),
      s"degenerate strategy column: ${rows.map(r => r._1 -> r._6).toSeq}")
  }
}
