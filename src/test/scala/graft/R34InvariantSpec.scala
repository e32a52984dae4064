package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the q324–q326 operational layer: the S-curve's
  * analytic column really is 1-(1-j)^4 and its ends separate (q324), the
  * policy sweep is monotone with corpus-consistent shares (q325), and the
  * closed-form waterfill agrees with an independent ITERATIVE waterfill
  * simulation — a different algorithm, not a replay of the same windows
  * (q326).
  */
class R34InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q324 S-curve: expected column matches the closed form, ends separate, caught never exceeds population") {
    val rows = SparkEntry.queries("q324_lsh_scurve")(spark, sf001)
      .select("bin", "mid_bp", "n_pairs", "n_caught", "recall_bp", "expected_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "no Jaccard bins at sf0.001")
    rows.foreach { case (bin, mid, np, nc, rec, exp) =>
      assert(bin >= 0 && bin <= 9 && mid == bin * 1000 + 500)
      assert(np >= 1 && nc >= 0 && nc <= np, s"bin $bin: caught $nc of $np")
      assert(rec == nc * 10000 / np, s"bin $bin: recall off the bp grid")
      val q = 10000L - mid
      assert(exp == 10000L - q * q * q * q / 1000000000000L,
        s"bin $bin: expected_bp disagrees with 1-(1-j)^4")
    }
    // the curve's ends: near-identical pairs are all caught (the index's
    // reason to exist), and if a low-similarity bin exists it must NOT
    // show full recall — otherwise the "curve" is a constant and the
    // calibration table is vacuous
    val top = rows.filter(_._1 >= 8)
    assert(top.nonEmpty, "no high-similarity bin — the corpus twins vanished")
    top.foreach { r => assert(r._5 == 10000L, s"bin ${r._1}: high-sim recall ${r._5} < 10000") }
    rows.filter(_._1 <= 1).foreach { r =>
      assert(r._5 < 10000L, s"bin ${r._1}: low-sim bin at full recall — S-curve is flat")
    }
  }

  test("q325 policy sweep: drops are monotone non-increasing in the threshold and shares match the corpus totals") {
    val rows = SparkEntry.queries("q325_dedup_policy_sweep")(spark, sf001)
      .select("t_bp", "docs_dropped", "tokens_dropped", "docs_drop_bp", "tokens_drop_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 9, "the 9-point threshold grid lost rows")
    assert(rows.map(_._1).toSeq == Seq(5000L, 6000L, 7000L, 8000L, 8500L, 9000L, 9500L, 9900L, 10000L))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3,
        s"drops increased with the threshold: T=${lo._1} -> T=${hi._1}")
    }
    rows.foreach { case (t, dd, td, _, _) =>
      assert((dd == 0) == (td == 0), s"T=$t: docs/tokens dropped disagree on emptiness")
    }
    // the bp shares must be computed against the WHOLE corpus, not the
    // candidate subset — recompute the denominators independently
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(size(split(lower(col("text")), " ")).cast("long").as("ntok"))
      .as[Long].collect()
    val (nDocs, nTokens) = (docs.length.toLong, docs.sum)
    rows.foreach { case (t, dd, td, dbp, tbp) =>
      assert(dbp == dd * 10000 / nDocs && tbp == td * 10000 / nTokens,
        s"T=$t: bp shares do not match the independent corpus totals")
    }
    // the sweep must be exercised: some threshold drops documents
    assert(rows.head._2 > 0, "no threshold drops anything — the sweep fixture is dead")
  }

  test("q326 waterfill: closed form agrees with an independent iterative waterfill; conservation and branch liveness hold") {
    val rows = SparkEntry.queries("q326_mixture_waterfill")(spark, sf001)
      .select("lang", "avail", "budget", "capped", "fill_level", "alloc", "rate_micro", "unalloc")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 5, "expected one row per language")
    val budget = rows.head._3
    assert(rows.forall(_._3 == budget) && rows.forall(_._8 == rows.head._8))
    assert(budget == rows.map(_._2).sum * 4 / 5, "budget is not 4/5 of the corpus tokens")
    // conservation: every budgeted token is either allocated or reported
    // as the sub-|langs| integer remainder
    val unalloc = rows.head._8
    assert(rows.map(_._6).sum + unalloc == budget, "allocation does not conserve the budget")
    assert(unalloc >= 0 && unalloc < rows.count(_._4 == 0), "remainder outside [0, n_uncapped)")
    rows.foreach { case (lang, avail, _, capped, level, alloc, rate, _) =>
      assert(alloc == math.min(avail, level), s"$lang: alloc is not min(avail, level)")
      if (capped == 1) assert(alloc == avail && rate == 1000000L, s"$lang: capped but not saturated")
      else assert(alloc == level && avail > level, s"$lang: uncapped but not at the fill level")
      assert(rate == alloc * 1000000 / avail, s"$lang: rate off the micro grid")
    }
    // both branches live (the 4/5 budget exists to guarantee this)
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0), "a waterfill branch is dead")
    // independent algorithm: iterate level = remaining/uncapped, cap,
    // repeat to fixpoint — must reproduce the closed form's allocations
    val avails = rows.map(r => r._1 -> r._2).toMap
    var capped = Set.empty[String]
    var level = 0L
    var changed = true
    while (changed) {
      val un = avails.keySet -- capped
      level = (budget - capped.toSeq.map(avails).sum) / un.size
      val newly = un.filter(l => avails(l) <= level)
      changed = newly.nonEmpty
      capped ++= newly
    }
    rows.foreach { case (lang, avail, _, c, lvl, alloc, _, _) =>
      val simAlloc = if (capped(lang)) avail else level
      assert(alloc == simAlloc && lvl == level && (c == 1) == capped(lang),
        s"$lang: closed form (alloc=$alloc, level=$lvl) disagrees with the iterative waterfill (alloc=$simAlloc, level=$level)")
    }
  }
}
