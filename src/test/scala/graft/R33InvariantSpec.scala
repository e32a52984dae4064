package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the round-8 queries: the BPE encoding really
  * sits between word- and char-level (q319), the planted run-length
  * fixtures separate where jaccard overlaps (q321), and the quantifier
  * is live with conserved lags (q322). q320's recall floors live in
  * AnnRecallSpec with the other approximation-quality gates.
  */
class R33InvariantSpec extends SparkSpecBase {
  import spark.implicits._

  test("q319 fertility: encoding is strictly between word-level and char-level per language") {
    val rows = SparkEntry.queries("q319_bpe_fertility")(spark, sf001)
      .select("lang", "n_words", "n_tokens", "n_chars", "fertility_micro")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set("de", "en", "es", "fr", "zh"))
    rows.foreach { case (lang, words, tokens, chars, fert) =>
      // every word is >= 1 token; merges actually fired, so the token
      // stream is strictly shorter than the character stream
      assert(tokens >= words, s"$lang: $tokens tokens < $words words")
      assert(tokens < chars, s"$lang: merges never applied ($tokens tokens vs $chars chars)")
      assert(fert == tokens * 1000000L / words, s"$lang: fertility off-grid")
    }
  }

  test("q321 shared runs: quote legs are fully contained with run = whole excerpt; long permuted legs cap at the block interior") {
    val df = SparkEntry.queries("q321_shared_runs")(spark, sf001).cache()
    try {
      assert(df.count() > 0, "run fixture is dead at sf0.001")
      // quote leg vs its own source: the excerpt's shingles are a subset
      // (containment exactly 1) and consecutive (max_run = its whole set)
      val quoteSrc = df.where(col("kind") === "quote" && col("b") === -col("a") - 3000000L)
      assert(quoteSrc.count() > 0, "no quote leg recovered its source")
      assert(quoteSrc.where(col("cont_bp") =!= 10000L).count() == 0,
        "a quote excerpt is not fully contained in its source")
      assert(quoteSrc.where(col("max_run") =!= col("na")).count() == 0,
        "a quote excerpt's shared run does not span the whole excerpt")
      // permuted leg vs its own source, docs long enough to really be
      // permuted (>= 3 blocks, i.e. >= 21 shingles): a 12-token block
      // holds 8 interior 5-gram shingles; the synthetic ~30-word
      // vocabulary lets a boundary token coincide and stretch a run by
      // a step or two (9 observed), but nothing approaching a block —
      // while the shingle SET largely survives, the exact signal
      // set-based jaccard cannot see
      val permSrc = df.where(col("kind") === "permuted" &&
        col("b") === -col("a") - 2000000L && col("nb") >= 21)
      assert(permSrc.count() > 0, "no long permuted leg recovered its source")
      assert(permSrc.where(col("max_run") > 11).count() == 0,
        "a block-permuted doc shows a run far longer than a block interior")
      assert(permSrc.where(col("jacc_bp") < 1000).count() == 0,
        "permuted legs lost their set similarity — the contrast fixture is broken")
      // the headline contrast: with max_run == na pinned above, every
      // quote longer than a block (na >= 12) beats every long permuted
      // run (<= 11) — run length separates the classes even where their
      // jaccard ranges overlap; require such a quote to exist so the
      // contrast is exercised, not vacuous
      assert(quoteSrc.where(col("na") >= 12).count() > 0,
        "no quote excerpt longer than a block — the run-length contrast is untested")
    } finally df.unpersist()
  }

  test("q322 quantified CEP: lags within deadlines, span conserved, multi-click runs exist") {
    val df = SparkEntry.queries("q322_cep_quantified")(spark, sf001).cache()
    try {
      assert(df.count() > 0, "quantified-pattern fixture is dead at sf0.001")
      assert(df.where(col("first_click_lag_s") <= 0 ||
        col("first_click_lag_s") > 43200).count() == 0)
      assert(df.where(col("purchase_lag_s") <= 0 ||
        col("purchase_lag_s") > 86400).count() == 0)
      assert(df.where(col("run_span_s") < 0).count() == 0)
      assert(df.where(col("span_s") =!= col("first_click_lag_s") +
        col("run_span_s") + col("purchase_lag_s")).count() == 0)
      assert(df.where(col("click_run_len") < 1 || col("n_matches") < 1).count() == 0)
      // the quantifier is live: at least one matched run has > 1 click
      // (else the query degenerates to q317's single-C shape)
      assert(df.where(col("click_run_len") >= 2).count() > 0,
        "no multi-click run matched — the C+ quantifier is decorative")
      // run consistency: a run of one click has zero span
      assert(df.where(col("click_run_len") === 1 && col("run_span_s") =!= 0).count() == 0)
      assert(df.where(col("click_run_len") >= 2 && col("run_span_s") === 0).count() == 0)
    } finally df.unpersist()
  }

  test("q323 audit: canonical order + grid invariants, and the top pairs' max_run equals the brute-force longest common token substring") {
    val rows = SparkEntry.queries("q323_dup_run_audit")(spark, sf001)
      .select("a", "b", "max_run", "run_tokens", "n_runs3", "jacc_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "audit is empty at sf0.001 — the corpus's near-dup twins should surface")
    assert(rows.length <= 20)
    rows.foreach { case (a, b, mr, rt, n3, jb) =>
      assert(a < b, s"pair ($a,$b) not canonically ordered")
      assert(mr >= 1 && rt == mr + 4, s"($a,$b): run_tokens off the max_run+4 grid")
      assert(n3 >= 0 && jb >= 0 && jb <= 10000, s"($a,$b): jacc_bp/n_runs3 out of range")
    }
    assert(rows.sortBy { case (a, b, mr, _, _, _) => (-mr, a, b) }.toSeq == rows.toSeq,
      "audit rows are not in (max_run desc, a, b) total order")

    // Ground truth: a maximal shared run of L 5-gram shingles on one
    // diagonal IS a longest common token substring of L+4 tokens (and
    // vice versa for any common substring of >= 5 tokens), so for the
    // top pairs the audit's max_run must equal the O(n*m) DP answer
    // computed directly on the raw texts — no shingles, no index.
    val top = rows.take(3)
    val ids = top.flatMap { case (a, b, _, _, _, _) => Seq(a, b) }.toSet
    val texts = spark.read.parquet(s"$sf001/documents.parquet")
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def lcsTokens(x: Array[String], y: Array[String]): Int = {
      var best = 0
      var prev = new Array[Int](y.length + 1)
      var cur = new Array[Int](y.length + 1)
      var i = 0
      while (i < x.length) {
        var j = 0
        while (j < y.length) {
          cur(j + 1) = if (x(i) == y(j)) prev(j) + 1 else 0
          if (cur(j + 1) > best) best = cur(j + 1)
          j += 1
        }
        val t = prev; prev = cur; cur = t
        i += 1
      }
      best
    }
    top.foreach { case (a, b, mr, _, _, _) =>
      val got = lcsTokens(
        texts(a).toLowerCase.split(" ", -1),
        texts(b).toLowerCase.split(" ", -1))
      assert(got == mr + 4,
        s"($a,$b): audit max_run $mr (=${mr + 4} tokens) disagrees with brute-force LCS $got")
    }
  }
}
