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
}
