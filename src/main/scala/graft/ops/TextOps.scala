package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column builders: the deterministic, oracle-checkable
  * re-expressions of the reference's MLlib text transformers
  * (reference: TfIdfCalculator.java:49-94, SpamClassification.java:65-83)
  * plus the shingling primitives the dedup extensions build on.
  *
  * All pure `Column => Column` built-in-function compositions: they stay
  * inside whole-stage codegen and are SQL-portable for the DuckDB oracle.
  */
object TextOps {

  /** Lowercase + whitespace split — semantics of ml.feature.Tokenizer
    * (reference: TfIdfCalculator.java:49-52). Testdata text is
    * single-space separated, so a literal-space split matches DuckDB's
    * string_split exactly.
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Small default stopword set (subset of the published English list used
    * by ml.feature.StopWordsRemover — reference: TfIdfCalculator.java:56-59).
    */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Remove stopwords, preserving duplicates and order (StopWordsRemover
    * semantics — NOT array_except, which dedups).
    */
  def removeStopwords(toks: Column, stop: Seq[String]): Column = {
    val stopArr = array(stop.map(lit): _*)
    filter(toks, t => !array_contains(stopArr, t))
  }

  /** n-word shingles of a token array, e.g. n=3 word trigrams. Guarded so
    * short docs yield an empty array (Spark's `sequence(1,0)` would count
    * DOWN, not produce empty).
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      // one slice+join per shingle: higher-order lambdas run interpreted,
      // so a 2-node lambda body beats the n-element_at concat by ~n×
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Count of tokens that appear in `marker` (duplicates counted — this is
    * an occurrence count, not set intersection).
    */
  def markerHits(toks: Column, marker: Seq[String]): Column = {
    val arr = array(marker.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t))).cast("long")
  }

  /** Polynomial rolling hash (Rabin-Karp shape) of a string:
    * h = Σ h·31 + code(c) (mod 2³¹−1) — the streaming-friendly document
    * fingerprint (vs md5 content hashes in q42). Stays a pure column
    * expression; codes fold left-to-right like the scan would.
    */
  def rollingHash(text: Column, mod: Long = (1L << 31) - 1): Column =
    aggregate(split(text, ""), lit(0L), (h, c) => (h * 31 + ascii(c)) % mod)
}
