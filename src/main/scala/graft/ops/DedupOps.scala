package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication primitives for the LLM-data-pipeline extensions
  * (SURVEY.md §2.14 E1/E2): exact dedup, a deterministic portable MinHash
  * (md5-based, so the DuckDB oracle can replay it bit-for-bit), and the
  * band-bucket candidate-pair join that makes near-dup detection scale —
  * candidates come from an equi-join on (band, signature), never from an
  * O(n²) cross join.
  */
object DedupOps {

  /** Exact dedup keeping the smallest id per identical key column.
    * Deterministic alternative to `dropDuplicates` (which keeps an
    * arbitrary row). One shuffle on the dedup key.
    */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(keyCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures from distinct (doc_id, s) shingle rows. The
    * `bands` hash functions are the disjoint 8-hex-char slices of ONE
    * md5(s) per shingle — md5 is computed once, each slice is an
    * independent 32-bit min-hash, and hex substrings compare
    * lexicographically the same way in Spark and DuckDB, so the whole
    * construction is oracle-portable. One hash-agg shuffle keyed doc_id
    * with `bands` partial-min aggregates (map-side combined), then a
    * trivial stack() unpivot of the already-aggregated rows — no row
    * explosion before the shuffle.
    */
  def minhashSignature(shingleRows: DataFrame, bands: Int): DataFrame = {
    require(bands >= 1 && bands <= 4, "md5 yields 32 hex chars = at most 4 8-char bands")
    val h = shingleRows.withColumn("h", md5(col("s")))
    val aggs = (0 until bands).map(b => min(expr(s"substr(h, ${b * 8 + 1}, 8)")).as(s"sig$b"))
    h.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("doc_id",
        s"stack($bands, ${(0 until bands).map(b => s"$b, sig$b").mkString(", ")}) AS (band, sig)")
  }

  /** Candidate near-dup pairs: docs agreeing on any band's signature.
    * Equi-join on (band, sig) — bucket sizes are small for honest hashes,
    * so this survives a 100× scale-up where a cross join would not.
    */
  def candidatePairs(sig: DataFrame): DataFrame = {
    val x = sig.select(col("doc_id").as("a"), col("band"), col("sig"))
    val y = sig.select(col("doc_id").as("b"), col("band"), col("sig"))
    x.join(y, Seq("band", "sig"))
      .where(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** 64-bit SimHash over (doc_id, term, tf) rows — the production-scale
    * variant of q35's portable 16-bit sketch. Bit j of the sketch is the
    * sign of Σ tf·(2·bit_j(xxhash64(term)) − 1); all 64 bit-weights are
    * parallel aggregate expressions in ONE groupBy (no explosion), fully
    * codegen'd. Near-dups are then `hamming() <= k` on a 64-bit long.
    */
  def simhash64(termFreq: DataFrame): DataFrame = {
    val h = termFreq.withColumn("h64", xxhash64(col("term")))
    val wj = (0 until 64).map { j =>
      sum(col("tf") * (shiftright(col("h64"), j).bitwiseAND(lit(1L)) * 2 - 1)).as(s"w$j")
    }
    h.groupBy("doc_id")
      .agg(wj.head, wj.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j => when(col(s"w$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash64"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity for already-bounded candidate pairs: joins
    * each pair back to its two shingle sets. Work is O(candidates ×
    * shingles-per-doc), not O(n²).
    */
  def jaccardForPairs(cand: DataFrame, shingleRows: DataFrame): DataFrame = {
    val cnt = shingleRows.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shA = shingleRows.select(col("doc_id").as("a"), col("s"))
    val shB = shingleRows.select(col("doc_id").as("b"), col("s"))
    val inter = cand
      .join(shA, "a")
      .join(shB, Seq("b", "s"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("c"))
    cand
      .join(inter, Seq("a", "b"), "left")
      .join(cnt.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(cnt.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .select(
        col("a"), col("b"),
        coalesce(col("c"), lit(0L)).as("inter_cnt"),
        round(coalesce(col("c"), lit(0L)) * lit(1.0) /
          (col("na") + col("nb") - coalesce(col("c"), lit(0L))), 6).as("jaccard"))
  }
}
