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
    * arbitrary row). One shuffle — ON md5 OF THE KEY, not the key
    * itself: for document dedup the key IS the document, so grouping on
    * the raw column would make every shuffle row carry kilobytes of
    * text where the 16-byte digest groups identically (the q195/q245
    * house convention). The raw key is deliberately NOT re-emitted
    * (that would put the text right back in the aggregation buffer);
    * callers needing it join back on keep_id — the survivor row carries
    * the key. Output: (key_md5, keep_id, n_copies).
    */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(keyCol).cast("string")).as("key_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct shingle SETS as array columns: (doc_id, shs).
    * The within-doc distinct is array_distinct — pure map-side, so the
    * 100×-data version of this never shuffles a shingle row.
    *
    * Tokens are materialized in their OWN projection first: higher-order
    * functions are CodegenFallback (interpreted), where every element_at
    * in the shingle lambda would otherwise re-evaluate the whole
    * split(lower(text)) subtree — O(tokens²) tokenization per doc.
    *
    * MEMORY CONTRACT: one row holds a doc's ENTIRE distinct-shingle array
    * (≈ tokens × avg-shingle-bytes in one Tungsten row — a 10k-token web
    * page is ~0.5 MB; a 10M-token book would be ~0.5 GB and does NOT fit
    * this shape). The operators downstream (jaccardForPairs'
    * array_intersect, minhashSignature's array_min) share the bound:
    * this path assumes web-document-sized inputs (≲ 10⁵ tokens/doc).
    * Corpora with larger documents should shard texts into fixed-token
    * chunks first (the q134 paragraph-split pattern) or stay on the
    * row-shaped [[shingleRows]] pipeline end-to-end, which never
    * materializes a per-doc aggregate.
    */
  def shingleSets(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("doc_id"),
        array_distinct(TextOps.wordShingles(col("tk"), n)).as("shs"))

  /** Distinct (doc_id, shingle) ROWS — the codegen scale path the
    * registered dedup queries run on. The array-lambda form above runs
    * interpreted (higher-order functions are CodegenFallback) and
    * dominated the whole dedup family's runtime; this build is
    * posexplode + one keyed window of `lead`s + concat, every operator
    * whole-stage-codegen or WindowExec. Costs one shuffle of the token
    * stream (by doc) + one distinct — the right trade at scale, since
    * shingle construction is per-token CPU either way and rows feed the
    * signature/Jaccard joins directly. Docs shorter than n tokens yield
    * no rows (same "never a candidate" outcome as an empty set).
    */
  def shingleRows(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until n).map(k => lead("tok", k).over(w).as(s"t$k"))
    docs.select(col("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id") +: col("tok").as("t0") +: leads: _*)
      .where(col(s"t${n - 1}").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(k => col(s"t$k")): _*).as("s"))
      .distinct()
  }

  /** Prefix-filtered candidate pairs for an EXACT Jaccard similarity
    * self-join at threshold `t` (the PPJoin/AllPairs prefix principle):
    * order every doc's shingles by a global rarity order (ascending
    * document frequency, shingle string as tiebreak), keep only the
    * first |S| - ceil(t*|S|) + 1 of each doc — if J(A,B) >= t the two
    * prefixes must share a shingle — and equi-join docs on prefix
    * shingles. Complementary to MinHash banding (candidatePairs): that
    * path is probabilistic (can miss pairs), this one is COMPLETE — with
    * exact verification downstream the join result equals the all-pairs
    * answer, while only prefix rows (the rarest ~(1-t) fraction of each
    * set) ever shuffle, and bucket sizes stay small because prefixes are
    * by construction the rare shingles. No global rank is computed: the
    * (df, shingle) pair itself is the total order, so there is no
    * single-partition window anywhere in the plan.
    *
    * MEMORY CONTRACT: the prefix build buffers ONE sorted array of all
    * (df, shingle) structs per doc inside collect_list — the same
    * per-doc bound as [[shingleSets]]: fine for web-page-sized docs
    * (a 10k-token doc buffers ~0.5 MB per aggregate state), unbounded
    * for 10M-token documents. Callers with book-length texts must chunk
    * upstream (q134's paragraph split) before the self-join; only the
    * prefix slice (the rarest ~(1−t) fraction) survives the explode, so
    * the SHUFFLE after this aggregate is already bounded — the contract
    * is about single-row aggregation-buffer memory, not network.
    */
  def prefixFilterCandidates(shRows: DataFrame, t: Double): DataFrame = {
    require(t > 0 && t < 1, "threshold must be in (0, 1)")
    val freq = shRows.groupBy("s").agg(count(lit(1)).as("df"))
    val pref = shRows.join(freq, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("sorted"),
        count(lit(1)).as("sz"))
      .withColumn("plen",
        (col("sz") - ceil(col("sz") * lit(t)) + lit(1)).cast("int"))
      .select(col("doc_id"),
        explode(expr("transform(slice(sorted, 1, plen), x -> x.s)")).as("s"))
    pref.select(col("doc_id").as("a"), col("s"))
      .join(pref.select(col("doc_id").as("b"), col("s")), Seq("s"))
      .where(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** MinHash signatures from (doc_id, shs) shingle-set rows. The `bands`
    * hash functions are the disjoint 8-hex-char slices of ONE md5 per
    * shingle — each slice an independent 32-bit min-hash, and hex
    * substrings compare lexicographically the same way in Spark and
    * DuckDB, so the construction is oracle-portable. Everything is
    * array_min over a transformed array: ZERO shuffles — signatures are
    * computed in the scan stage, and only the tiny (doc × band) rows
    * move afterwards. Docs too short to shingle yield null sigs, which
    * never match in the candidate join.
    */
  def minhashSignature(shSets: DataFrame, bands: Int): DataFrame =
    minhashSignatureRows(
      shSets.select(col("doc_id"), explode(col("shs")).as("s")), bands)

  /** MinHash signatures from (doc_id, s) shingle ROWS: codegen'd md5 +
    * map-side per-band min-agg — the shuffle carries only `bands` short
    * strings per doc.
    */
  def minhashSignatureRows(shRows: DataFrame, bands: Int): DataFrame = {
    require(bands >= 1 && bands <= 4, "md5 yields 32 hex chars = at most 4 8-char bands")
    val mins = (0 until bands).map { b =>
      min(substring(col("h"), b * 8 + 1, 8)).as(s"sig$b")
    }
    shRows
      .select(col("doc_id"), md5(col("s")).as("h"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
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

  /** Connected components over an undirected edge list (a, b) by
    * iterative min-label propagation: every node starts labeled with its
    * own id; each round every node takes the min of its own and its
    * neighbors' labels, then follows its label one more hop (pointer
    * jumping), until a round changes nothing. The shortcut makes
    * convergence O(log diameter) rounds — near-dup graphs are dense
    * clusters that finish in 2-3 rounds, and even a chain-of-20 corpus
    * pathology stays within the default iteration budget. Each round is
    * two shuffle-keyed joins + a min-agg (the "small-star + shortcut"
    * shape of the large/small-star CC algorithm), so it scales out;
    * nothing ever collects to the driver but the 1-row convergence check.
    *
    * Returns (id, cluster) where cluster = min node id in the component —
    * deterministic, and exactly what a dedup pipeline keys "canonical
    * document" on.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .cache()
    // Init already folds one propagation round in: label₀ = min(self,
    // direct neighbors). Every node appears as src (sym is symmetric),
    // so this is also the node list.
    //
    // Each round is localCheckpoint'ed, NOT cache()'d: the round's plan
    // references `labels` twice (carry + propagate), so with cache the
    // LOGICAL plan doubles per round — 2^diameter nodes by convergence,
    // which OOMs the driver on a diameter-20 path graph even though the
    // data is tiny (caching dedups execution, not the plan). Truncating
    // lineage to the materialized RDD keeps every round's plan constant-
    // size; the convergence count is the action that materializes it.
    var labels = sym.groupBy("src")
      .agg(min(least(col("src"), col("dst"))).as("lab"))
      .select(col("src").as("id"), col("lab"))
      .localCheckpoint(false)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), labels("lab"),
          lit(null).cast(labels.schema("lab").dataType).as("old"))
      // One aggregation yields BOTH the new labels and (via the carried
      // `old` self-label — max ignores the prop rows' nulls) the
      // convergence count, so each round is a single short job instead of
      // agg + a second compare join.
      val stepped = labels.select(col("id"), col("lab"), col("lab").as("old"))
        .unionByName(prop)
        .groupBy("id").agg(min("lab").as("lab"), max("old").as("old"))
      // Pointer-jumping shortcut (label ← label-of-label): neighbor
      // propagation alone moves one hop per round, so convergence is
      // O(diameter) — a chain-shaped component needs as many shuffles as
      // its length. Following each label to ITS label roughly doubles the
      // reach per round, giving O(log diameter) rounds total; every lab
      // is itself a node id, so this is one more keyed equi-join. Round 1
      // skips it: the init already folded a propagation round, so dense
      // near-dup clusters (the common case) are final here and the
      // shortcut would be a pure-overhead join on an already-converged
      // labeling — chains still double from round 2 on.
      val jumped =
        if (iter == 0) stepped
        else {
          val jump = stepped.select(col("id").as("jid"), col("lab").as("jlab"))
          stepped.join(jump, stepped("lab") === jump("jid"), "left")
            .select(stepped("id"),
              least(stepped("lab"), coalesce(col("jlab"), stepped("lab"))).as("lab"),
              stepped("old"))
        }
      val next = jumped.localCheckpoint(false)
      changed = next.where(col("lab") < col("old")).count()
      // superseded rounds' checkpoint blocks are unreferenced after this
      // reassignment; the ContextCleaner reclaims them
      labels = next.select("id", "lab")
      iter += 1
    }
    sym.unpersist()
    // A silent non-converged return would emit plausible-but-split
    // clusters; raise instead (maxIters bounds the component diameter).
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents: not converged after $maxIters rounds " +
        "(component diameter exceeds maxIters — raise it)")
    labels.select(col("id"), col("lab").as("cluster"))
  }

  /** Maximal shared consecutive shingle RUNS per candidate pair — the
    * exact-substring signal set-based Jaccard cannot see (a verbatim
    * quote is one long run; a block-shuffled near-copy is many short
    * ones). Inputs are POSITIONAL shingle rows (doc_id, pos, s), pos
    * 1-based and engine-consistent; matched occurrences (pa, pb) on a
    * common DIAGONAL (pa − pb) that are consecutive in pa form a run —
    * the islands idiom (day-minus-row_number) on position deltas.
    * Returns (a, b, max_run, n_runs3). Shared by q321 (planted
    * fixtures), q323 (corpus-wide audit) and ScaleSlopeSpec (measured
    * ×8 exponent), so the registered queries and the scale proof run
    * EXACTLY this plan. Work is bounded by the candidate set times
    * per-pair match fan-out — never corpus².
    */
  def maxSharedRuns(cand: DataFrame, posA: DataFrame, posB: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = cand
      .join(posA.select(col("doc_id").as("a"), col("pos").as("pa"), col("s")), Seq("a"))
      .join(posB.select(col("doc_id").as("b"), col("pos").as("pb"), col("s")), Seq("b", "s"))
    m.select(col("a"), col("b"), (col("pa") - col("pb")).as("diag"), col("pa"))
      .withColumn("g", col("pa") -
        row_number().over(Window.partitionBy("a", "b", "diag").orderBy("pa")))
      .groupBy("a", "b", "diag", "g").agg(count(lit(1)).as("len"))
      .groupBy("a", "b")
      .agg(max("len").as("max_run"),
        sum(when(col("len") >= 3, 1L).otherwise(0L)).as("n_runs3"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity for already-bounded candidate pairs: joins
    * each pair to its two per-doc shingle-set ARRAYS and intersects them
    * with array_intersect — work is O(candidates × shingles-per-doc) with
    * only the tiny candidate table shuffling, never the corpus.
    */
  def jaccardForPairs(cand: DataFrame, shSets: DataFrame): DataFrame =
    cand
      .join(shSets.select(col("doc_id").as("a"), col("shs").as("sa")), "a")
      .join(shSets.select(col("doc_id").as("b"), col("shs").as("sb")), "b")
      // materialize the intersection size ONCE per pair — array_intersect
      // builds a hash set per evaluation, so repeating it inline would
      // triple the dominant cost
      .select(
        col("a"), col("b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter_cnt"),
        (size(col("sa")) + size(col("sb"))).cast("long").as("sz_sum"))
      .select(
        col("a"), col("b"), col("inter_cnt"),
        round(col("inter_cnt") * lit(1.0) /
          (col("sz_sum") - col("inter_cnt")), 6).as("jaccard"))
}
