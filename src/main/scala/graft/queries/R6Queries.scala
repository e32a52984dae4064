package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-4 continuation — the curation/analytics operators a pipeline
  * team reaches for after the retrieval/dedup quality gates of R5Queries:
  * semantic (embedding-space) dedup inside the shared IVF cells (q171),
  * the two classic user-activity analyses (streaks q172, cohort retention
  * q173), and data-layout / embedding-infra ops (Z-order clustering,
  * random-projection dim reduction, content-defined chunking) in the
  * batches that follow. All fully DuckDB-oracled.
  */
object R6Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private val emL2 = ScaleQueries.emL2
  private val dot =
    "round(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1, len(a.embedding))]) / (a.nrm * b.nrm), 6)"

  /** Last-2-char blocked customer-name pairs (blk, ka, kb, na, nb) — the
    * shared record-linkage scaffold of q177 (Jaro-Winkler) and q221
    * (Levenshtein): block on a cheap key so the quadratic comparison
    * runs per block, never corpus×corpus. One scaffold, two metrics —
    * a blocking-key change can't drift between them.
    */
  private[queries] def nameBlockPairs(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        substring(col("c_name"), -2, 2).as("blk"))
    val a = c.select(col("k").as("ka"), col("nm").as("na"), col("blk"))
    val b = c.select(col("k").as("kb"), col("nm").as("nb"), col("blk"))
    a.join(b, Seq("blk")).where(col("ka") < col("kb"))
  }

  /** Oracle CTE prefix mirroring [[nameBlockPairs]]: `p` holds one row
    * per blocked pair with the given pair metric as column `m`.
    */
  private[queries] def nameBlockPairSql(metric: String): String =
    s"""WITH c AS (SELECT c_custkey AS k, c_name AS nm, substr(c_name, length(c_name) - 1, 2) AS blk FROM customer), p AS (SELECT a.blk AS blk, $metric AS m FROM c a JOIN c b ON a.blk = b.blk AND a.k < b.k)"""

  /** Query-term constants and the shared BM25 (k1=1.2, b=0.75) per-term
    * weight columns (doc_id, w1, w2, w3) — the lexical-scoring base of
    * q178 (standalone ranking) and q220 (the RRF lexical leg). The
    * determinism subtleties live HERE once: per-term weights land in
    * fixed COLUMNS (each a sum over the single (doc, term) row), so any
    * downstream score is a fixed-order add, never a group-order float
    * sum; idf's ln() is bit-identical JVM-vs-DuckDB on this domain
    * (verified: Math.log == ln on all idf arguments for N up to 50k).
    * Scale: df and avgdl are broadcast scalars; only rows containing
    * query terms shuffle.
    */
  private[queries] val bm25QueryTerms: Seq[String] = Seq("data", "stream", "vector")

  private[queries] def bm25TermCols(s: SparkSession, d: String): DataFrame = {
    val qts = bm25QueryTerms
    val tf = ScaleQueries.termFreq(s, d)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), avg("dl").as("avgdl"))
    val dfv = tf.where(col("term").isin(qts: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.where(col("term").isin(qts: _*))
      .join(dl, "doc_id").crossJoin(broadcast(stats))
      .join(broadcast(dfv), "term")
      .withColumn("w",
        log(lit(1.0) + (col("nd") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * 2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum(when(col("term") === qts(0), col("w"))).as("w1"),
        sum(when(col("term") === qts(1), col("w"))).as("w2"),
        sum(when(col("term") === qts(2), col("w"))).as("w3"))
  }

  /** Oracle CTE chain mirroring [[bm25TermCols]], ending in
    * `sc(doc_id, w1, w2, w3)`. Compose as `WITH $bm25Cte, ...`.
    */
  private[queries] val bm25Cte: String =
    """tf AS (SELECT doc_id, term, count(*) AS tf FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents) z GROUP BY 1, 2), dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1), st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl), dfv AS (SELECT term, count(*) AS df FROM tf WHERE term IN ('data', 'stream', 'vector') GROUP BY 1), w AS (SELECT t.doc_id, t.term, ln(1.0 + (st.nd - dfv.df + 0.5) / (dfv.df + 0.5)) * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS w FROM tf t JOIN dl ON t.doc_id = dl.doc_id CROSS JOIN st JOIN dfv ON t.term = dfv.term), sc AS (SELECT doc_id, sum(CASE WHEN term = 'data' THEN w END) AS w1, sum(CASE WHEN term = 'stream' THEN w END) AS w2, sum(CASE WHEN term = 'vector' THEN w END) AS w3 FROM w GROUP BY 1)"""

  val specs: Seq[QuerySpec] = Seq(

    // q171 — SEMANTIC dedup (SemDeDup-style): inside each IVF cell of the
    // shared index, a vector is dropped when some LOWER-id vector in the
    // same cell has cosine >= 0.4 (one-pass first-occurrence variant: the
    // killer need not itself survive — the deterministic single-join
    // approximation of the greedy kept-set rule, which would need a
    // sequential scan). This is the embedding-space twin of MinHash
    // near-dup (q34): cluster first so the pairwise check is cell-local,
    // never corpus×corpus. Output: each dropped vector with its earliest
    // same-cell killer and the max within-cell cosine that doomed it.
    // Scale shape: the cell equi-join is the indexed candidate generator,
    // Σ|cell|·(|cell|−1)/2 pairs total — bounded to ≈ n^1.5 ONLY while
    // the quantizer's k tracks √n (AnnOps.sqrtCells; testdata pins k=8
    // for oracle replay, within budget at every shipped SF). That bound
    // is ENFORCED, not assumed: requireSqrtPairBudget (run once per
    // corpus at ivfFlat index access, not per query build) raises with
    // the measured occupancy the moment a constant-k config would go
    // quadratic (n > (4k)² ≈ 1024 vectors/cell at k=8), instead of
    // silently grinding at 100 TB. One groupBy on the dropped id.
    // τ=0.4 sits above the within-cell cosine p99 (~0.32 at sf0.01) so
    // drops are real near-dups, not mass deletion: 19 drops at sf0.01,
    // 235 at sf0.1.
    QuerySpec(
      "q171_semantic_dedup",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        // pair budget enforced at index access (ScaleQueries.ivfFlat)
        val al = ScaleQueries.ivfFlat(s, d)
        val a = al.select(col("vec_id").as("aid"), col("embedding").as("ae"), col("cell"))
        val b = al.select(col("vec_id").as("bid"), col("embedding").as("be"), col("cell"))
        a.join(b, Seq("cell"))
          .where(col("aid") < col("bid"))
          .select(col("bid"), col("cell"), col("aid"),
            round(expr("cosine_sim(ae, be)"), 6).as("cos_r"))
          .where(col("cos_r") >= 0.4)
          .groupBy(col("bid").as("vec_id"))
          .agg(first(col("cell")).as("cell"),
            min(col("aid")).as("dup_of"),
            max(col("cos_r")).as("max_cos"))
          .select(col("vec_id"), col("cell").cast("long").as("cell"),
            col("dup_of"), col("max_cos"))
          .orderBy("vec_id")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, $emL2 AS nrm FROM embeddings), asg AS (SELECT a.vec_id, a.embedding, a.nrm, b.vec_id AS cell, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot DESC, b.vec_id) AS rn FROM e a CROSS JOIN (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 8) b), cells AS (SELECT vec_id, embedding, nrm, cell FROM asg WHERE rn = 1) SELECT b.vec_id AS vec_id, CAST(b.cell AS BIGINT) AS cell, min(a.vec_id) AS dup_of, max($dot) AS max_cos FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id WHERE $dot >= 0.4 GROUP BY 1, 2 ORDER BY vec_id"""),
      "E3/E2 ext: semantic dedup — cell-local cosine near-dups dropped by first occurrence"),

    // q172 — activity STREAKS (gaps-and-islands): per user, maximal runs
    // of consecutive active days via the classic day-minus-row_number
    // island key — the sessionization-by-calendar analysis (DAU streaks,
    // "7-day habit" metrics). The window partitions by user_id (bounded
    // per-user day counts), islands then aggregate map-side; the
    // longest-streak start comes from a join-back on the tiny per-user
    // streak table, not an argmax window.
    QuerySpec(
      "q172_streaks",
      (s, d) => {
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy("user_id").orderBy("day")
        val isl = days.withColumn("g",
          datediff(col("day"), lit("1970-01-01")) - row_number().over(w))
        val st = isl.groupBy("user_id", "g")
          .agg(count(lit(1)).as("len"), min("day").as("start"))
        val mx = st.groupBy("user_id")
          .agg(sum("len").as("n_active_days"), count(lit(1)).as("n_streaks"),
            max("len").as("max_streak"))
        mx.join(st, Seq("user_id"))
          .where(col("len") === col("max_streak"))
          .groupBy("user_id", "n_active_days", "n_streaks", "max_streak")
          .agg(date_format(min("start"), "yyyy-MM-dd").as("max_streak_start"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), isl AS (SELECT user_id, day, CAST(day - DATE '1970-01-01' AS INT) - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g FROM days), st AS (SELECT user_id, g, count(*) AS len, min(day) AS start FROM isl GROUP BY 1, 2), mx AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak FROM st GROUP BY 1) SELECT m.user_id, m.n_active_days, m.n_streaks, m.max_streak, strftime(min(s.start), '%Y-%m-%d') AS max_streak_start FROM mx m JOIN st s ON s.user_id = m.user_id AND s.len = m.max_streak GROUP BY 1, 2, 3, 4 ORDER BY 1"""),
      "§2.5/§2.12 ext: gaps-and-islands — per-user consecutive-day streaks"),

    // q173 — COHORT RETENTION: users grouped by first-activity week, each
    // later active week bucketed by whole weeks since the cohort week —
    // the triangular retention matrix every growth dashboard draws. Week
    // offsets are exact multiples of 7 days (both sides date_trunc to
    // Monday) so the division is exact, no interpolation hazard. Scale
    // shape: distinct user-weeks (one shuffle), the per-user min is a
    // partial agg, the join-back re-uses the user key partitioning.
    QuerySpec(
      "q173_cohort_retention",
      (s, d) => {
        val uw = t(s, d, "events")
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val coh = uw.groupBy("user_id").agg(min("wk").as("cw"))
        uw.join(coh, Seq("user_id"))
          .withColumn("week_offset",
            (datediff(col("wk"), col("cw")) / 7).cast("long"))
          .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk FROM events), coh AS (SELECT user_id, min(wk) AS cw FROM uw GROUP BY 1) SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, CAST((wk - cw) // 7 AS BIGINT) AS week_offset, count(DISTINCT uw.user_id) AS n_users FROM uw JOIN coh ON uw.user_id = coh.user_id GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""),
      "§2.4/§2.12 ext: cohort retention matrix by first-activity week"),

    // q174 — Z-ORDER data layout: quantize (l_partkey, l_suppkey) to 16
    // bits each by min/max scaling, interleave the bits into a Morton
    // z-value, and compare 256-bucket "file" layouts — z-prefix buckets
    // vs partkey-prefix buckets — by the per-bucket min/max SPAN of each
    // key. This is the zone-map math behind multi-dimensional file
    // skipping: a predicate on l_suppkey prunes a z-ordered file set
    // (bounded supp span per file) but scans ALL partkey-sorted files
    // (full-range supp span). All integer arithmetic (exact in both
    // engines); two partial-agg shuffles of 256 groups; bucketing itself
    // is map-side bit math, no global sort needed to MEASURE the layout.
    QuerySpec(
      "q174_zorder_layout",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
        val mm = li.agg(min("p").as("pmn"), max("p").as("pmx"),
          min("sk").as("smn"), max("sk").as("smx"))
        val q = li.crossJoin(broadcast(mm))
          .select(expr("(p - pmn) * 65535 div (pmx - pmn)").as("zp"),
            expr("(sk - smn) * 65535 div (smx - smn)").as("zs"))
        val z = (0 until 16).map { i =>
          shiftleft(shiftright(col("zp"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
            shiftleft(shiftright(col("zs"), i).bitwiseAND(lit(1L)), 2 * i)
        }.reduce(_ + _)
        def spans(df: DataFrame, name: String): DataFrame =
          df.groupBy("bucket")
            .agg((max("zp") - min("zp")).as("sp"), (max("zs") - min("zs")).as("ss"))
            .agg(count(lit(1)).as("n_buckets"), sum("sp").as("sum_span_part"),
              sum("ss").as("sum_span_supp"), max("ss").as("max_span_supp"))
            .select(lit(name).as("layout"), col("n_buckets"), col("sum_span_part"),
              col("sum_span_supp"), col("max_span_supp"))
        spans(q.withColumn("bucket", shiftright(z, 24)), "zorder")
          .unionByName(spans(q.withColumn("bucket", shiftright(col("zp"), 8)), "partkey"))
          .orderBy("layout")
      },
      Some {
        val zExpr = (0 until 16).map { i =>
          s"((zp // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + ((zs // ${1L << i}) % 2) * ${1L << (2 * i)}"
        }.mkString(" + ")
        s"""WITH mm AS (SELECT min(l_partkey) AS pmn, max(l_partkey) AS pmx, min(l_suppkey) AS smn, max(l_suppkey) AS smx FROM lineitem), q AS (SELECT (l_partkey - pmn) * 65535 // (pmx - pmn) AS zp, (l_suppkey - smn) * 65535 // (smx - smn) AS zs FROM lineitem, mm), zb AS (SELECT ($zExpr) // 16777216 AS bucket, zp, zs FROM q), pb AS (SELECT zp // 256 AS bucket, zp, zs FROM q), za AS (SELECT bucket, max(zp) - min(zp) AS sp, max(zs) - min(zs) AS ss FROM zb GROUP BY 1), pa AS (SELECT bucket, max(zp) - min(zp) AS sp, max(zs) - min(zs) AS ss FROM pb GROUP BY 1), u AS (SELECT 'zorder' AS layout, count(*) AS n_buckets, sum(sp) AS sum_span_part, sum(ss) AS sum_span_supp, max(ss) AS max_span_supp FROM za UNION ALL SELECT 'partkey', count(*), sum(sp), sum(ss), max(ss) FROM pa) SELECT layout, CAST(n_buckets AS BIGINT) AS n_buckets, CAST(sum_span_part AS BIGINT) AS sum_span_part, CAST(sum_span_supp AS BIGINT) AS sum_span_supp, CAST(max_span_supp AS BIGINT) AS max_span_supp FROM u ORDER BY layout"""
      },
      "§2.6/§4 ext: Z-order vs single-key layout — zone-map span comparison"),

    // q175 — RANDOM-PROJECTION dimensionality reduction (64 → 16) with a
    // deterministic ±1/√k sign matrix derived from md5 parity of "i_j"
    // (replayable in both engines; balanced: Σ signs = −24/1024). Emits
    // the per-vector norm-preservation ratio — the Johnson-Lindenstrauss
    // check an embedding-compression step monitors (avg ratio ≈ 0.98 on
    // this corpus). Pure map-side column math: the sign matrix is a
    // 1024-literal constant folded into codegen, never a join; both
    // engines fold the i-sum in index order so doubles agree to the ulp.
    QuerySpec(
      "q175_rand_projection",
      (s, d) => {
        val signs: IndexedSeq[IndexedSeq[Double]] = {
          val md = java.security.MessageDigest.getInstance("MD5")
          def hex1(txt: String): Char = {
            val h = md.digest(txt.getBytes("UTF-8"))
            "%02x".format(h(0)).charAt(0)
          }
          (0 until 16).map(j => (0 until 64).map { i =>
            if ("02468ace".contains(hex1(s"${i}_$j"))) 1.0 else -1.0
          })
        }
        val sLit = array(signs.map(r => array(r.map(lit): _*)): _*)
        val e = t(s, d, "embeddings").where(col("vec_id") < 50)
        val proj = transform(sequence(lit(0), lit(15)), j =>
          aggregate(sequence(lit(0), lit(63)), lit(0.0), (acc, i) =>
            acc + element_at(element_at(sLit, j + 1), i + 1) *
              element_at(col("embedding"), i + 1).cast("double")) * 0.25)
        e.select(col("vec_id"), col("embedding"), proj.as("proj"))
          .select(col("vec_id"),
            round(graft.ops.VectorOps.l2norm(col("embedding")), 6).as("orig_norm"),
            round(sqrt(aggregate(col("proj"), lit(0.0), (a, c) => a + c * c)), 6)
              .as("proj_norm"))
          .withColumn("ratio", round(col("proj_norm") / col("orig_norm"), 4))
          .orderBy("vec_id")
      },
      Some(s"""WITH p AS (SELECT vec_id, $emL2 AS orig_norm, [list_sum([CAST(embedding[i] AS DOUBLE) * (CASE WHEN substr(md5(concat(i - 1, '_', j)), 1, 1) IN ('0', '2', '4', '6', '8', 'a', 'c', 'e') THEN 1.0 ELSE -1.0 END) for i in generate_series(1, 64)]) * 0.25 for j in generate_series(0, 15)] AS proj FROM embeddings WHERE vec_id < 50) SELECT vec_id, round(orig_norm, 6) AS orig_norm, round(sqrt(list_sum([c * c for c in proj])), 6) AS proj_norm, round(round(sqrt(list_sum([c * c for c in proj])), 6) / round(orig_norm, 6), 4) AS ratio FROM p ORDER BY vec_id"""),
      "E3/§2.9 ext: JL random projection 64→16 with norm-preservation audit"),

    // q176 — CONTENT-DEFINED chunking (the CDC/Rabin boundary rule over
    // tokens): a chunk ends at token p when the md5 of the trailing
    // 4-token window hits hash % 16 == 0 (expected chunk ≈ 16 tokens).
    // Complements q170's fixed-stride chunking: CDC boundaries are
    // position-INDEPENDENT, so inserting one token early in a document
    // only reshuffles chunks near the edit — the dedup-stability property
    // fixed-stride lacks (property-tested in PropertySpec). Plan: the
    // boundary flags are computed array-local per doc (map-side), the
    // running chunk id is one window partitioned by doc_id, chunk
    // contents re-assemble via in-group sort — never a global window.
    QuerySpec(
      "q176_cdc_chunk",
      (s, d) => {
        val w = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "documents")
          .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("tk"))
          .withColumn("bnd", expr(
            "transform(sequence(1, size(tk)), i -> CASE WHEN i >= 4 AND CAST(conv(substr(md5(concat_ws(' ', tk[i-4], tk[i-3], tk[i-2], tk[i-1])), 1, 4), 16, 10) AS INT) % 16 = 0 THEN 1 ELSE 0 END)"))
          .select(col("doc_id"), posexplode(arrays_zip(col("tk"), col("bnd"))))
          .select(col("doc_id"), col("pos"),
            col("col.tk").as("tok"), col("col.bnd").as("bnd"))
          .withColumn("chunk", coalesce(sum("bnd").over(w), lit(0)).cast("long"))
          .groupBy(col("doc_id"), col("chunk").as("chunk_idx"))
          .agg(count(lit(1)).as("n_tok"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("pos"), col("tok")))),
              x => x.getField("tok")), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents), pos AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS p FROM toks), ex AS (SELECT doc_id, p, tk[p] AS tok, CASE WHEN p >= 4 AND CAST(concat('0x', substr(md5(concat_ws(' ', tk[p-3], tk[p-2], tk[p-1], tk[p])), 1, 4)) AS INT) % 16 = 0 THEN 1 ELSE 0 END AS bnd FROM pos), ch AS (SELECT doc_id, p, tok, coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk FROM ex) SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_idx, count(*) AS n_tok, md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5 FROM ch GROUP BY 1, 2 ORDER BY doc_id, chunk_idx"""),
      "E4 ext: content-defined chunking — edit-stable boundaries vs q170's fixed stride"),

    // q177 — BLOCKED fuzzy matching with the native jaro_winkler
    // expression (JaroWinkler.scala — the string-similarity primitive
    // Spark lacks; semantics pinned to DuckDB's implementation): the
    // record-linkage shape — block on a cheap key (here the name's last
    // two chars, via the shared nameBlockPairs scaffold q221 also uses)
    // so the quadratic comparison runs per block, never corpus×corpus,
    // then aggregate match stats per block. min/max over ROUNDED
    // similarities and threshold counts only — no group-order-dependent
    // double sums, so the compare is exact cross-engine.
    QuerySpec(
      "q177_fuzzy_block",
      (s, d) => {
        graft.functions.JaroWinkler.register(s)
        R6Queries.nameBlockPairs(s, d)
          .select(col("blk"), round(expr("jaro_winkler(na, nb)"), 6).as("m"))
          .groupBy("blk")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("m") >= 0.95, 1L).otherwise(0L)).as("n_match"),
            max("m").as("max_jw"), min("m").as("min_jw"))
          .orderBy("blk")
      },
      Some(s"""${R6Queries.nameBlockPairSql("round(jaro_winkler_similarity(a.nm, b.nm), 6)")} SELECT blk, count(*) AS n_pairs, CAST(sum(CASE WHEN m >= 0.95 THEN 1 ELSE 0 END) AS BIGINT) AS n_match, max(m) AS max_jw, min(m) AS min_jw FROM p GROUP BY 1 ORDER BY blk"""),
      "§2.13/E1 ext: blocked fuzzy match via the native jaro_winkler expression"),

    // q178 — BM25 ranking: the lexical leg of hybrid retrieval (q158
    // fuses rankings; q220 fuses THIS leg with the vector leg). The
    // scoring pipeline and its determinism guarantees live in the shared
    // bm25TermCols base (see its doc comment); this query adds only the
    // hit count and the fixed-order rounded total.
    QuerySpec(
      "q178_bm25",
      (s, d) => {
        R6Queries.bm25TermCols(s, d)
          .select(col("doc_id"),
            (col("w1").isNotNull.cast("long") + col("w2").isNotNull.cast("long") +
              col("w3").isNotNull.cast("long")).as("n_hit"),
            round(coalesce(col("w1"), lit(0.0)) + coalesce(col("w2"), lit(0.0)) +
              coalesce(col("w3"), lit(0.0)), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH $bm25Cte SELECT doc_id, CAST((w1 IS NOT NULL)::INT + (w2 IS NOT NULL)::INT + (w3 IS NOT NULL)::INT AS BIGINT) AS n_hit, round(coalesce(w1, 0) + coalesce(w2, 0) + coalesce(w3, 0), 4) AS score FROM sc ORDER BY score DESC, doc_id LIMIT 20"""),
      "E4/§2.9 ext: BM25 keyword ranking — the lexical leg of hybrid retrieval"),

    // q179 — eval-set CONTAMINATION RATE: for each held-out doc (doc_id
    // < 10, the same eval set q128 decontaminates against), the fraction
    // of its 5-gram shingles that appear anywhere in the training corpus
    // — the per-benchmark overlap number an eval-integrity report quotes
    // (q128 answers "which TRAIN docs to drop"; this answers "how burned
    // is my EVAL"). The tiny eval side broadcasts; only matched shingles
    // shuffle to the per-doc count.
    QuerySpec(
      "q179_eval_overlap",
      (s, d) => {
        val sh = ScaleQueries.shingleRows(s, d)
        val ev = sh.where(col("doc_id") < 10)
        val train = sh.where(col("doc_id") >= 10).select("s").distinct()
        val hits = train.join(broadcast(ev), Seq("s"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
        ev.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_sh"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"))
          .withColumn("frac", round(col("n_hit") / col("n_sh"), 4))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents), sh AS (SELECT DISTINCT doc_id, s FROM (SELECT doc_id, unnest([concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]) for i in generate_series(1, len(tk) - 4)]) AS s FROM toks) z), ev AS (SELECT doc_id, s FROM sh WHERE doc_id < 10), tr AS (SELECT DISTINCT s FROM sh WHERE doc_id >= 10), h AS (SELECT doc_id, count(*) AS n_hit FROM ev JOIN tr ON ev.s = tr.s GROUP BY 1), t AS (SELECT doc_id, count(*) AS n_sh FROM ev GROUP BY 1) SELECT t.doc_id, t.n_sh, coalesce(h.n_hit, 0) AS n_hit, round(coalesce(h.n_hit, 0) * 1.0 / t.n_sh, 4) AS frac FROM t LEFT JOIN h ON t.doc_id = h.doc_id ORDER BY 1"""),
      "E2/E4 ext: per-eval-doc contamination rate against the training corpus"),

    // q180 — ROLLING 7-day actives: per calendar day, exact DAU and the
    // trailing-7-day distinct-user count, plus DAU/WAU stickiness in
    // basis points via floor (round() can land on the .5 grid for
    // rational ratios — the q144 rule). The day grid is tiny and
    // broadcast against distinct user-days (each row lands in ≤ 7 grid
    // days), so the "rolling distinct" that window frames can't express
    // becomes a bounded range join + count-distinct — the scale-safe
    // shape for sliding distinct aggregates.
    QuerySpec(
      "q180_rolling_actives",
      (s, d) => {
        val du = t(s, d, "events")
          .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        val grid = du.select(col("day").as("d")).distinct()
        val wau = broadcast(grid)
          .join(du, col("day").between(date_sub(col("d"), 6), col("d")))
          .groupBy("d").agg(countDistinct("user_id").as("wau7"))
        val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
        dau.join(wau, col("day") === col("d"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dau"), col("wau7"),
            floor(col("dau") * 10000.0 / col("wau7")).cast("long").as("stick_bp"))
          .orderBy("day")
      },
      Some("""WITH du AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events), grid AS (SELECT DISTINCT day AS d FROM du), w AS (SELECT d, count(DISTINCT user_id) AS wau7 FROM grid JOIN du ON du.day BETWEEN d - 6 AND d GROUP BY 1), a AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1) SELECT strftime(a.day, '%Y-%m-%d') AS day, a.dau, w.wau7, CAST(floor(a.dau * 10000.0 / w.wau7) AS BIGINT) AS stick_bp FROM a JOIN w ON a.day = w.d ORDER BY day"""),
      "§2.12/§2.4 ext: rolling 7-day distinct actives — sliding distinct via bounded range join"),

    // q181 — WATER-FILLING token-budget allocation: split a global
    // training-token budget (60% of corpus chars) across sources, capping
    // no source above the common level L where Σ min(tokens_s, L) = B —
    // the allocator behind "sample proportionally but never above a
    // source's size" (q132 computes target WEIGHTS; this computes exact
    // per-source QUOTAS). The classic sorted-prefix-sum closed form: the
    // first source (ascending) whose uncapped extension covers B fixes
    // L = (B - prefix) div (remaining sources). All integer arithmetic.
    // Scale: the windows run over the |sources|-row aggregate (~20 rows,
    // allowlisted in PlanShapeSpec), never raw documents.
    QuerySpec(
      "q181_budget_alloc",
      (s, d) => {
        val src = t(s, d, "documents").groupBy("source").agg(sum("n_chars").as("tok"))
        val tot = src.agg(sum("tok").as("t"), count(lit(1)).as("n"))
        val w = Window.orderBy(col("tok").asc, col("source").asc)
        val ranked = src.crossJoin(broadcast(tot))
          .withColumn("b", floor(col("t") * 0.6).cast("long"))
          .withColumn("rk", row_number().over(w))
          .withColumn("pre", coalesce(
            sum("tok").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val lvl = ranked
          .where(col("tok") * (col("n") - col("rk") + 1) + col("pre") >= col("b"))
          .orderBy("rk").limit(1)
          .select(expr("(b - pre) div (n - rk + 1)").as("level"))
        src.crossJoin(broadcast(lvl))
          .select(col("source"), col("tok"),
            least(col("tok"), col("level")).as("alloc"),
            (col("tok") > col("level")).cast("long").as("capped"),
            col("level"))
          .orderBy("source")
      },
      Some("""WITH src AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS tok FROM documents GROUP BY 1), tot AS (SELECT CAST(sum(tok) AS BIGINT) AS t, count(*) AS n FROM src), rkd AS (SELECT source, tok, t, n, CAST(floor(t * 0.6) AS BIGINT) AS b, row_number() OVER (ORDER BY tok, source) AS rk, CAST(coalesce(sum(tok) OVER (ORDER BY tok, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre FROM src CROSS JOIN tot), lvl AS (SELECT (b - pre) // (n - rk + 1) AS level FROM rkd WHERE tok * (n - rk + 1) + pre >= b ORDER BY rk LIMIT 1) SELECT source, tok, least(tok, level) AS alloc, CAST(tok > level AS BIGINT) AS capped, level FROM src CROSS JOIN lvl ORDER BY source"""),
      "E4/§2.8 ext: water-filling budget allocation — exact per-source quotas"),

    // q182 — WINSORIZATION at exact-element p01/p99: clip
    // l_extendedprice to the ceil(q·n)-th smallest VALUE (never the
    // interpolated percentile — the ADVICE-r3 cross-engine one-ulp
    // hazard). The global rank is computed WITHOUT a global sort by the
    // two-level offset scheme: 65536 fixed-width buckets give a bounded
    // bucket-total table whose cumulative sum (the only global window —
    // allowlisted, ≤65536 rows at ANY corpus size) yields per-bucket
    // rank offsets; within-bucket ranks come from a bucket-PARTITIONED
    // window. Distinct prices are ~|rows| here (583k of 600k at sf0.1),
    // so a naive cum-over-distinct-values would be a disguised global
    // sort. Clipped outputs stay on the price grid → min/max round
    // exactly; avg follows the q01 precedent.
    QuerySpec(
      "q182_winsorize",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val cuts = graft.ops.QuantileOps
          .exactElementQuantiles(li, "l_extendedprice", Seq.empty, Seq(0.01, 0.99))
          .select(col("cut_1").as("lo"), col("cut_2").as("hi"))
        li.crossJoin(broadcast(cuts))
          .select(col("l_returnflag"),
            greatest(least(col("l_extendedprice"), col("hi")), col("lo")).as("wv"),
            (col("l_extendedprice") < col("lo")).cast("long").as("is_lo"),
            (col("l_extendedprice") > col("hi")).cast("long").as("is_hi"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("is_lo").as("n_lo"), sum("is_hi").as("n_hi"),
            round(min("wv"), 2).as("min_w"), round(max("wv"), 2).as("max_w"),
            round(avg("wv"), 4).as("avg_w"))
          .orderBy("l_returnflag")
      },
      Some(s"""WITH cuts AS (SELECT cut_1 AS lo, cut_2 AS hi FROM ${graft.ops.QuantileOps.oracleSql("lineitem", "l_extendedprice", Seq.empty, Seq(0.01, 0.99))} qq), wv AS (SELECT l_returnflag, greatest(least(l_extendedprice, hi), lo) AS wv, CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END AS is_lo, CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END AS is_hi FROM lineitem CROSS JOIN cuts) SELECT l_returnflag, count(*) AS n, CAST(sum(is_lo) AS BIGINT) AS n_lo, CAST(sum(is_hi) AS BIGINT) AS n_hi, round(min(wv), 2) AS min_w, round(max(wv), 2) AS max_w, round(avg(wv), 4) AS avg_w FROM wv GROUP BY 1 ORDER BY l_returnflag"""),
      "§2.4/§2.9 ext: winsorization at exact-element cuts — two-level rank offsets, no global sort"),

    // q183 — repeat-purchase CYCLE analysis: per-customer gaps between
    // consecutive orders (keyed lag window), aggregated per market
    // segment — the purchase-frequency profile behind churn/LTV models.
    // Same-day order ties break on o_orderkey; the gap multiset is
    // tie-order-invariant anyway. One keyed window + one broadcast dim
    // join + a 5-group aggregate; integer day arithmetic throughout.
    QuerySpec(
      "q183_purchase_gaps",
      (s, d) => {
        val o = t(s, d, "orders")
          .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"), col("o_orderkey"))
        val w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
        val g = o.withColumn("gap",
            datediff(col("od"), lag("od", 1).over(w)).cast("long"))
          .where(col("gap").isNotNull)
        g.join(broadcast(t(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy("seg")
          .agg(countDistinct("o_custkey").as("n_customers"),
            count(lit(1)).as("n_gaps"),
            round(avg("gap"), 4).as("avg_gap"),
            min("gap").as("min_gap"), max("gap").as("max_gap"))
          .orderBy("seg")
      },
      Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey FROM orders), g AS (SELECT o_custkey, datediff('day', lag(od) OVER (PARTITION BY o_custkey ORDER BY od, o_orderkey), od) AS gap FROM o), j AS (SELECT c_mktsegment AS seg, gap, o_custkey FROM g JOIN customer ON o_custkey = c_custkey WHERE gap IS NOT NULL) SELECT seg, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_gaps, round(avg(gap), 4) AS avg_gap, min(gap) AS min_gap, max(gap) AS max_gap FROM j GROUP BY 1 ORDER BY seg"""),
      "§2.5/§2.4 ext: repeat-purchase gap profile per segment (keyed lag window)"),

    // q184 — ROBUST z-score outlier report (median/MAD, not mean/stddev —
    // the outlier detector outliers can't poison): per event type, the
    // exact-element median, the MAD (median absolute deviation, again an
    // exact element), and the count beyond the 3σ-equivalent fence
    // 3·1.4826·MAD. Both medians come from QuantileOps' two-level rank
    // offsets — every window is (type)- or (type, bucket)-partitioned, so
    // per-type row counts can grow 100× without a global sort appearing.
    // Complements q146 (mean/std anomaly gate) and q78 (moments).
    QuerySpec(
      "q184_robust_zscore",
      (s, d) => {
        // Both quantile passes and the final fence count re-read the
        // projected event rows (and the med-joined deviations) — three
        // scans each without a lineage cut. localCheckpoint materializes
        // the 2-column projection once (the q214 stance: it is a
        // fraction of the raw table and becomes shuffle-file-sized
        // state, not a cached raw corpus).
        // (r14, measured and REJECTED: a per-(type, value) counting
        // pass feeding median/MAD/fence via a FromCounts QuantileOps
        // variant — ndv(type, value) is 49k of 100k rows here (raw
        // doubles, only ~2× reduction), QuantileOps already aggregates
        // per-value internally, and the extra pc/devC checkpoint
        // barriers sit on a strictly serial chain: interleaved QTime
        // A/B measured the fold ~0.9 s WORSE (2.47 vs 1.56 median).
        // The q404/q361 per-key convention pays only when ndv ≪ n.)
        val ev = t(s, d, "events").where(col("value").isNotNull)
          .select(col("event_type"), col("value"))
          .localCheckpoint(false)
        val med = graft.ops.QuantileOps
          .exactElementQuantile(ev, "value", Seq("event_type"), 0.5)
          .select(col("event_type"), col("n"), col("cut").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
          .localCheckpoint(false)
        val mad = graft.ops.QuantileOps
          .exactElementQuantile(dev, "dev", Seq("event_type"), 0.5)
          .select(col("event_type"), col("cut").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(max("med"), 4).as("med"), round(max("mad"), 4).as("mad"),
            sum(when(col("dev") > col("mad") * 1.4826 * 3, 1L).otherwise(0L)).as("n_out"))
          .orderBy("event_type")
      },
      Some {
        val medQ = graft.ops.QuantileOps.oracleSql(
          "(SELECT event_type, value FROM events WHERE value IS NOT NULL) e",
          "value", Seq("event_type"), Seq(0.5))
        val madQ = graft.ops.QuantileOps.oracleSql(
          "(SELECT d.event_type, abs(d.value - m.cut_1) AS dev FROM (SELECT event_type, value FROM events WHERE value IS NOT NULL) d JOIN med m ON d.event_type = m.event_type) x",
          "dev", Seq("event_type"), Seq(0.5))
        s"""WITH med AS (SELECT event_type, n, cut_1 FROM $medQ z1), mad AS (SELECT event_type, cut_1 AS mad FROM $madQ z2) SELECT e.event_type, count(*) AS n, round(max(m.cut_1), 4) AS med, round(max(a.mad), 4) AS mad, CAST(sum(CASE WHEN abs(e.value - m.cut_1) > a.mad * 1.4826 * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_out FROM (SELECT event_type, value FROM events WHERE value IS NOT NULL) e JOIN med m ON e.event_type = m.event_type JOIN mad a ON e.event_type = a.event_type GROUP BY 1 ORDER BY 1"""
      },
      "§2.4 ext: robust z-score (median/MAD) outlier report via grouped exact elements"),

    // q185 — GDPR purge-impact audit: for a right-to-be-forgotten request
    // set (custkey % 97 == 0), the cascade footprint across the FK chain
    // customer → orders → lineitem — row counts and basis-point share per
    // entity BEFORE deletion (the report a data-governance run produces
    // to size the purge). The request set broadcasts into semi-joins;
    // the order-key cascade stays a keyed semi-join, never a cross.
    QuerySpec(
      "q185_purge_audit",
      (s, d) => {
        val cust = t(s, d, "customer")
        val ords = t(s, d, "orders")
        val li = t(s, d, "lineitem")
        val del = cust.where(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("k"))
        val oPurge = ords.join(broadcast(del), col("o_custkey") === col("k"), "left_semi")
        val liPurge = li.join(oPurge.select(col("o_orderkey").as("ok")),
          col("l_orderkey") === col("ok"), "left_semi")
        def row(name: String, purged: DataFrame, total: DataFrame): DataFrame =
          purged.agg(count(lit(1)).as("n_purge"))
            .crossJoin(total.agg(count(lit(1)).as("n_total")))
            .select(lit(name).as("entity"), col("n_purge"), col("n_total"))
        row("customer", del, cust)
          .unionByName(row("orders", oPurge, ords))
          .unionByName(row("lineitem", liPurge, li))
          .withColumn("purge_bp",
            floor(col("n_purge") * 10000.0 / col("n_total")).cast("long"))
          .orderBy("entity")
      },
      Some("""WITH del AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0), op AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM del)), lp AS (SELECT l_orderkey FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM op)), u AS (SELECT 'customer' AS entity, (SELECT count(*) FROM del) AS n_purge, (SELECT count(*) FROM customer) AS n_total UNION ALL SELECT 'orders', (SELECT count(*) FROM op), (SELECT count(*) FROM orders) UNION ALL SELECT 'lineitem', (SELECT count(*) FROM lp), (SELECT count(*) FROM lineitem)) SELECT entity, CAST(n_purge AS BIGINT) AS n_purge, CAST(n_total AS BIGINT) AS n_total, CAST(floor(n_purge * 10000.0 / n_total) AS BIGINT) AS purge_bp FROM u ORDER BY entity"""),
      "§2.3/§2.8 ext: GDPR purge cascade audit across the FK chain"),

    // q186 — DETERMINISTIC epoch shuffle: the reproducible training-order
    // generator — epoch e's order is sort-by-md5(e, doc_id), so any
    // worker can reconstruct any epoch's sequence from the seed alone
    // (no materialized permutation table). Per-epoch top-5 here via the
    // NATIVE TopKPerGroup plan node (q130's heap operator — bounded
    // memory per group, no per-epoch full sort); the rank window runs
    // over the 5-row-per-epoch survivors only.
    QuerySpec(
      "q186_epoch_shuffle",
      (s, d) => {
        import graft.ops.TopKOps
        val ep = t(s, d, "documents").select(col("doc_id"))
          .withColumn("epoch", explode(sequence(lit(1), lit(3))))
          .withColumn("epoch", col("epoch").cast("long"))
          .withColumn("h", md5(concat_ws("_", col("epoch"), col("doc_id"))))
        TopKOps.topKPerGroup(ep.select("epoch", "doc_id", "h"),
            groupCols = Seq("epoch"), orderBy = Seq(("h", false)), k = 5)
          .withColumn("rank",
            row_number().over(Window.partitionBy("epoch").orderBy("h")).cast("long"))
          .select("epoch", "rank", "doc_id", "h")
          .orderBy("epoch", "rank")
      },
      Some("""WITH ep AS (SELECT doc_id, e, md5(concat(e, '_', doc_id)) AS h FROM documents, (SELECT unnest(generate_series(1, 3)) AS e) g), r AS (SELECT e AS epoch, doc_id, h, row_number() OVER (PARTITION BY e ORDER BY h) AS rank FROM ep) SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank, doc_id, h FROM r WHERE rank <= 5 ORDER BY epoch, rank"""),
      "§2.8/§2.13 ext: seeded epoch shuffle via hash order + native top-k node"),

    // q187 — multi-touch ATTRIBUTION: each purchase credits its LAST and
    // FIRST prior touch (any non-purchase event) within a 24 h window,
    // revenue and counts rolled up per channel, unmatched purchases in a
    // 'none' bucket — the first-vs-last-touch comparison a marketing
    // pipeline reports (q156 is the single-channel as-of primitive; this
    // is the windowed multi-channel rollup). The user×day-bucket
    // prefilter (purchase probes its own and the previous day bucket)
    // bounds candidates to same-user-same-day activity — never a full
    // per-user cross; first/last picks are per-purchase windows.
    QuerySpec(
      "q187_touch_attribution",
      (s, d) => {
        val ev = t(s, d, "events")
        val pur = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"), col("event_id").as("pid"),
            col("value"))
        val touch = ev.where(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts").as("tts"), col("event_id").as("tid"),
            col("event_type").as("channel"))
        val pb = pur.withColumn("bkt", explode(array(
          floor(unix_timestamp(col("pts")) / 86400),
          floor(unix_timestamp(col("pts")) / 86400) - 1)))
        val tb = touch.withColumn("bkt", floor(unix_timestamp(col("tts")) / 86400))
        val cand = pb.join(tb, Seq("user_id", "bkt"))
          .where(col("tts") <= col("pts") &&
            col("tts") >= col("pts") - expr("INTERVAL 24 HOURS"))
        // ONE candidate pass: both rank directions share the pid
        // partitioning (two Window functions, one exchange), and all four
        // per-channel stats fold into a single conditional aggregate —
        // no full-outer stitch, no window recompute per output branch
        val wl = Window.partitionBy("pid").orderBy(col("tts").desc, col("tid").desc)
        val wf = Window.partitionBy("pid").orderBy(col("tts").asc, col("tid").asc)
        val ranked = cand.withColumn("rl", row_number().over(wl))
          .withColumn("rf", row_number().over(wf))
        val byCh = ranked.groupBy("channel").agg(
          sum(when(col("rl") === 1, 1L).otherwise(0L)).as("n_last"),
          round(coalesce(sum(when(col("rl") === 1, col("value"))), lit(0.0)), 2)
            .as("rev_last"),
          sum(when(col("rf") === 1, 1L).otherwise(0L)).as("n_first"),
          round(coalesce(sum(when(col("rf") === 1, col("value"))), lit(0.0)), 2)
            .as("rev_first"))
        // a purchase is attributed iff it has ANY candidate → the anti
        // join keys on distinct candidate pids, no rank needed
        val none = pur
          .join(cand.select("pid").distinct(), Seq("pid"), "left_anti")
          .agg(count(lit(1)).as("n"), round(coalesce(sum("value"), lit(0.0)), 2).as("rev"))
          .select(lit("none").as("channel"), col("n").as("n_last"),
            col("rev").as("rev_last"), col("n").as("n_first"), col("rev").as("rev_first"))
        byCh.unionByName(none).orderBy("channel")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type, value FROM events), p AS (SELECT user_id, ts AS pts, event_id AS pid, value FROM ev WHERE event_type = 'purchase'), tt AS (SELECT user_id, ts AS tts, event_id AS tid, event_type AS channel FROM ev WHERE event_type <> 'purchase'), cand AS (SELECT p.pid, p.value, tt.channel, tt.tts, tt.tid FROM p JOIN tt ON p.user_id = tt.user_id AND tt.tts <= p.pts AND tt.tts >= p.pts - INTERVAL 24 HOURS), r AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY tts DESC, tid DESC) AS rl, row_number() OVER (PARTITION BY pid ORDER BY tts, tid) AS rf FROM cand), bych AS (SELECT channel, sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS n_last, round(coalesce(sum(CASE WHEN rl = 1 THEN value END), 0), 2) AS rev_last, sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS n_first, round(coalesce(sum(CASE WHEN rf = 1 THEN value END), 0), 2) AS rev_first FROM r GROUP BY 1), no AS (SELECT 'none' AS channel, count(*) AS n_last, round(coalesce(sum(value), 0), 2) AS rev_last, count(*) AS n_first, round(coalesce(sum(value), 0), 2) AS rev_first FROM p WHERE pid NOT IN (SELECT DISTINCT pid FROM cand)), u AS (SELECT * FROM bych UNION ALL SELECT * FROM no) SELECT channel, CAST(n_last AS BIGINT) AS n_last, rev_last, CAST(n_first AS BIGINT) AS n_first, rev_first FROM u ORDER BY channel"""),
      "§2.3/§2.5 ext: first-vs-last-touch attribution within a 24h window"),

    // q188 — PMI term collocations: pointwise mutual information
    // ln(c_ab·N / (c_a·c_b)) over document co-occurrence, the classic
    // collocation/phrase-mining statistic. Pair space is bounded by
    // vocabulary² (the presence self-join blocks on doc_id, ~|vocab|²/2
    // pairs per doc); per-term document frequencies broadcast back. All
    // counts integer; the single division and ln happen identically in
    // both engines (min-support 5 keeps the tail stable).
    QuerySpec(
      "q188_pmi_collocations",
      (s, d) => {
        val pres = ScaleQueries.termFreq(s, d).select(col("doc_id"), col("term"))
        val nd = pres.agg(countDistinct("doc_id").as("nd"))
        val ca = pres.groupBy("term").agg(count(lit(1)).as("ct"))
        val a = pres.select(col("doc_id"), col("term").as("ta"))
        val b = pres.select(col("doc_id"), col("term").as("tb"))
        a.join(b, Seq("doc_id")).where(col("ta") < col("tb"))
          .groupBy("ta", "tb").agg(count(lit(1)).as("cab"))
          .where(col("cab") >= 5)
          .join(broadcast(ca.select(col("term").as("ta"), col("ct").as("cta"))), "ta")
          .join(broadcast(ca.select(col("term").as("tb"), col("ct").as("ctb"))), "tb")
          .crossJoin(broadcast(nd))
          .select(col("ta"), col("tb"), col("cab"),
            round(log(col("cab") * col("nd") / (col("cta") * col("ctb"))), 4).as("pmi"))
          .orderBy("ta", "tb")
      },
      Some("""WITH pres AS (SELECT DISTINCT doc_id, term FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents) z), nd AS (SELECT count(DISTINCT doc_id) AS nd FROM pres), ca AS (SELECT term, count(*) AS ct FROM pres GROUP BY 1), cab AS (SELECT a.term AS ta, b.term AS tb, count(*) AS cab FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.term < b.term GROUP BY 1, 2) SELECT ta, tb, cab, round(ln(cab * nd / (x.ct * y.ct)), 4) AS pmi FROM cab JOIN ca x ON cab.ta = x.term JOIN ca y ON cab.tb = y.term CROSS JOIN nd WHERE cab >= 5 ORDER BY ta, tb"""),
      "E4/A7 ext: PMI collocation mining over document co-occurrence"),

    // q189 — daily QUOTA audit (rate limiting at day granularity): per
    // calendar day, users exceeding the 5-events/day quota, their worst
    // burst, and the total excess the limiter would have dropped — the
    // abuse/quota report an ingestion pipeline runs. One partial-agg
    // exchange on (user, day); the violation rollup groups ~|days| rows.
    QuerySpec(
      "q189_quota_audit",
      (s, d) => {
        t(s, d, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("c"))
          .where(col("c") > 5)
          .groupBy("d")
          .agg(count(lit(1)).as("n_users_over"), max("c").as("max_burst"),
            sum(col("c") - 5).as("excess"))
          .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("n_users_over"), col("max_burst"), col("excess"))
          .orderBy("day")
      },
      Some("""WITH m AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, count(*) AS c FROM events GROUP BY 1, 2) SELECT strftime(d, '%Y-%m-%d') AS day, count(*) AS n_users_over, CAST(max(c) AS BIGINT) AS max_burst, CAST(sum(c - 5) AS BIGINT) AS excess FROM m WHERE c > 5 GROUP BY 1 ORDER BY day"""),
      "§2.4/§4 ext: daily quota audit — per-day violators, worst burst, dropped excess"),

    // q190 — INCREMENTAL ANN index maintenance (q169's idea for the
    // vector index): treat vec_id % 10 >= 8 as the newly-arrived delta
    // batch; assign ONLY those vectors against the existing centroids
    // (the low-id vectors that seeded the base index) and report the
    // per-cell growth the merged index would see — how a daily embedding
    // increment joins a persisted IVF without re-quantizing the corpus.
    // Delta × broadcast-centroids assignment; two |cells|-group aggs.
    QuerySpec(
      "q190_incr_ann_index",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val cents = e.where(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
        val delta = graft.ops.AnnOps
          .assignToCells(e.where(col("vec_id") % 10 >= 8), cents)
          .groupBy("cell").agg(count(lit(1)).as("n_new"))
        val base = ScaleQueries.ivfFlat(s, d)
          .where(col("vec_id") % 10 < 8)
          .groupBy("cell").agg(count(lit(1)).as("n_base"))
        base.join(delta, Seq("cell"), "left")
          .select(col("cell").cast("long").as("cell"), col("n_base"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            floor(coalesce(col("n_new"), lit(0L)) * 10000.0 / col("n_base"))
              .cast("long").as("growth_bp"))
          .orderBy("cell")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding, $emL2 AS nrm FROM embeddings), asg AS (SELECT a.vec_id, b.vec_id AS cell, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot DESC, b.vec_id) AS rn FROM e a CROSS JOIN (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 8) b), cells AS (SELECT vec_id, cell FROM asg WHERE rn = 1), delta AS (SELECT cell, count(*) AS n_new FROM cells WHERE vec_id % 10 >= 8 GROUP BY 1), base AS (SELECT cell, count(*) AS n_base FROM cells WHERE vec_id % 10 < 8 GROUP BY 1) SELECT CAST(base.cell AS BIGINT) AS cell, base.n_base, coalesce(delta.n_new, 0) AS n_new, CAST(floor(coalesce(delta.n_new, 0) * 10000.0 / base.n_base) AS BIGINT) AS growth_bp FROM base LEFT JOIN delta ON base.cell = delta.cell ORDER BY cell"""),
      "E3/§2.4 ext: incremental ANN maintenance — delta vectors probe the persisted cells"),

    // q191 — MATRYOSHKA truncation audit: how much retrieval survives
    // when embeddings are truncated to their first 16 dims (the
    // matryoshka/MRL serving trick — cheap prefix search, full-dim
    // rescoring)? For each query: top-5 under full-dim cosine vs top-5
    // under 16-dim-prefix cosine, reporting the overlap count and the
    // prefix share of the vector's energy. Both rankings are broadcast-
    // query × corpus streaming argmaxes (never corpus×corpus); the
    // overlap metric joins two 50-row rank tables.
    QuerySpec(
      "q191_matryoshka_audit",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        val e = t(s, d, "embeddings")
          .withColumn("emb16", slice(col("embedding"), 1, 16))
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qe"),
            col("emb16").as("qe16"))
        def top5(score: org.apache.spark.sql.Column) = {
          val w = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cid").asc)
          broadcast(q).crossJoin(e)
            .where(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id").as("cid"), round(score, 6).as("cos_r"))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") <= 5)
            .select(col("qid"), col("cid"))
        }
        val full = top5(expr("cosine_sim(qe, embedding)"))
        val pref = top5(expr("cosine_sim(qe16, emb16)"))
        val overlap = full.join(pref, Seq("qid", "cid"))
          .groupBy("qid").agg(count(lit(1)).as("overlap5"))
        val energy = q.select(col("qid"),
          round(graft.ops.VectorOps.l2norm(col("qe16")) /
            graft.ops.VectorOps.l2norm(col("qe")), 4).as("prefix_energy"))
        energy.join(overlap, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("overlap5"), lit(0L)).as("overlap5"),
            col("prefix_energy"))
          .orderBy("qid")
      },
      Some {
        val dot16 = "round(list_sum([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) for i in generate_series(1, 16)]) / (a.n16 * b.n16), 6)"
        val l216 = "sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 16)]))"
        s"""WITH e AS (SELECT vec_id, embedding, $emL2 AS nrm, $l216 AS n16 FROM embeddings), fullr AS (SELECT qid, cid FROM (SELECT a.vec_id AS qid, b.vec_id AS cid, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot DESC, b.vec_id) AS rn FROM e a CROSS JOIN e b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id) z WHERE rn <= 5), prefr AS (SELECT qid, cid FROM (SELECT a.vec_id AS qid, b.vec_id AS cid, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot16 DESC, b.vec_id) AS rn FROM e a CROSS JOIN e b WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id) z WHERE rn <= 5), ov AS (SELECT fullr.qid, count(*) AS overlap5 FROM fullr JOIN prefr ON fullr.qid = prefr.qid AND fullr.cid = prefr.cid GROUP BY 1), en AS (SELECT vec_id AS qid, round(n16 / nrm, 4) AS prefix_energy FROM e WHERE vec_id < 10) SELECT en.qid, coalesce(ov.overlap5, 0) AS overlap5, en.prefix_energy FROM en LEFT JOIN ov ON en.qid = ov.qid ORDER BY 1"""
      },
      "E3 ext: matryoshka truncation audit — prefix-dim retrieval overlap vs full-dim"),

    // q192 — MARKET-BASKET association rules at brand granularity:
    // support / confidence / lift for brand pairs co-purchased in one
    // order. Brands (not parts) keep the pair space dense and bounded
    // (≤ |brands|²/2 at ANY corpus size); the per-order pair fan-out is
    // C(brands-per-order, 2) ≤ C(7, 2). All counts integer; lift and
    // confidence are single divisions rounded 4dp. The itemset shape
    // behind recommendation candidates and co-occurrence features.
    QuerySpec(
      "q192_brand_basket",
      (s, d) => {
        // ONE shuffle builds the per-order brand BASKETS (collect_set
        // absorbs the distinct — the old plan's separate distinct
        // shuffle and its 4×-larger (order, brand) checkpoint are
        // gone); the |orders|-row basket table is the lineage cut, and
        // all three consumers (order-count scalar, per-brand supports
        // via explode, map-side pair generation) derive from it
        // without re-running the lineitem⋈part join. The r5 replan
        // kept the (order, brand) table as the checkpoint; the median
        // bench showed that materialization WAS the q192 regression —
        // checkpointing the grouped baskets instead restores it.
        val baskets = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
          .groupBy("ok").agg(sort_array(collect_set("brand")).as("bs"))
          .localCheckpoint(false)
        val n = baskets.agg(count(lit(1)).as("n_orders"))
        val supp1 = baskets.select(explode(col("bs")).as("brand"))
          .groupBy("brand").agg(count(lit(1)).as("s1"))
        // pair fan-out stays bounded by the basket size: C(k,2) ≤ C(7,2)
        val pairs = baskets
          .select(explode(expr(
            "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS ba, y AS bb))))"))
            .as("pr"))
          .select(col("pr.ba"), col("pr.bb"))
        pairs.groupBy("ba", "bb").agg(count(lit(1)).as("supp"))
          .where(col("supp") >= 10)
          .join(broadcast(supp1.select(col("brand").as("ba"), col("s1").as("sa"))), "ba")
          .join(broadcast(supp1.select(col("brand").as("bb"), col("s1").as("sb"))), "bb")
          .crossJoin(broadcast(n))
          // floor quantization, not round: conf = supp/sa is a small-
          // denominator rational that CAN land exactly on a round grid
          // (supp=10, sa=320 → 0.03125) — the q144/q180 rule
          .select(col("ba"), col("bb"), col("supp"),
            floor(col("supp") * 10000.0 / col("sa")).cast("long").as("conf_bp"),
            floor(col("supp") * col("n_orders") * 1000.0 / (col("sa") * col("sb")))
              .cast("long").as("lift_pm"))
          .orderBy("ba", "bb")
      },
      Some("""WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand FROM lineitem JOIN part ON l_partkey = p_partkey), n AS (SELECT count(DISTINCT ok) AS n_orders FROM ob), s1 AS (SELECT brand, count(*) AS s1 FROM ob GROUP BY 1), pr AS (SELECT a.brand AS ba, b.brand AS bb, count(*) AS supp FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand GROUP BY 1, 2) SELECT ba, bb, supp, CAST(floor(supp * 10000.0 / x.s1) AS BIGINT) AS conf_bp, CAST(floor(supp * n_orders * 1000.0 / (x.s1 * y.s1)) AS BIGINT) AS lift_pm FROM pr JOIN s1 x ON pr.ba = x.brand JOIN s1 y ON pr.bb = y.brand CROSS JOIN n WHERE supp >= 10 ORDER BY ba, bb"""),
      "§2.3/§2.4 ext: market-basket support/confidence/lift at brand granularity"),

    // q193 — event-type TRANSITION matrix (first-order Markov): per user,
    // consecutive event pairs by time (lead window keyed by user), counts
    // and row-conditional probabilities P(next | current) in floor basis
    // points (the q180 rule — a rational can land exactly on the round
    // grid). The session-flow fingerprint behind funnel design and
    // anomaly detection. One keyed window + a |types|²-row aggregate.
    QuerySpec(
      "q193_transition_matrix",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("cur"))
          .withColumn("nxt", lead("cur", 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
        val tot = pairs.groupBy("cur").agg(sum("c").as("rt"))
        pairs.join(broadcast(tot), "cur")
          .select(col("cur"), col("nxt"), col("c"),
            floor(col("c") * 10000.0 / col("rt")).cast("long").as("p_bp"))
          .orderBy("cur", "nxt")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type AS cur FROM events), p AS (SELECT cur, lead(cur) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM ev), c AS (SELECT cur, nxt, count(*) AS c FROM p WHERE nxt IS NOT NULL GROUP BY 1, 2), t2 AS (SELECT cur, CAST(sum(c) AS BIGINT) AS rt FROM c GROUP BY 1) SELECT c.cur, c.nxt, c.c, CAST(floor(c.c * 10000.0 / t2.rt) AS BIGINT) AS p_bp FROM c JOIN t2 ON c.cur = t2.cur ORDER BY 1, 2"""),
      "§2.5/§2.4 ext: first-order event-transition matrix with conditional probabilities"),

    // q194 — INTER-ARRIVAL burst profile: per event type, the exact p50
    // and p95 of the seconds-gap between a user's consecutive events
    // (gap belongs to the LATER event) plus the sub-10s burst count —
    // the arrival-process profile a capacity planner or bot detector
    // reads. Gaps are integer seconds from a user-keyed lag window;
    // quantiles are exact elements via QuantileOps (type- and
    // bucket-partitioned windows only).
    QuerySpec(
      "q194_burst_profile",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // consumed by both the quantile pass and the burst aggregate —
        // materialize the windowed gaps once (q184's stance)
        val gaps = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("gap",
            (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))).cast("long"))
          .where(col("gap").isNotNull)
          .select("event_type", "gap")
          .localCheckpoint(false)
        val q = graft.ops.QuantileOps
          .exactElementQuantiles(gaps, "gap", Seq("event_type"), Seq(0.5, 0.95))
          .select(col("event_type"), col("cut_1").cast("long").as("p50_s"),
            col("cut_2").cast("long").as("p95_s"))
        gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n_gaps"),
            sum(when(col("gap") < 10, 1L).otherwise(0L)).as("n_bursts"))
          .join(broadcast(q), "event_type")
          .orderBy("event_type")
      },
      Some {
        val gapsFrom = "(SELECT event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) - floor(epoch(lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))) AS BIGINT) AS gap FROM events) g WHERE gap IS NOT NULL"
        val qSql = graft.ops.QuantileOps.oracleSql(
          s"(SELECT event_type, gap FROM $gapsFrom) gg", "gap", Seq("event_type"), Seq(0.5, 0.95))
        s"""WITH gaps AS (SELECT event_type, gap FROM $gapsFrom), qq AS (SELECT event_type, CAST(cut_1 AS BIGINT) AS p50_s, CAST(cut_2 AS BIGINT) AS p95_s FROM $qSql z) SELECT g2.event_type, count(*) AS n_gaps, CAST(sum(CASE WHEN gap < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts, max(qq.p50_s) AS p50_s, max(qq.p95_s) AS p95_s FROM gaps g2 JOIN qq ON g2.event_type = qq.event_type GROUP BY 1 ORDER BY 1"""
      },
      "§2.5/§2.4 ext: inter-arrival burst profile — exact gap quantiles per event type"),

    // q195 — DATASET-VERSION diff: the release regression report between
    // corpus v1 (documents as shipped) and a deterministically-derived
    // v2 (doc_id % 13 == 0 dropped, doc_id % 17 == 0 re-texted) — per
    // source: rows added / removed / changed / unchanged, keyed by
    // doc_id with md5(text) as the change detector. The full-outer join
    // on the primary key IS the diff; at 100 TB both sides shuffle once
    // on the key and the report groups |sources| rows. The check a data
    // team runs before promoting a new corpus snapshot.
    QuerySpec(
      "q195_dataset_diff",
      (s, d) => {
        val docs = t(s, d, "documents")
        val v1 = docs.select(col("doc_id"), col("source").as("s1"), md5(col("text")).as("h1"))
        // v2 = v1 minus every 13th doc, every 17th re-texted, PLUS newly
        // ingested docs (synthetic ids so the added leg of the diff is
        // genuinely exercised — a subset-only v2 makes n_added dead code).
        // Added-leg keys live OUTSIDE the id domain (-(id+1) < 0 for any
        // doc_id >= 0) so no corpus size can collide them with real ids —
        // a fixed positive offset would silently reclassify added rows as
        // changed/unchanged once the corpus passes the offset.
        val v2 = docs.where(col("doc_id") % 13 =!= 0)
          .select(col("doc_id"), col("source").as("s2"),
            md5(when(col("doc_id") % 17 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h2"))
          .unionByName(docs.where(col("doc_id") % 19 === 0)
            .select((-(col("doc_id") + 1L)).as("doc_id"), col("source").as("s2"),
              md5(concat(col("text"), lit(" new"))).as("h2")))
        v1.join(v2, Seq("doc_id"), "full")
          .select(coalesce(col("s1"), col("s2")).as("source"), col("h1"), col("h2"))
          .groupBy("source")
          .agg(sum(when(col("h1").isNull, 1L).otherwise(0L)).as("n_added"),
            sum(when(col("h2").isNull, 1L).otherwise(0L)).as("n_removed"),
            sum(when(col("h1").isNotNull && col("h2").isNotNull &&
              col("h1") =!= col("h2"), 1L).otherwise(0L)).as("n_changed"),
            sum(when(col("h1") === col("h2"), 1L).otherwise(0L)).as("n_unchanged"))
          .orderBy("source")
      },
      Some("""WITH v1 AS (SELECT doc_id, source AS s1, md5(text) AS h1 FROM documents), v2 AS (SELECT doc_id, source AS s2, md5(CASE WHEN doc_id % 17 = 0 THEN concat(text, ' v2') ELSE text END) AS h2 FROM documents WHERE doc_id % 13 <> 0 UNION ALL SELECT -(doc_id + 1), source, md5(concat(text, ' new')) FROM documents WHERE doc_id % 19 = 0), j AS (SELECT coalesce(v1.s1, v2.s2) AS source, v1.h1, v2.h2 FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id) SELECT source, CAST(sum(CASE WHEN h1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added, CAST(sum(CASE WHEN h2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, CAST(sum(CASE WHEN h1 IS NOT NULL AND h2 IS NOT NULL AND h1 <> h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed, CAST(sum(CASE WHEN h1 = h2 THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged FROM j GROUP BY 1 ORDER BY source"""),
      "§2.1/§2.8 ext: dataset-version diff — keyed full-outer with content-hash change detection"),

    // q196 — one-round LABEL PROPAGATION (semi-supervised bootstrap):
    // mask the label of every vec_id % 5 == 0 vector, then predict it as
    // the majority label among LABELED vectors in the same IVF cell
    // (ties to the lowest label), and report per-cell accuracy against
    // the held-out truth. The cheap first iteration of a label-prop
    // loop, blocked by the shared coarse quantizer — candidates are
    // cell-mates, never the corpus. Output is |cells| rows.
    QuerySpec(
      "q196_label_prop",
      (s, d) => {
        val al = ScaleQueries.ivfFlat(s, d)
          .join(t(s, d, "embeddings").select(col("vec_id"), col("label")), "vec_id")
        val unlabeled = al.where(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("uid"), col("cell"),
            col("label").cast("long").as("truth"))
        val votes = al.where(col("vec_id") % 5 =!= 0)
          .groupBy(col("cell"), col("label").cast("long").as("lab"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("cell").orderBy(col("c").desc, col("lab").asc)
        val winner = votes.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).select(col("cell"), col("lab").as("pred"))
        unlabeled.join(winner, Seq("cell"))
          .groupBy(col("cell").cast("long").as("cell"))
          .agg(count(lit(1)).as("n_unlabeled"), max("pred").as("pred"),
            sum(when(col("truth") === col("pred"), 1L).otherwise(0L)).as("n_correct"))
          .orderBy("cell")
      },
      Some(s"""WITH e AS (SELECT vec_id, label, embedding, $emL2 AS nrm FROM embeddings), asg AS (SELECT a.vec_id, a.label, b.vec_id AS cell, row_number() OVER (PARTITION BY a.vec_id ORDER BY $dot DESC, b.vec_id) AS rn FROM e a CROSS JOIN (SELECT vec_id, embedding, nrm FROM e WHERE vec_id < 8) b), cells AS (SELECT vec_id, label, cell FROM asg WHERE rn = 1), votes AS (SELECT cell, CAST(label AS BIGINT) AS lab, count(*) AS c FROM cells WHERE vec_id % 5 <> 0 GROUP BY 1, 2), win AS (SELECT cell, lab AS pred FROM (SELECT cell, lab, row_number() OVER (PARTITION BY cell ORDER BY c DESC, lab) AS rn FROM votes) z WHERE rn = 1), u AS (SELECT vec_id, cell, CAST(label AS BIGINT) AS truth FROM cells WHERE vec_id % 5 = 0) SELECT CAST(u.cell AS BIGINT) AS cell, count(*) AS n_unlabeled, max(win.pred) AS pred, CAST(sum(CASE WHEN u.truth = win.pred THEN 1 ELSE 0 END) AS BIGINT) AS n_correct FROM u JOIN win ON u.cell = win.cell GROUP BY 1 ORDER BY cell"""),
      "E3/§2.10 ext: one-round label propagation over the shared IVF cells"),

    // q197 — EMBEDDING drift monitor: q154's PSI applied to the vector
    // column — the norm distribution of the incremental batch (q190's
    // delta, vec_id % 10 >= 8) against the indexed base, over fixed
    // 0.1-wide L2-norm bins. The alarm that tells an index maintainer
    // the new embeddings come from a different model/preprocessing
    // BEFORE they pollute the cells (pairs with q190's growth report and
    // q168's occupancy audit). ONE conditional-histogram scan builds
    // both sides; proportions are Laplace-smoothed (+0.5 per bin) so a
    // bin populated on only ONE side still contributes — an inner-join
    // ln-0 guard would silence the alarm exactly when drift is largest
    // (disjoint norm ranges → zero shared bins → psi NULL). 1-row report
    // with the one-sided bin count alongside.
    QuerySpec(
      "q197_embedding_drift",
      (s, d) => {
        val hist = t(s, d, "embeddings")
          .withColumn("bin",
            floor(graft.ops.VectorOps.l2norm(col("embedding")) / 0.1).cast("long"))
          .groupBy("bin")
          .agg(sum(when(col("vec_id") % 10 >= 8, 1L).otherwise(0L)).as("cp"),
            sum(when(col("vec_id") % 10 < 8, 1L).otherwise(0L)).as("cq"))
        val tot = hist.agg(sum("cp").as("np"), sum("cq").as("nq"),
          count(lit(1)).as("nb"))
        val p = (col("cp") + 0.5) / (col("np") + lit(0.5) * col("nb"))
        val q = (col("cq") + 0.5) / (col("nq") + lit(0.5) * col("nb"))
        hist.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("n_bins"),
            sum(when(col("cp") === 0 || col("cq") === 0, 1L).otherwise(0L))
              .as("n_one_sided"),
            max("nq").as("n_base"), max("np").as("n_delta"),
            round(sum((p - q) * log(p / q)), 6).as("psi"))
      },
      Some(s"""WITH hist AS (SELECT CAST(floor($emL2 / 0.1) AS BIGINT) AS bin, CAST(sum(CASE WHEN vec_id % 10 >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS cp, CAST(sum(CASE WHEN vec_id % 10 < 8 THEN 1 ELSE 0 END) AS BIGINT) AS cq FROM embeddings GROUP BY 1), tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cq) AS BIGINT) AS nq, count(*) AS nb FROM hist) SELECT count(*) AS n_bins, CAST(sum(CASE WHEN cp = 0 OR cq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_one_sided, max(nq) AS n_base, max(np) AS n_delta, round(sum(((cp + 0.5) / (np + 0.5 * nb) - (cq + 0.5) / (nq + 0.5 * nb)) * ln(((cp + 0.5) / (np + 0.5 * nb)) / ((cq + 0.5) / (nq + 0.5 * nb)))), 6) AS psi FROM hist CROSS JOIN tot"""),
      "E3/E4 ext: embedding-norm PSI drift — delta batch vs indexed base, smoothed one-sided bins"))
}
