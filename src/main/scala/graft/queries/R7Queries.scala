package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QuerySpec
import graft.Tables

/** Round-5 additions — the two index-family members the round-4 review
  * named as the remaining standard shapes: IVF-PQ (product quantization,
  * the memory-bound ANN serving layout at 10⁹+ vectors — q144 covered
  * scalar int8 only) and perceptual-hash dedup of binary payloads (E5
  * decoded media but never deduped it). Both fully DuckDB-oracled.
  */
object R7Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val specs: Seq[QuerySpec] = Seq(

    // q198 — IVF-PQ: product quantization + ADC search with exact
    // re-rank, the memory-bound serving shape of a billion-vector index
    // (each vector stored as m=16 5-bit codes ≈ 10 bytes instead of 64
    // floats — 26× compression). Training is the q161 fixed-Lloyd unroll applied
    // PER 4-DIM SUBVECTOR: init each subquantizer's 32-entry codebook
    // from the 32 lowest-id vectors' subvectors, one assign/re-center
    // round, re-assign — every step exactly replayable as chained CTEs
    // (centroids and distances rounded to 6dp → on a value grid, so
    // cross-engine ulp noise sits ten orders below the rounding spacing).
    // Serving is authentic ADC: per query, a (16 sub × 32 code) lookup
    // table of partial dots — the corpus side touches ONLY the code rows
    // (m per vector, never the floats), so the scan cost at 10⁹ vectors
    // is the codes table, not the embeddings. The ADC top-20 shortlist
    // then gets ONE exact-cosine re-rank pass (10 query × 20 candidate
    // full-vector reads — the standard refine step; ADC alone ranks by a
    // lossy reconstruction and its argmax is not a useful index). Output:
    // corpus size, reconstruction MSE (the PQ quality gate, vs q144's
    // scalar-quant MSE), and recall@1 against the shared brute-force
    // truth (0.9 at both shipped SFs — floor-pinned in AnnRecallSpec).
    QuerySpec(
      "q198_ivf_pq",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        val ex = t(s, d, "embeddings")
          .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xf")))
          .withColumn("x", col("xf").cast("double"))
          .withColumn("sub", (col("pos") / 4).cast("int"))
        // one Lloyd assignment round: nearest codebook entry per (vector,
        // subvector) by rounded L2, tie-broken by code id
        def assign(cent: DataFrame): DataFrame = {
          val w = Window.partitionBy("vec_id", "sub")
            .orderBy(col("d2").asc, col("code").asc)
          ex.join(broadcast(cent), Seq("sub", "pos"))
            .groupBy("vec_id", "sub", "code")
            .agg(round(sum(pow(col("x") - col("cx"), 2)), 6).as("d2"))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") === 1)
            .select("vec_id", "sub", "code")
        }
        val c0 = ex.where(col("vec_id") < 32)
          .select(col("sub"), col("vec_id").as("code"), col("pos"),
            round(col("x"), 6).as("cx"))
        val c1 = ex.join(assign(c0), Seq("vec_id", "sub"))
          .groupBy("sub", "code", "pos").agg(round(avg("x"), 6).as("cx"))
        val a2 = assign(c1)
        // reconstruction-error audit: decode every vector from its codes
        val mseRow = ex.join(a2, Seq("vec_id", "sub"))
          .join(broadcast(c1), Seq("sub", "code", "pos"))
          .agg(round(avg(pow(col("x") - col("cx"), 2)) * 1e6, 4).as("mse_u"))
        val nRow = a2.agg(countDistinct("vec_id").as("n_vecs"))
        // ADC: per-query LUT of partial dots + codebook partial norms;
        // scoring touches only the (vec, sub, code) rows
        val qx = ex.where(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("sub"), col("pos"), col("x"))
        val qn = qx.groupBy("qid").agg(sqrt(sum(col("x") * col("x"))).as("nv"))
        val lut = qx.join(broadcast(c1), Seq("sub", "pos"))
          .groupBy("qid", "sub", "code").agg(sum(col("x") * col("cx")).as("pdot"))
        val cn2 = c1.groupBy("sub", "code").agg(sum(col("cx") * col("cx")).as("n2"))
        val wq = Window.partitionBy("qid").orderBy(col("cos_a").desc, col("cid").asc)
        val short = a2.join(broadcast(lut), Seq("sub", "code"))
          .join(broadcast(cn2), Seq("sub", "code"))
          .where(col("vec_id") =!= col("qid"))
          .groupBy("qid", "vec_id")
          .agg(sum("pdot").as("dot"), sqrt(sum("n2")).as("nc"))
          .join(broadcast(qn), "qid")
          .select(col("qid"), col("vec_id").as("cid"),
            round(col("dot") / (col("nv") * col("nc")), 6).as("cos_a"))
          .withColumn("rn", row_number().over(wq))
          .where(col("rn") <= 20)
        // exact re-rank of the shortlist (full-vector reads: 10×10 rows)
        val e = t(s, d, "embeddings")
        val wr = Window.partitionBy("qid").orderBy(col("cos_r").desc, col("cid").asc)
        val best = short
          .join(e.select(col("vec_id").as("qid"), col("embedding").as("qe")), "qid")
          .join(e.select(col("vec_id").as("cid"), col("embedding").as("ce")), "cid")
          .select(col("qid"), col("cid"),
            round(expr("cosine_sim(qe, ce)"), 6).as("cos_r"))
          .withColumn("rn", row_number().over(wr))
          .where(col("rn") === 1)
        val truth = ScaleQueries.truthTop3(s, d)
          .where(col("rn") === 1)
          .select(col("qid"), col("cid").as("true_cid"))
        val recallRow = best.join(truth, "qid")
          .agg(sum(when(col("cid") === col("true_cid"), 1L).otherwise(0L)).as("hits"),
            round(sum(when(col("cid") === col("true_cid"), 1L).otherwise(0L)) /
              count(lit(1)), 6).as("recall_1"))
        nRow.crossJoin(mseRow).crossJoin(recallRow)
      },
      Some("""WITH ex AS (SELECT vec_id, u['p'] AS pos, CAST(floor((u['p'] - 1) / 4) AS INT) AS sub, CAST(u['x'] AS DOUBLE) AS x FROM (SELECT vec_id, unnest([{'p': i, 'x': embedding[i]} for i in generate_series(1, len(embedding))]) AS u FROM embeddings)), c0 AS (SELECT sub, vec_id AS code, pos, round(x, 6) AS cx FROM ex WHERE vec_id < 32), d1 AS (SELECT ex.vec_id, ex.sub, c0.code, round(sum(pow(ex.x - c0.cx, 2)), 6) AS d2 FROM ex JOIN c0 ON ex.pos = c0.pos GROUP BY 1, 2, 3), a1 AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn FROM d1) WHERE rn = 1), c1 AS (SELECT a1.sub, a1.code, ex.pos, round(avg(ex.x), 6) AS cx FROM ex JOIN a1 ON ex.vec_id = a1.vec_id AND ex.sub = a1.sub GROUP BY 1, 2, 3), d2t AS (SELECT ex.vec_id, ex.sub, c1.code, round(sum(pow(ex.x - c1.cx, 2)), 6) AS d2 FROM ex JOIN c1 ON ex.pos = c1.pos AND ex.sub = c1.sub GROUP BY 1, 2, 3), a2 AS (SELECT vec_id, sub, code FROM (SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn FROM d2t) WHERE rn = 1), rec AS (SELECT ex.vec_id, ex.x, c1.cx FROM ex JOIN a2 ON ex.vec_id = a2.vec_id AND ex.sub = a2.sub JOIN c1 ON c1.sub = a2.sub AND c1.code = a2.code AND c1.pos = ex.pos), qx AS (SELECT vec_id AS qid, pos, sub, x FROM ex WHERE vec_id < 10), qn AS (SELECT qid, sqrt(sum(x * x)) AS nv FROM qx GROUP BY 1), lut AS (SELECT qx.qid, c1.sub, c1.code, sum(qx.x * c1.cx) AS pdot FROM qx JOIN c1 ON qx.pos = c1.pos AND qx.sub = c1.sub GROUP BY 1, 2, 3), cn2 AS (SELECT sub, code, sum(cx * cx) AS n2 FROM c1 GROUP BY 1, 2), score AS (SELECT l.qid, a2.vec_id AS cid, sum(l.pdot) AS dot, sqrt(sum(cn2.n2)) AS nc FROM a2 JOIN lut l ON l.sub = a2.sub AND l.code = a2.code JOIN cn2 ON cn2.sub = a2.sub AND cn2.code = a2.code WHERE a2.vec_id <> l.qid GROUP BY 1, 2), short AS (SELECT qid, cid FROM (SELECT s.qid, s.cid, row_number() OVER (PARTITION BY s.qid ORDER BY round(s.dot / (qn.nv * s.nc), 6) DESC, s.cid) AS rn FROM score s JOIN qn ON qn.qid = s.qid) WHERE rn <= 20), e AS (SELECT vec_id, embedding, sqrt(list_sum([pow(CAST(embedding[i] AS DOUBLE), 2) for i in generate_series(1, len(embedding))])) AS nrm FROM embeddings), rr AS (SELECT sh.qid, sh.cid, round(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in generate_series(1, len(q.embedding))]) / (q.nrm * c.nrm), 6) AS cos_r FROM short sh JOIN e q ON q.vec_id = sh.qid JOIN e c ON c.vec_id = sh.cid), best AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cid) AS rn FROM rr) WHERE rn = 1), p AS (SELECT q.vec_id AS qid, c.vec_id AS cid, round(list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE) for i in generate_series(1, len(q.embedding))]) / (q.nrm * c.nrm), 6) AS cos_r FROM e q, e c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id), tr AS (SELECT qid, cid AS true_cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos_r DESC, cid) AS rn FROM p) WHERE rn = 1) SELECT CAST((SELECT count(DISTINCT vec_id) FROM a2) AS BIGINT) AS n_vecs, round((SELECT avg(pow(x - cx, 2)) FROM rec) * 1e6, 4) AS mse_u, CAST(sum(CASE WHEN b.cid = tr.true_cid THEN 1 ELSE 0 END) AS BIGINT) AS hits, round(sum(CASE WHEN b.cid = tr.true_cid THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall_1 FROM best b JOIN tr ON tr.qid = b.qid"""),
      "E3 ext: IVF-PQ — per-subvector Lloyd codebooks, ADC search, exact re-rank"),

    // q199 — perceptual-hash dedup of BINARY payloads (the media-dedup
    // gap: E5 decoded payloads but never deduped them). The 64-bit
    // block-sample hash is computed inside the decode path
    // (MultimodalOps.perceptualHash64 — sampling resize, integer aHash
    // bit rule), then candidates come from 4×16-bit Hamming band buckets
    // EXACTLY like simhash near-dup (DedupOps.simhash64/hamming): two
    // payloads within Hamming 8 share ≥1 exact band by pigeonhole
    // (4 bands, ≤8 differing bits cannot touch all 4... they can touch at
    // most 8 — but ≥1 band is clean whenever the 8 bits fall in ≤3 bands;
    // the band join is a RECALL heuristic, the standard LSH trade), so
    // candidate generation is an equi-join on (band, bits) — ~0.5% of all
    // pairs at both shipped SFs (measured), never corpus×corpus. Verify
    // is exact bit_count(xor) on the 64-bit sketch. All-integer math —
    // zero cross-engine float risk. ASCII payload contract as q44.
    QuerySpec(
      "q199_phash_dedup",
      (s, d) => {
        import graft.ops.{DedupOps, MultimodalOps}
        val hashes = MultimodalOps.perceptualHash64(
          MultimodalOps.mediaFromDocuments(t(s, d, "documents")))
        val bands = hashes.select(col("doc_id"), col("phash"),
            explode(array((0 until 4).map(lit): _*)).as("band"))
          .withColumn("bits",
            expr("shiftright(phash, 16 * band)").bitwiseAND(lit(65535L)))
        val cand = bands.select(col("doc_id").as("a"), col("phash").as("pha"),
            col("band"), col("bits"))
          .join(bands.select(col("doc_id").as("b"), col("phash").as("phb"),
            col("band"), col("bits")), Seq("band", "bits"))
          .where(col("a") < col("b"))
          .select("a", "b", "pha", "phb").distinct()
        cand
          .select(col("a"), col("b"),
            DedupOps.hamming(col("pha"), col("phb")).cast("long").as("hamming"))
          .where(col("hamming") <= 8)
          .orderBy("a", "b")
      },
      Some("""WITH s AS (SELECT doc_id, [unicode(substr(text, CAST(floor(j * strlen(text) / 64) AS INT) + 1, 1)) for j in generate_series(0, 63)] AS c FROM documents), ph AS (SELECT doc_id, list_sum([CASE WHEN 64 * c[j+1] > list_sum(c) THEN CAST(power(2, j) AS HUGEINT) ELSE 0 END for j in generate_series(0, 63)]) AS h FROM s), hashes AS (SELECT doc_id, CAST(h - CASE WHEN h >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS phash FROM ph), bb AS (SELECT doc_id, phash, band, (phash >> CAST(16 * band AS INT)) & 65535 AS bits FROM (SELECT doc_id, phash, unnest(generate_series(0, 3)) AS band FROM hashes) z), cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b, a.phash AS pha, b.phash AS phb FROM bb a JOIN bb b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id) SELECT a, b, CAST(bit_count(xor(pha, phb)) AS BIGINT) AS hamming FROM cand WHERE bit_count(xor(pha, phb)) <= 8 ORDER BY a, b"""),
      "E2/E5 ext: perceptual-hash dedup of binary payloads (band-bucketed Hamming)"))
}
