package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a KMeans coarse quantizer
  * assigns every vector to a centroid cell; queries probe only their own
  * cell (nprobe=1 here; union more cells for higher recall). The index
  * build is one MLlib job; search is an equi-join on cell id — the same
  * scale shape as the LSH path (q38), with data-adaptive buckets instead
  * of data-oblivious hyperplanes.
  *
  * Not oracle-checkable (KMeans isn't expressible in the oracle dialect)
  * → registered rows-only (q60), semantics pinned by AnnSpec.
  */
object AnnOps {

  /** (vec_id, embedding, cell) with a deterministic seeded quantizer. */
  def ivfAssign(emb: DataFrame, k: Int, seed: Long): DataFrame = {
    val withVec = emb.withColumn("v", array_to_vector(col("embedding"))).cache()
    // Cached: fit makes one pass per iteration and would otherwise re-run
    // the parquet scan + array→vector conversion each time.
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("v")
      .setMaxIter(3).setInitMode("random") // coarse cells only — skip the
      // multi-pass k-means|| init; centroid quality ≪ assignment cost for
      // an nprobe-style coarse quantizer, so 3 Lloyd passes suffice
      .setPredictionCol("cell").fit(withVec)
    model.transform(withVec).drop("v")
  }

  private val ivfReg = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int, Long), DataFrame]

  /** Memoized index build per (session, corpus, k, seed): an ANN index is
    * a once-per-corpus artifact — every search (and every bench/verify
    * invocation) should pay lookup cost, not a fresh KMeans fit.
    */
  def ivfAssignCached(emb: DataFrame, corpusKey: String, k: Int, seed: Long): DataFrame =
    ivfReg.getOrElseUpdate((emb.sparkSession, corpusKey, k, seed),
      ivfAssign(emb, k, seed).cache())

  /** One-pass IVF-flat assignment: the k lowest-id vectors ARE the
    * centroids (a deterministic sample — fine for a coarse quantizer),
    * and every vector joins its argmax-cosine centroid in a single
    * broadcast pass. No iterations, no MLlib, fully oracle-expressible —
    * the scale path when index-build time matters more than cell balance.
    */
  def ivfAssignFlat(emb: DataFrame, k: Int): DataFrame =
    assignToCells(emb, emb.where(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce")))

  /** Assign arbitrary vectors to EXISTING centroids — the incremental
    * maintenance path (q190): a delta batch probes the persisted index's
    * cells without re-deriving the quantizer. One audited implementation
    * carries the oracle-critical convention (cosine rounded to 6dp,
    * ties to the lowest cent_id) for both the full build and the delta.
    *
    * @param cents (cent_id, ce) centroid table — broadcast-sized
    */
  def assignToCells(vectors: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(vectors.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("cos_c").desc, col("cent_id").asc)
    vectors.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        round(expr("cosine_sim(embedding, ce)"), 6).as("cos_c"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Top-1 same-cell neighbor per query vector, ranked by the fused
    * cosine_sim expression (rounded, id-tiebroken → deterministic).
    */
  def ivfTop1(assigned: DataFrame, queryPred: org.apache.spark.sql.Column): DataFrame = {
    graft.functions.CosineSimilarity.register(assigned.sparkSession)
    val q = assigned.where(queryPred)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos_r").desc, col("cid").asc)
    q.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("cell"),
        round(expr("cosine_sim(qe, embedding)"), 6).as("cos_r"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") === 1)
      .select("qid", "cid", "cell", "cos_r")
  }
}
