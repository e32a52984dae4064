package graft.ml

import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, MinHashLSH, MinHashLSHModel, NGram, Word2Vec, Word2VecModel}
import org.apache.spark.ml.linalg.{SparseVector, Vector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** MLlib corpus stages over the documents table — the ml-pipeline
  * b-variants of the engine's hand-rolled text/dedup operators, for users
  * coming from the reference's MLlib-centric style (reference:
  * TfIdfCalculator.java:49-94 is the same tokenize→vectorize shape):
  *
  *  - NGram ↔ TextOps.wordShingles (identical space-joined output —
  *    cross-checked in CorpusMlSpec)
  *  - CountVectorizer ↔ the exact termFreq aggregation (q29)
  *  - MinHashLSH ↔ DedupOps minhash banding (q34)
  *  - Word2Vec: dense embeddings the ANN ops (AnnOps) can then index —
  *    the train-your-own-embeddings head of the similarity pipeline.
  *
  * All stages are seeded; fits are deterministic at fixed parallelism
  * (Word2Vec's HogWild updates are order-dependent across partitions, so
  * its VALUES are pinned only at numPartitions=1 — the spec asserts
  * geometry, not coordinates).
  */
object CorpusPipelines {

  val Seed = 42L

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))

  /** Space-joined word n-grams via ml.feature.NGram. */
  def ngrams(docs: DataFrame, n: Int): DataFrame =
    new NGram().setN(n).setInputCol("toks").setOutputCol("ngrams")
      .transform(tokenized(docs))
      .select(col("doc_id"), col("ngrams"))

  /** Term-count vectors over a deterministic vocabulary (CountVectorizer
    * orders its vocab by corpus frequency, ties broken arbitrarily by
    * partition order — so the MODEL's vocabulary array is exposed for the
    * spec to join counts back to terms).
    */
  def countVectorize(docs: DataFrame, vocabSize: Int): (CountVectorizerModel, DataFrame) = {
    val toks = tokenized(docs)
    val model = new CountVectorizer()
      .setInputCol("toks").setOutputCol("tf")
      .setVocabSize(vocabSize).setMinDF(1.0)
      .fit(toks)
    (model, model.transform(toks).select(col("doc_id"), col("tf")))
  }

  /** MinHashLSH near-dup candidate pairs: binarized term-presence vectors
    * → seeded hash tables → approxSimilarityJoin under a Jaccard-distance
    * threshold. The ml-layer twin of DedupOps.candidatePairs (band-bucket
    * equi-join): both generate candidates without an all-pairs scan.
    */
  def lshCandidates(docs: DataFrame, numTables: Int, maxJaccardDist: Double): DataFrame = {
    val (model, tf) = countVectorize(docs, vocabSize = 1 << 18)
    val binary = tf.select(col("doc_id"), udfBinarize(col("tf")).as("v"))
      .where(normNonZero(col("v")))
    val lsh = new MinHashLSH().setInputCol("v").setOutputCol("hashes")
      .setNumHashTables(numTables).setSeed(Seed)
    val fitted: MinHashLSHModel = lsh.fit(binary)
    fitted.approxSimilarityJoin(binary, binary, maxJaccardDist, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("a"),
        col("datasetB.doc_id").as("b"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .where(col("a") < col("b"))
  }

  /** Seeded Word2Vec embeddings (+ the model for findSynonyms probes). */
  def word2vec(docs: DataFrame, dim: Int, numPartitions: Int = 1): (Word2VecModel, DataFrame) = {
    val toks = tokenized(docs)
    val model = new Word2Vec()
      .setInputCol("toks").setOutputCol("embedding")
      .setVectorSize(dim).setMinCount(1).setSeed(Seed)
      .setNumPartitions(numPartitions)
      .fit(toks)
    (model, model.transform(toks).select(col("doc_id"), col("embedding")))
  }

  // MinHashLSH requires binary (term-presence) vectors; CountVectorizer
  // emits counts — clamp every stored value to 1.0 in sparse form.
  private val udfBinarize = udf { v: Vector =>
    val sv = v.toSparse
    new SparseVector(sv.size, sv.indices, Array.fill(sv.indices.length)(1.0)): Vector
  }
  private val normNonZero = udf { v: Vector => v.numNonzeros > 0 }
}
