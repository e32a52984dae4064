package graft

import org.apache.spark.sql.functions._

import graft.ml.CorpusPipelines
import graft.ops.{DedupOps, TextOps}

/** MLlib corpus stages (ml.CorpusPipelines) — each b-variant is checked
  * against the engine's own oracle-verified a-variant where semantics
  * coincide, and against geometric invariants where the fit is stochastic.
  */
class CorpusMlSpec extends SparkSpecBase {

  private lazy val docs =
    spark.read.parquet(s"$sf001/documents.parquet").limit(100).cache()

  test("NGram(2) equals TextOps.wordShingles(2) on every doc") {
    val viaMl = CorpusPipelines.ngrams(docs, 2)
    val viaOps = docs.select(col("doc_id"),
      TextOps.wordShingles(TextOps.tokens(col("text")), 2).as("ngrams"))
    val diff = viaMl.join(viaOps.withColumnRenamed("ngrams", "expected"), "doc_id")
      .where(col("ngrams") =!= col("expected"))
    assert(diff.count() == 0)
  }

  test("CountVectorizer counts equal the exact termFreq aggregation") {
    val (model, tf) = CorpusPipelines.countVectorize(docs, vocabSize = 1 << 16)
    val vocab = model.vocabulary
    // explode each sparse vector back to (doc_id, term, count) rows —
    // 100 docs, so driver-side expansion is fine in a spec
    import spark.implicits._
    val viaMl = tf.collect().toSeq.flatMap { r =>
      val sv = r.getAs[org.apache.spark.ml.linalg.Vector]("tf").toSparse
      sv.indices.zip(sv.values).map { case (i, c) =>
        (r.getLong(0), vocab(i), c.toLong) }
    }.toDF("doc_id", "term", "tf")
    val exact = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    assert(viaMl.count() == exact.count())
    assert(viaMl.join(exact, Seq("doc_id", "term", "tf"), "left_anti").count() == 0)
  }

  test("MinHashLSH candidates contain every true high-Jaccard pair") {
    // ground truth: exact 1-gram Jaccard >= 0.8 over distinct token sets
    val sets = docs.select(col("doc_id"),
      array_distinct(TextOps.tokens(col("text"))).as("s"))
    val truth = sets.as("x").join(sets.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.s"), col("y.s"))) * 1.0 /
          size(array_union(col("x.s"), col("y.s")))).as("j"))
      .where(col("j") >= 0.8)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = CorpusPipelines.lshCandidates(docs, numTables = 8, maxJaccardDist = 0.25)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.subsetOf(cand),
      s"LSH missed true near-dups: ${truth.diff(cand)}")
  }

  test("Word2Vec embeds every doc at the requested dimension") {
    val (model, emb) = CorpusPipelines.word2vec(docs, dim = 16)
    assert(emb.count() == docs.count())
    val dims = emb.collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector]("embedding").size).distinct.toSeq
    assert(dims == Seq(16))
    // synonyms of a frequent corpus word: k rows, self excluded, cosines in [-1, 1]
    val syn = model.findSynonyms("data", 5).collect()
    assert(syn.length == 5)
    assert(syn.forall(r => r.getString(0) != "data"))
    assert(syn.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("Word2Vec re-fit with the same seed is bit-stable at 1 partition") {
    val (_, e1) = CorpusPipelines.word2vec(docs, dim = 8)
    val (_, e2) = CorpusPipelines.word2vec(docs, dim = 8)
    val d = e1.withColumnRenamed("embedding", "ea")
      .join(e2.withColumnRenamed("embedding", "eb"), "doc_id")
      .where(col("ea") =!= col("eb"))
    assert(d.count() == 0)
  }
}
