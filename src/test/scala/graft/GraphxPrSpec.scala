package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.scalacheck.Gen

/** Cross-engine check for GraphOps.pageRank: the DataFrame implementation
  * against GraphX's staticPageRank (same convention: init 1.0, all nodes
  * recomputed each iteration, no dangling redistribution) on random
  * directed graphs. Same contract pattern as GraphxCcSpec — two
  * independent implementations agreeing on arbitrary topologies.
  */
class GraphxPrSpec extends SparkSpecBase {

  private def viaGraphx(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val g = Graph.fromEdges(
      spark.sparkContext.parallelize(edges.map { case (a, b) => Edge(a, b, ()) }), ())
    g.staticPageRank(iters).vertices.collect().toMap
  }

  private def viaDataFrame(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    import spark.implicits._
    graft.ops.GraphOps.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  private def assertClose(a: Map[Long, Double], b: Map[Long, Double], ctx: String): Unit = {
    assert(a.keySet == b.keySet, s"node sets differ: $ctx")
    for ((k, va) <- a) {
      val vb = b(k)
      assert(math.abs(va - vb) <= 1e-8 * math.max(1.0, math.abs(va)),
        s"rank($k): dataframe=$va graphx=$vb $ctx")
    }
  }

  test("DataFrame PageRank equals GraphX staticPageRank on random graphs") {
    val edgeGen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(0L, 20L); b <- Gen.chooseNum(0L, 20L) if a != b
    } yield (a, b))
    val graphs = Iterator.from(0)
      .map(i => edgeGen(Gen.Parameters.default, org.scalacheck.rng.Seed(11L + i)))
      .collect { case Some(es) if es.nonEmpty => es }
      .take(3).toSeq
    for (es <- graphs)
      assertClose(viaDataFrame(es, 5), viaGraphx(es, 5), s"edges=$es")
  }

  test("star graph concentrates rank on the hub; ranks normalize to |V|") {
    // directed star: every spoke points at the hub, hub points nowhere
    val star = (1L to 8L).map(i => (i, 0L))
    val pr = viaDataFrame(star, 3)
    // normalization contract: Σ rank = node count
    assert(math.abs(pr.values.sum - 9.0) < 1e-9)
    // pre-normalization the hub converges to 0.15 + 0.85·8·0.15 = 1.17
    // and each spoke to 0.15 — the hub/spoke RATIO survives the rescale
    assert(math.abs(pr(0L) / pr(1L) - 1.17 / 0.15) < 1e-9)
    assertClose(pr, viaGraphx(star, 3), "star")
  }
}
