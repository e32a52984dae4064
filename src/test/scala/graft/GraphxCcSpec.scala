package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Cross-engine check: DedupOps.connectedComponents (iterative DataFrame
  * min-label propagation) against GraphX's Pregel-based
  * connectedComponents on the same random graphs. Two independent
  * implementations agreeing on arbitrary topologies is a much stronger
  * contract than either alone; GraphX stays a TEST dependency — the
  * shipped operator remains pure DataFrame (Catalyst-optimizable,
  * AQE-replannable), which is the right call for a 100-TB dedup graph.
  */
class GraphxCcSpec extends SparkSpecBase {

  private def viaGraphx(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sc = spark.sparkContext
    val g = Graph.fromEdges(
      sc.parallelize(edges.map { case (a, b) => Edge(a, b, ()) }), ())
    // GraphX labels each component with its min vertex id — same
    // canonicalization DedupOps uses
    g.connectedComponents().vertices.collect().toMap
  }

  private def viaDataFrame(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.ops.DedupOps.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("DataFrame CC equals GraphX CC on random graphs") {
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(0L, 30L); b <- Gen.chooseNum(0L, 30L) if a != b
    } yield (a, b))
    val graphs = Iterator.from(0)
      .map(i => edgeGen(Gen.Parameters.default, org.scalacheck.rng.Seed(7L + i)))
      .collect { case Some(es) if es.nonEmpty => es }
      .take(4).toSeq
    for (es <- graphs)
      assert(viaDataFrame(es) == viaGraphx(es), s"edges=$es")
  }

  test("DataFrame CC equals GraphX CC on a long path (worst-case diameter)") {
    // a 24-node path exercises the propagation loop hardest (diameter =
    // edge count); maxIters must comfortably cover it
    val path = (0L until 24L).map(i => (i, i + 1))
    assert(viaDataFrame(path) == viaGraphx(path))
    // every node must collapse to label 0
    assert(viaDataFrame(path).values.toSet == Set(0L))
  }
}
