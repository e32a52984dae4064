package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain DataFrames. Like
  * [[DedupOps.connectedComponents]], the operators here stay in the
  * DataFrame algebra (Catalyst-optimizable, AQE-replannable) instead of
  * dropping to a vertex-program engine — at corpus scale every iteration
  * is a keyed equi-join + aggregation, the shapes Spark already knows how
  * to shuffle, skew-split and spill. GraphX serves as the independent
  * cross-check in tests (GraphxPrSpec), not as the shipped path.
  */
object GraphOps {

  /** Fixed-iteration PageRank, GraphX `staticPageRank` convention:
    * every rank starts at 1.0 and each iteration recomputes ALL nodes as
    *
    *   rank = resetProb + (1 - resetProb) · Σ_incoming rank(src) / outdeg(src)
    *
    * then a FINAL normalization scales ranks to sum to the node count —
    * exactly what GraphX does since SPARK-18847 (sinks absorb mass, so
    * unnormalized static ranks depend on sink structure; the rescale
    * restores cross-graph comparability at the cost of one scalar agg,
    * broadcast back). Parallel edges count once each in both outdeg and
    * the message sum.
    *
    * Input: edges with `src`/`dst` (long). Output: (node, rank) for every
    * node appearing in any edge.
    *
    * Scale shape: per iteration ONE join of the edge list against the
    * rank table and one groupBy — partial aggregation sums contributions
    * map-side. Unlike connectedComponents, each round references the
    * previous ranks exactly ONCE, so lineage grows linearly (not 2^n)
    * and no checkpoint is needed — which also keeps runtime statistics
    * flowing, letting AQE broadcast the |V|-sized rank table against the
    * |E|-sized cached edge list instead of shuffling the edges every
    * round (at 100 TB, |V| ≪ |E| is exactly the broadcast-side split you
    * want).
    */
  def pageRank(edges: DataFrame, iters: Int = 10, resetProb: Double = 0.15)
      : DataFrame = {
    val withDeg = degreeEdges(edges).cache()
    val nodes = nodeList(edges).cache()
    try pageRankPrepared(withDeg, nodes, iters, resetProb)
    finally {
      // pageRankPrepared materializes its result eagerly (localCheckpoint)
      // before returning, so the caches have already served every read
      withDeg.unpersist()
      nodes.unpersist()
    }
  }

  /** Edge list joined with each source's out-degree — `(src, dst,
    * outdeg)` — the per-iteration probe side of [[pageRankPrepared]].
    * Graph construction is a once-per-corpus artifact: callers that run
    * PageRank repeatedly over the same graph (verify + bench passes)
    * should memoize/cache THIS (and [[nodeList]]) so the degree shuffle
    * is paid once, not per invocation.
    */
  def degreeEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
  }

  /** Distinct nodes appearing in any edge, as `(node)`. */
  def nodeList(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
  }

  /** PageRank over pre-built (ideally cached/memoized) [[degreeEdges]]
    * and [[nodeList]] inputs. Does NOT cache or unpersist its inputs —
    * lifecycle belongs to the caller, which lets a memoized graph serve
    * many invocations with zero rebuild cost.
    */
  def pageRankPrepared(withDeg: DataFrame, nodes: DataFrame,
      iters: Int = 10, resetProb: Double = 0.15): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    require(resetProb > 0 && resetProb < 1, s"resetProb in (0,1), got $resetProb")
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to iters) {
      // ONE join + ONE aggregation per round: contributions stream off
      // the cached edge list against the (small, AQE-broadcastable) rank
      // table, and the per-node zero rows folded into the SAME union feed
      // the aggregation in place of a second "carry the sink nodes" left
      // join — nodes with no incoming mass sum to 0 and land on
      // resetProb, identical semantics, one fewer join per iteration.
      val contrib = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(withDeg("dst").as("node"),
          (ranks("rank") / withDeg("outdeg")).as("c"))
      ranks = contrib
        .unionByName(nodes.select(col("node"), lit(0.0).as("c")))
        .groupBy("node")
        .agg((lit(resetProb) + lit(1 - resetProb) * sum("c")).as("rank"))
    }
    // Materialize the iterative lineage ONCE (eager checkpoint runs the
    // job here, while any caller-managed caches are live): the
    // normalization below references `ranks` twice (scalar agg +
    // rescale), which would otherwise re-execute all iterations.
    val preNorm = ranks.localCheckpoint(true)
    // GraphX-parity normalization: Σ rank = |V|. One tiny (1-row) agg
    // cross-joined back — a broadcast scalar, not a shuffle. The rescale
    // keeps the (rank · count) / sum association so the oracle can
    // reproduce it bit-for-bit.
    val scale = preNorm.agg(count(lit(1)).as("nv"), sum("rank").as("rsum"))
    preNorm.crossJoin(broadcast(scale))
      .select(col("node"), (col("rank") * col("nv") / col("rsum")).as("rank"))
  }
}
