package graft

import org.apache.spark.sql.functions._

/** Pins Bench.cleanupTransients' protection contract (ADVICE r7 medium):
  * a locally-checkpointed RDD that a registered cache entry still depends
  * on — the shared neardupClusters base's lineage terminates at
  * connectedComponents' final localCheckpoint — must SURVIVE cleanup (it
  * is the cached base's only recompute source), while a free-standing
  * per-query checkpoint must be dropped. Without the reachability walk,
  * a post-cleanup cache-partition recompute throws "checkpoint block not
  * found" and the bench records spurious -1 failures for healthy queries.
  */
class BenchCleanupSpec extends SparkSpecBase {

  private def ckptIds(): Set[Int] = {
    val probe = classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
    spark.sparkContext.getPersistentRDDs.values
      .filter(r => probe.invoke(r).asInstanceOf[Boolean]).map(_.id).toSet
  }

  test("cleanup drops free checkpoints but keeps ones a cache entry depends on") {
    val sp = spark
    import sp.implicits._
    val ids0 = ckptIds()
    // Transient: an eagerly checkpointed RDD nothing cached depends on
    // (the per-query state cleanup exists to reap).
    val transient = (1 to 100).toDF("x").localCheckpoint()
    val transientIds = ckptIds() -- ids0
    assert(transientIds.nonEmpty, "transient fixture produced no checkpointed RDD")
    // Protected: a cached DataFrame built ON TOP of a checkpointed one —
    // the exact shape connectedComponents hands to memo().cache().
    val base = (1 to 100).toDF("y").localCheckpoint()
    val baseIds = ckptIds() -- ids0 -- transientIds
    assert(baseIds.nonEmpty, "base fixture produced no checkpointed RDD")
    val cachedOnTop = base.groupBy((col("y") % 10).as("g")).agg(count(lit(1)).as("n")).cache()
    cachedOnTop.count() // materialize so the cache entry is registered

    Bench.cleanupTransients(sp)

    val after = ckptIds()
    assert((transientIds & after).isEmpty,
      s"free-standing checkpointed RDDs $transientIds survived cleanup")
    assert(baseIds.subsetOf(after),
      s"cache-reachable checkpointed RDDs ${baseIds -- after} were dropped — " +
        "the cached base lost its recompute source")
    // The semantic consequence: after a full eviction the cached result
    // must still RECOMPUTE, which walks through base's checkpoint blocks.
    cachedOnTop.unpersist(true)
    cachedOnTop.cache()
    assert(cachedOnTop.count() == 10L,
      "cached-on-checkpoint base failed to recompute after cleanup")
    cachedOnTop.unpersist(true)
    base.unpersist(true)
    transient.unpersist(true)
  }
}
