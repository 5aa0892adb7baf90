package graft

/** Memo-cache lifecycle (round 11, verdict item #7): the engine's
  * memoized relations key on (applicationId, sfDir) and persist()
  * without unpersist — fine in the driver's one-shot protocol, but a
  * long-lived session sweeping many sfDirs accumulates pinned
  * relations. [[Tables.clearCaches]] must release ALL of them,
  * including the loop-internal localCheckpoint RDDs that
  * DataFrame.unpersist cannot reach, and consumers must rebuild
  * correctly afterwards.
  */
class CacheLifecycleSpec extends SparkSpecBase {

  test("clearCaches releases every pinned relation across a two-SF sweep") {
    // drive the cache-heavy families (tokens, shingles, minhash pairs,
    // cluster labels — each persists + localCheckpoints) at TWO sfDirs
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    val expected = SparkEntry.queries("q_dedup_cluster")(spark, sfA).collect()
    SparkEntry.queries("q_dedup_cluster")(spark, sfB).collect()
    SparkEntry.queries("q_contamination")(spark, sfA).collect()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the sweep should have pinned relations")
    Tables.clearCaches(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"pinned RDDs survived clearCaches: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(","))
    // consumers rebuild from parquet after the reset — same answer
    val rebuilt = SparkEntry.queries("q_dedup_cluster")(spark, sfA).collect()
    assert(rebuilt.toSeq == expected.toSeq,
      "post-clear rebuild diverged from the pre-clear answer")
  }
}
