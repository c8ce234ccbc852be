package graft

import scala.jdk.CollectionConverters._

/** The staged bench fixture for `q_dedup_clusters_incremental` memoizes
  * per (session, sfDir); entries for stopped sessions must not pin their
  * checkpointed frames for the JVM lifetime.
  */
class EntryFixtureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("incremental-cluster fixtures evict entries for stale sessions " +
    "and recompute on next access") {
    val run = SparkEntry.queries("q_dedup_clusters_incremental")
    assert(run(spark, dir).count() > 0)
    assert(SparkEntry.incrementalFixtures.keySet.asScala.exists(_._1 eq spark))

    // a second session over the same context gets its own entry
    val sessB = spark.newSession()
    sessB.conf.set("spark.sql.shuffle.partitions", "4")
    assert(run(sessB, dir).count() > 0)
    val keys = SparkEntry.incrementalFixtures.keySet.asScala.map(_._1).toSet
    assert(keys.exists(_ eq sessB) && keys.exists(_ eq spark))

    // purge with sessB marked stale (stopping it for real would stop the
    // suite-shared context — production wires the same mechanism to
    // sparkContext.isStopped, which every access re-checks)
    SparkEntry.purgeFixtures(_ eq sessB)
    val after = SparkEntry.incrementalFixtures.keySet.asScala.map(_._1).toSet
    assert(!after.exists(_ eq sessB), "stale session entry not evicted")
    assert(after.exists(_ eq spark), "live session entry wrongly evicted")

    // an evicted entry is not an error state: next access recomputes
    assert(run(sessB, dir).count() > 0)
    SparkEntry.purgeFixtures(_ eq sessB) // leave no cross-suite residue
  }
}
