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

  test("prepare stages the fixture so a Bench-style scoped release " +
    "(unpersist everything registered after the snapshot) cannot " +
    "destroy it between rounds — the round-15 silent-regression shape") {
    val run = SparkEntry.queries("q_dedup_clusters_incremental")
    val sessC = spark.newSession()
    sessC.conf.set("spark.sql.shuffle.partitions", "4")
    SparkEntry.purgeFixtures(_ eq sessC)
    val baseline = sessC.sparkContext.getPersistentRDDs.keySet
    // prepare = Bench's untimed staging; fixture RDDs registered HERE
    SparkEntry.prepare(sessC, dir, Set("q_dedup_clusters_incremental"))
    assert(SparkEntry.incrementalFixtures.keySet.asScala.exists(_._1 eq sessC))
    val preexisting = sessC.sparkContext.getPersistentRDDs.keySet
    // round 1 runs the query, then the harness releases everything the
    // round registered (checkpoints inside connectedComponentsIncremental)
    assert(run(sessC, dir).count() > 0)
    sessC.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!preexisting.contains(id)) rdd.unpersist(blocking = true)
    }
    // round 2 must still succeed on the intact fixture: before the
    // prepare hook this threw on the truncated checkpoint lineage
    assert(run(sessC, dir).count() > 0)
    SparkEntry.purgeFixtures(_ eq sessC)
    // release every block this test staged, fixture included (hygiene)
    sessC.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!baseline.contains(id)) rdd.unpersist(blocking = true)
    }
  }
}
