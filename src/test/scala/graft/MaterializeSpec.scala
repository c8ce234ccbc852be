package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** The cluster-durability seam: every eager materialization in graft's
  * operators routes through [[Materialize.checkpoint]], and the conf must
  * select the strategy at runtime (local mode keeps localCheckpoint;
  * clusters switch to reliable checkpoint / replicated persist without
  * touching operator code).
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def frame() = (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "s")

  private def withMode[A](mode: Option[String])(body: => A): A = {
    mode.foreach(spark.conf.set(Materialize.ModeKey, _))
    try body
    finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
    }
  }

  test("default mode is local: lineage truncated, rows preserved") {
    withMode(None) {
      val out = Materialize.checkpoint(frame())
      // localCheckpoint replaces the plan with a LogicalRDD scan
      assert(out.queryExecution.analyzed.isInstanceOf[LogicalRDD])
      assert(out.count() === 100)
      assert(out.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) === 5050)
    }
  }

  test("reliable mode requires a dir, then writes checkpoint files to it") {
    withMode(Some("reliable")) {
      // no SparkContext checkpoint dir and no conf fallback → explicit error,
      // never a silent downgrade to unreplicated local blocks
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val e = intercept[IllegalStateException](Materialize.checkpoint(frame()))
        assert(e.getMessage.contains(Materialize.DirKey))
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      spark.conf.set(Materialize.DirKey, dir)
      val out = Materialize.checkpoint(frame())
      assert(out.queryExecution.analyzed.isInstanceOf[LogicalRDD])
      assert(out.count() === 100)
      // the fault-tolerant artifact exists where configured
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"expected checkpoint files under $dir")
    }
  }

  test("persist mode: 2x-replicated storage level requested, rows preserved") {
    withMode(Some("persist")) {
      val out = Materialize.checkpoint(frame())
      // local[4] has one block manager, so replication clamps to 1 at
      // runtime — the REQUESTED level is what the seam controls
      assert(out.storageLevel === StorageLevel.MEMORY_AND_DISK_2)
      assert(out.count() === 100)
      out.unpersist()
    }
  }

  test("unknown mode fails fast") {
    withMode(Some("banana")) {
      val e = intercept[IllegalArgumentException](Materialize.checkpoint(frame()))
      assert(e.getMessage.contains("banana"))
    }
  }

  test("an operator built on the seam honors the configured mode end-to-end") {
    // connectedComponents materializes through the seam; under reliable
    // mode its checkpoints land in the configured dir and results are
    // unchanged vs local mode.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val local = graft.ops.Dedup.connectedComponents(pairs).collect().toSet
    withMode(Some("reliable")) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cc").toString
      spark.conf.set(Materialize.DirKey, dir)
      val reliable = graft.ops.Dedup.connectedComponents(pairs).collect().toSet
      assert(reliable === local)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"expected operator checkpoints under $dir")
    }
  }
}
