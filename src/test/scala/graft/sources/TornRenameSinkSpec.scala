package graft.sources

import graft.SparkSpec
import graft.streaming.TornRenameFileSystem
import org.apache.spark.sql.functions._

/** The batch sinks round-tripped through the `torn://` copy-then-delete
  * FileSystem (object-store rename semantics, no atomic directory move
  * anywhere) — the same harness TornRenameFsSpec drives the streaming
  * label store and reliable-mode checkpoints through. Each sink's write
  * path runs Spark's commit protocol (task temp dirs, staged partition
  * swaps, catalog-table commits) whose renames a real object store
  * executes as per-file copy manifests; these specs pin that nothing in
  * the sinks assumes rename atomicity the target can't provide.
  */
class TornRenameSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tornDir(prefix: String): String = {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.torn.impl", classOf[TornRenameFileSystem].getName)
    hconf.set("fs.torn.impl.disable.cache", "true")
    "torn://" + java.nio.file.Files.createTempDirectory(prefix).toString
  }

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    TornRenameFileSystem.crash.set(("", Int.MinValue)) // == NoCrash
  }

  test("FileSink's object-store branch commits through copy-then-delete " +
    "renames and reads back exactly") {
    val out = tornDir("graft_torn_filesink")
    val df = (1 to 50).map(i => (i.toLong, s"name $i")).toDF("id", "name")
    val before = TornRenameFileSystem.renames.get()
    FileSink.write(df, out, "t", "parquet")
    assert(TornRenameFileSystem.renames.get() > before,
      "write did not route through the torn FileSystem")
    val back = FileSink.read(spark, out, "t", "parquet")
    assert(back.count() === 50)
    assert(back.agg(sum("id")).head.getLong(0) === 1275)
  }

  test("BucketedSink commits its bucketed layout through copy-then-delete " +
    "renames; the bucket spec survives the object-store round trip") {
    val out = tornDir("graft_torn_bucketed")
    val sink = BucketedSink(4, Seq("k"), Seq("k"), tablePrefix = "torn")
    val df = (1 to 100).map(i => ((i % 10).toLong, i.toLong)).toDF("k", "v")
    val before = TornRenameFileSystem.renames.get()
    try {
      sink.write(df, out, "t", "parquet")
      assert(TornRenameFileSystem.renames.get() > before,
        "bucketed write did not route through the torn FileSystem")
      val back = sink.read(spark, out, "t")
      assert(back.count() === 100)
      assert(back.agg(sum("v")).head.getLong(0) === 5050)
      // the planner-visible bucket metadata survived the commit
      val desc = spark.sql(
        s"DESCRIBE FORMATTED ${sink.catalogName(out, "t")}")
        .collect().map(r => s"${r.get(0)}=${r.get(1)}").mkString("\n")
      assert(desc.contains("Num Buckets=4"), s"bucket spec lost:\n$desc")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${sink.catalogName(out, "t")}")
    }
  }

  test("IncrementalCache's dynamic partition upsert replaces exactly one " +
    "partition through copy-then-delete renames") {
    val out = tornDir("graft_torn_cache") + "/cache"
    val v1 = Seq(("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "b"))
      .toDF("date", "id", "v")
    IncrementalCache.upsertPartitions(v1, out, "date")
    val v2 = Seq(("2024-01-02", 2L, "B2"), ("2024-01-02", 3L, "b3"))
      .toDF("date", "id", "v")
    val before = TornRenameFileSystem.renames.get()
    IncrementalCache.upsertPartitions(v2, out, "date")
    assert(TornRenameFileSystem.renames.get() > before,
      "upsert did not route through the torn FileSystem")
    val back = spark.read.parquet(out)
      .select(col("date").cast("string"), col("id"), col("v"))
      .as[(String, Long, String)].collect().toSet
    assert(back === Set(
      ("2024-01-01", 1L, "a"), ("2024-01-02", 2L, "B2"),
      ("2024-01-02", 3L, "b3")))
  }
}
