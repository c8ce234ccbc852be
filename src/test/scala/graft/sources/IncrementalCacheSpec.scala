package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._

class IncrementalCacheSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("d", StringType), StructField("v", LongType)))

  test("loadOrEmpty: missing store yields an empty frame with the schema") {
    val df = IncrementalCache.loadOrEmpty(
      spark, "/tmp/graft-cache-does-not-exist", schema)
    assert(df.schema == schema && df.count() == 0)
  }

  test("loadOrEmpty: corrupt store yields empty instead of failing") {
    val dir = Files.createTempDirectory("graft-cache-corrupt")
    Files.writeString(dir.resolve("junk.parquet"), "this is not parquet")
    val df = IncrementalCache.loadOrEmpty(spark, dir.toString, schema)
    assert(df.schema == schema && df.count() == 0)
  }

  test("hotColdSplit at the 7-day threshold") {
    val today = java.time.LocalDate.parse("2024-03-15")
    val req = Seq("2024-03-14", "2024-03-08", "2024-03-07", "2024-01-01").toDF("d")
    val (hot, cold) = IncrementalCache.hotColdSplit(req, "d", today)
    assert(hot.as[String].collect().sorted.toSeq == Seq("2024-03-08", "2024-03-14"))
    assert(cold.as[String].collect().sorted.toSeq == Seq("2024-01-01", "2024-03-07"))
  }

  test("missingKeys is the anti-join of requested vs cache") {
    val req = Seq("a", "b", "c").toDF("k")
    val cache = Seq(("a", 1L), ("c", 3L)).toDF("k", "v")
    val missing = IncrementalCache.missingKeys(req, cache, "k")
    assert(missing.as[String].collect().toSeq == Seq("b"))
  }

  test("merge: fresh rows win, cached rows fill the rest") {
    val cache = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val fresh = Seq(("b", 20L), ("c", 30L)).toDF("k", "v")
    val out = IncrementalCache.merge(cache, fresh, "k")
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "b" -> 20L, "c" -> 30L))
  }

  test("streaming foreachBatch drives upsertPartitions (exactly the daily-refresh shape)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-cache-stream").toString + "/store"
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("d", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IncrementalCache.upsertPartitions(batch, dir, "d")
      }
      .outputMode("append").start()
    try {
      input.addData(("2024-01-01", 1L), ("2024-01-02", 2L))
      q.processAllAvailable()
      input.addData(("2024-01-02", 22L)) // late refresh of one date
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
        .select($"d".cast("string"), $"v").as[(String, Long)].collect().toMap
      assert(out == Map("2024-01-01" -> 1L, "2024-01-02" -> 22L))
    } finally q.stop()
  }

  test("upsertPartitions replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft-cache-upsert").toString + "/store"
    val day1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L)).toDF("d", "v")
    IncrementalCache.upsertPartitions(day1, dir, "d")
    val day2 = Seq(("2024-01-02", 22L)).toDF("d", "v") // refresh one date
    IncrementalCache.upsertPartitions(day2, dir, "d")
    val out = spark.read.parquet(dir)
      .select($"d".cast("string"), $"v").as[(String, Long)].collect().toMap
    assert(out == Map("2024-01-01" -> 1L, "2024-01-02" -> 22L))
  }
}
