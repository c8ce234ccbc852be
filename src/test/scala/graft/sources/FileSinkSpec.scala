package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class FileSinkSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"sink_$format").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    FileSink.write(df, dir, "t", format)
    val files = new java.io.File(dir).list().toSeq
    assert(files.nonEmpty && files.forall(_.matches(s"t\\.\\d{5}\\.$format")),
      s"layout mismatch: $files")
    val back = FileSink.read(spark, dir, "t", format)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "v"))
  }

  test("parquet round-trip with {table}.{id}.{ext} layout")(roundTrip("parquet"))
  test("jsonl round-trip with {table}.{id}.{ext} layout")(roundTrip("jsonl"))
  test("csv round-trip with {table}.{id}.{ext} layout")(roundTrip("csv"))

  test("PERMISSIVE jsonl ingest: corrupt lines quarantined, good rows survive") {
    // SURVEY §1.2: the reference relies on dlt's lenient normalize; our
    // ingest contract is PERMISSIVE mode + _corrupt_record quarantine.
    val dir = Files.createTempDirectory("permissive").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.00000.jsonl"),
      """{"id": 1, "name": "ok"}
        |{not json at all
        |{"id": 2, "name": "also ok"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    val df = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // corrupt-record column requires a materialized referenced plan
    assert(df.where(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      .count() === 2)
    assert(df.where(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
      .count() === 1)
    df.unpersist()
  }

  test("URI target (object-store path): per-table dir, no rename, round-trips") {
    val dir = "file://" + Files.createTempDirectory("sink_uri").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    FileSink.write(df, dir, "t", "jsonl")
    val back = FileSink.read(spark, dir, "t", "jsonl")
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq === Seq("id", "name"))
  }

  test("schema evolution: mergeSchema read spans old and new file versions") {
    val dir = Files.createTempDirectory("evolve").toString
    Seq((1L, "a")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old file → NULL
    assert(rows(1).getAs[Double]("score") === 9.5)
  }

  test("unsupported format is rejected") {
    val df = Seq((1, "a")).toDF("id", "n")
    intercept[IllegalArgumentException] {
      FileSink.write(df, "/tmp/x", "t", "xml")
    }
  }

  test("rewrite that SHRINKS the part count leaves no stale files for read to mix in") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_shrink").toString
    // first write: many parts
    FileSink.write((1 to 100).toDF("v").repartition(8), dir, "t", "csv")
    // second write of the same table: fewer rows, ONE part — Spark's
    // overwrite only clears the _tmp dir, so without the stale-file
    // sweep t.00001..t.00007.csv would survive and read() would return
    // the old rows unioned with the new
    FileSink.write(Seq(1001, 1002).toDF("v").coalesce(1), dir, "t", "csv")
    val back = FileSink.read(spark, dir, "t", "csv")
      .select(org.apache.spark.sql.functions.col("v").cast("int")).as[Int].collect().sorted
    assert(back.toSeq === Seq(1001, 1002),
      s"stale part files leaked into the rewrite: ${back.toSeq}")
  }
}
