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

  test("unsupported format is rejected") {
    val df = Seq((1, "a")).toDF("id", "n")
    intercept[IllegalArgumentException] {
      FileSink.write(df, "/tmp/x", "t", "xml")
    }
  }
}
