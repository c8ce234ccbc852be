package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The Sink seam: FileSink and the BigQuery-shaped sink behind one
  * `write(df, target, table, format)` signature. The BigQuery saver is
  * injected (the connector jar is not on this classpath), so these specs
  * exercise the full option-building + mode wiring offline and round-trip
  * the frame through a recording saver, FileSinkSpec-style.
  */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")

  test("BigQuerySink assembles the public connector option surface") {
    val bq = BigQuerySink(
      writeMethod = "indirect",
      temporaryGcsBucket = Some("staging-bkt"),
      partitionField = Some("date"),
      clusteringFields = Seq("user_id", "task_id"),
      saver = (_, _, _) => ())
    val opts = bq.options("proj.analytics", "entries")
    assert(opts("table") === "proj.analytics.entries")
    assert(opts("writeMethod") === "indirect")
    assert(opts("temporaryGcsBucket") === "staging-bkt")
    assert(opts("partitionField") === "date")
    assert(opts("clusteredFields") === "user_id,task_id")
  }

  test("writeMethod × temporaryGcsBucket combinations validate BOTH " +
    "directions: indirect requires the bucket, direct forbids it") {
    assert(BigQuerySink().options("p.d", "t") ===
      Map("table" -> "p.d.t", "writeMethod" -> "direct"))
    // indirect stages through GCS — no bucket is an unrunnable config
    val e = intercept[IllegalArgumentException] {
      BigQuerySink(writeMethod = "indirect", saver = (_, _, _) => ())
    }
    assert(e.getMessage.contains("temporaryGcsBucket"))
    // direct streams via the Storage Write API — a bucket means the
    // caller expected staging semantics the direct path silently skips
    val e2 = intercept[IllegalArgumentException] {
      BigQuerySink(temporaryGcsBucket = Some("stray-bkt"),
        saver = (_, _, _) => ())
    }
    assert(e2.getMessage.contains("direct"))
    intercept[IllegalArgumentException] {
      BigQuerySink(writeMethod = "streaming", saver = (_, _, _) => ())
    }
  }

  test("RECORDED CONNECTOR SPEC: every option BigQuerySink can emit is an " +
    "exact key of the public spark-bigquery-connector surface, with the " +
    "documented value shapes — the seam cannot drift from the connector " +
    "it targets") {
    // Recorded from the public GoogleCloudDataproc/spark-bigquery-connector
    // README (the jar itself is not available in this offline build):
    //   table               "project.dataset.table" dotted reference
    //   writeMethod         "direct" (Storage Write API, per-executor
    //                       streams) | "indirect" (GCS staging + load job)
    //   temporaryGcsBucket  bucket NAME (no gs:// scheme); REQUIRED for
    //                       indirect, FORBIDDEN for direct (a bucket on
    //                       the direct path signals a config mixup —
    //                       rejected at construction)
    //   partitionField      a single column name
    //   clusteredFields     comma-separated column names, AT MOST 4
    //                       (BigQuery's clustering limit)
    // A key rename here must be a CONSCIOUS act against the connector
    // docs, never a refactor side-effect: the saver is injected in specs,
    // so nothing else offline would catch an option the real jar ignores.
    val recordedKeys = Set(
      "table", "writeMethod", "temporaryGcsBucket", "partitionField",
      "clusteredFields")
    val dottedTable = """[^.\s]+\.[^.\s]+\.[^.\s]+""".r

    def check(sink: BigQuerySink, target: String, table: String): Unit = {
      val opts = sink.options(target, table)
      val unknown = opts.keySet.diff(recordedKeys)
      assert(unknown.isEmpty,
        s"options not in the recorded connector spec: $unknown")
      assert(dottedTable.matches(opts("table")),
        s"table must be the dotted project.dataset.table form: ${opts("table")}")
      assert(Set("direct", "indirect").contains(opts("writeMethod")))
      opts.get("temporaryGcsBucket").foreach(b =>
        assert(!b.contains("://"), s"bucket NAME expected, got URI: $b"))
      opts.get("clusteredFields").foreach { cf =>
        val fields = cf.split(",")
        assert(fields.length <= 4 && fields.forall(_.nonEmpty), cf)
      }
    }
    // the full surface, both write methods
    check(BigQuerySink(saver = (_, _, _) => ()), "proj.ds", "entries")
    check(BigQuerySink(
      writeMethod = "indirect", temporaryGcsBucket = Some("stage-bkt"),
      partitionField = Some("date"),
      clusteringFields = Seq("user_id", "task_id", "group_id", "app_id"),
      saver = (_, _, _) => ()), "proj.ds", "entries")
    // shapes the connector would reject are refused at CONSTRUCTION, not
    // discovered in production: a 5th clustering field breaches
    // BigQuery's documented limit
    val e = intercept[IllegalArgumentException] {
      BigQuerySink(
        clusteringFields = Seq("a", "b", "c", "d", "e"),
        saver = (_, _, _) => ())
    }
    assert(e.getMessage.contains("4"))
  }

  test("BigQuerySink round-trips through a recording saver") {
    val dir = Files.createTempDirectory("bqsink").toString
    var captured: (Map[String, String], String) = null
    val bq = BigQuerySink(saver = (df, opts, mode) => {
      captured = (opts, mode)
      df.write.mode("overwrite").parquet(s"$dir/${opts("table")}")
    })
    bq.write(sample, "proj.ds", "t", BigQuerySink.Format)
    assert(captured._1("table") === "proj.ds.t")
    assert(captured._2 === "overwrite")
    val back = spark.read.parquet(s"$dir/proj.ds.t")
    assert(back.count() === 2)
    assert(back.columns.sorted.toSeq === Seq("id", "name", "v"))
    // wrong format is rejected, not silently written
    intercept[IllegalArgumentException](bq.write(sample, "proj.ds", "t", "csv"))
  }

  test("BucketedSink round-trips with the bucket spec intact") {
    val dir = Files.createTempDirectory("bucketsink").toString
    val sink = BucketedSink(numBuckets = 4, bucketCols = Seq("id"),
      sortCols = Seq("id"), tablePrefix = "sinkspec")
    try {
      sink.write(sample, dir, "t", "parquet")
      val back = sink.read(spark, dir, "t")
      assert(back.orderBy("id").collect().toSeq ===
        sample.orderBy("id").collect().toSeq)
      // the catalog keeps the bucket spec (this is what makes later joins
      // shuffle-free — a bare path read would drop it)
      val ddl = spark.sql(s"SHOW CREATE TABLE ${sink.catalogName(dir, "t")}")
        .head().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"), ddl)
      // non-parquet and empty bucket cols are rejected
      intercept[IllegalArgumentException](sink.write(sample, dir, "t", "csv"))
      intercept[IllegalArgumentException](BucketedSink(4, Nil))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${sink.catalogName(dir, "t")}")
  }

  test("BucketedSink append: batch rows land under the same spec; a " +
    "mismatched spec fails at analysis instead of mixing layouts") {
    val dir = Files.createTempDirectory("bucketappend").toString
    val sink = BucketedSink(numBuckets = 4, bucketCols = Seq("id"),
      sortCols = Seq("id"), tablePrefix = "sinkspec")
    try {
      sink.write(sample, dir, "t", "parquet")
      val batch = sample.withColumn("id",
        org.apache.spark.sql.functions.col("id") + 1000)
      sink.append(batch, dir, "t")
      val back = sink.read(spark, dir, "t")
      assert(back.count() === sample.count() * 2)
      // the spec survives the append — SHOW CREATE still carries it
      val ddl = spark.sql(s"SHOW CREATE TABLE ${sink.catalogName(dir, "t")}")
        .head().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"), ddl)
      // appending under a DIFFERENT bucket count must fail loudly — two
      // hash layouts in one table silently corrupt every co-located join
      val wrong = BucketedSink(numBuckets = 8, bucketCols = Seq("id"),
        sortCols = Seq("id"), tablePrefix = "sinkspec")
      intercept[org.apache.spark.sql.AnalysisException](
        wrong.append(batch, dir, "t"))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${sink.catalogName(dir, "t")}")
  }

  test("BucketedSink fresh-session contract: a lost catalog entry is " +
    "re-registered over the existing files, bucket spec intact") {
    // The data files under target/table are durable; the BUCKET SPEC lives
    // only in the session catalog (Spark cannot record it in a bare path
    // write). With an ephemeral metastore a new JVM loses the entry — this
    // pins the documented recovery: CREATE TABLE ... USING parquet
    // CLUSTERED BY ... LOCATION over the files, no data rewrite.
    val dir = Files.createTempDirectory("bucketsink_fresh").toString
    val sink = BucketedSink(numBuckets = 4, bucketCols = Seq("id"),
      sortCols = Seq("id"), tablePrefix = "sinkspec3")
    val name = sink.catalogName(dir, "t")
    try {
      sink.write(sample, dir, "t", "parquet")
      // simulate the fresh ephemeral-metastore session: entry gone,
      // files still on disk
      spark.sql(s"DROP TABLE $name")
      intercept[org.apache.spark.sql.AnalysisException](
        sink.read(spark, dir, "t").collect())
      assert(Files.list(java.nio.file.Paths.get(s"$dir/t")).count() > 0)
      // documented re-registration path (no data rewrite — LOCATION points
      // at the sink's files; schema/bucketing restated in DDL)
      spark.sql(
        s"""CREATE TABLE $name (id BIGINT, name STRING, v DOUBLE)
           |USING parquet
           |CLUSTERED BY (id) SORTED BY (id) INTO 4 BUCKETS
           |LOCATION '$dir/t'""".stripMargin)
      val back = sink.read(spark, dir, "t")
      assert(back.orderBy("id").collect().toSeq ===
        sample.orderBy("id").collect().toSeq)
      val ddl = spark.sql(s"SHOW CREATE TABLE $name").head().getString(0)
      assert(ddl.contains("CLUSTERED BY") && ddl.contains("4 BUCKETS"), ddl)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("same table name written to two targets keeps two catalog entries") {
    val dirA = Files.createTempDirectory("bucketsink_a").toString
    val dirB = Files.createTempDirectory("bucketsink_b").toString
    val sink = BucketedSink(numBuckets = 2, bucketCols = Seq("id"),
      tablePrefix = "sinkspec2")
    try {
      sink.write(sample, dirA, "t", "parquet")
      sink.write(sample.withColumn("v", $"v" * 10), dirB, "t", "parquet")
      // the second write must NOT repoint the first target's entry
      assert(sink.catalogName(dirA, "t") !== sink.catalogName(dirB, "t"))
      // ... while equivalent spellings of ONE directory must agree
      assert(sink.catalogName(s"$dirA/", "t") === sink.catalogName(dirA, "t"))
      assert(sink.catalogName(s"$dirA/./", "t") === sink.catalogName(dirA, "t"))
      assert(sink.catalogName("s3a://bkt/wh/", "t") ===
        sink.catalogName("s3a://bkt/wh", "t"))
      assert(sink.read(spark, dirA, "t").agg(Map("v" -> "sum"))
        .head().getDouble(0) === 4.0)
      assert(sink.read(spark, dirB, "t").agg(Map("v" -> "sum"))
        .head().getDouble(0) === 40.0)
    } finally Seq(dirA, dirB).foreach(d =>
      spark.sql(s"DROP TABLE IF EXISTS ${sink.catalogName(d, "t")}"))
  }

  test("FileSink and BigQuerySink are interchangeable behind the Sink trait") {
    val dir = Files.createTempDirectory("sinktrait").toString
    var bqTables = Vector.empty[String]
    val sinks: Seq[(Sink, String, String)] = Seq(
      (FileSink, dir, "parquet"),
      (BigQuerySink(saver = (_, opts, _) => bqTables :+= opts("table")),
        "p.d", BigQuerySink.Format))
    sinks.foreach { case (s, target, fmt) => s.write(sample, target, "t", fmt) }
    assert(FileSink.read(spark, dir, "t", "parquet").count() === 2)
    assert(bqTables === Vector("p.d.t"))
  }
}
