package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

class PipelineMainSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(out: String, datasets: Seq[String], format: String = "jsonl") =
    PipelineMain.Config(from = "2024-01-01", to = "2024-01-03",
      output = out, format = format, datasets = datasets)

  test("CLI defaults mirror the reference") {
    val c = PipelineMain.parseArgs(Array.empty)
    assert(c.from === "yesterday" && c.to === "yesterday")
    assert(c.format === "csv" && c.datasets === Seq("entries"))
    assert(c.output === "./timecamp_data")
  }

  test("invalid dataset is rejected with the available list") {
    val out = Files.createTempDirectory("pipe").toString
    val e = intercept[IllegalArgumentException] {
      PipelineMain.run(spark, cfg(out, Seq("entries", "nope")))
    }
    assert(e.getMessage.contains("Invalid datasets: nope"))
    assert(e.getMessage.contains("entries, tasks, computer_activities"))
  }

  test("full pipeline run: all five datasets land with reference transforms") {
    val out = Files.createTempDirectory("pipe").toString
    val counts = PipelineMain.run(spark, cfg(out,
      PipelineMain.AvailableDatasets))
    assert(counts("entries") === 5)
    assert(counts("tasks") === 3)
    assert(counts("users") === 2)
    // 1 ENABLED user × 3 dates: the activity fan-out follows the users
    // endpoint's is_enabled flags (reference :440-445) — stub user 2 is
    // disabled, so its activities are not fetched
    assert(counts("computer_activities") === 3)

    val entries = graft.sources.FileSink.read(spark, out, "entries", "jsonl")
    // tags: JSON string or absent-when-empty (reference yields NULL)
    val tagged = entries.where(col("id") === 100).select("tags").as[String].head
    assert(tagged === """["tag0","x"]""")

    val tasks = graft.sources.FileSink.read(spark, out, "tasks", "jsonl")
    assert(tasks.columns.toSet.intersect(Set("users", "perms")).isEmpty)
    val crumb = tasks.where(col("task_id") === "t2")
      .select("breadcrumb").as[String].head
    assert(crumb === "Root A / Child B")
    assert(tasks.where(col("task_id") === "t2")
      .select("task_level_2").as[String].head === "Child B")

    val users = graft.sources.FileSink.read(spark, out, "users", "jsonl")
    val u2 = users.where(col("user_id") === "2").head
    assert(u2.getAs[Boolean]("is_enabled") === false) // '1' → disabled
    val u1 = users.where(col("user_id") === "1").head
    assert(u1.getAs[Boolean]("is_enabled") === true) // missing → enabled
    assert(u1.getAs[String]("group_breadcrumb") === "Org / Eng")

    val apps = graft.sources.FileSink.read(spark, out, "application_names", "jsonl")
    // id 1000 has blank full_name → falls back to aditional_info
    assert(apps.where(col("application_id") === "1000")
      .select("name").as[String].head === "Info 1000")
    assert(apps.count() === counts("application_names"))
    // category decode uses the reference's verbatim id→name table
    // (dlt_fetch_timecamp.py:111-133): "0"→No category, "1"→Office, ...
    val cats = apps.select("application_id", "category_name").as[(String, String)]
      .collect().toMap
    assert(cats("1000") === "No category")
    assert(cats("1001") === "Office")
    assert(cats("1002") === "Developer Tools")
  }

  test("TimeCampConfig.fromEnv: reference defaults and env precedence") {
    import graft.sources.TimeCampConfig
    val missing = java.nio.file.Paths.get("/nonexistent/.env")
    // no env, no .env → the reference's defaults (common/utils.py:19-26)
    val d = TimeCampConfig.fromEnv(Map.empty, missing)
    assert(d === TimeCampConfig("", "app.timecamp.com", 0))
    assert(d.baseUrl === "https://app.timecamp.com/third_party/api")
    // process env supplies the values
    val fromProc = TimeCampConfig.fromEnv(Map(
      "TIMECAMP_API_KEY" -> "k1", "TIMECAMP_ROOT_GROUP_ID" -> "42"), missing)
    assert(fromProc.apiKey === "k1" && fromProc.rootGroupId === 42)
    assert(fromProc.headers("Authorization") === "Bearer k1")
    // .env file OVERRIDES the process env (load_dotenv(override=True))
    val dir = Files.createTempDirectory("dotenv")
    val dotenv = dir.resolve(".env")
    java.nio.file.Files.writeString(dotenv,
      """# comment line
        |export TIMECAMP_API_KEY="k2"
        |TIMECAMP_DOMAIN='eu.timecamp.com'
        |TIMECAMP_ROOT_GROUP_ID=7
        |""".stripMargin)
    val c = TimeCampConfig.fromEnv(Map(
      "TIMECAMP_API_KEY" -> "k1", "TIMECAMP_ROOT_GROUP_ID" -> "42"), dotenv)
    assert(c === TimeCampConfig("k2", "eu.timecamp.com", 7))
  }

  test("--sink bigquery routes every dataset through the BigQuery sink") {
    import graft.sources.BigQuerySink
    var written = Vector.empty[(String, Long)]
    val bq = BigQuerySink(saver = (df, opts, mode) => {
      assert(mode === "overwrite")
      written :+= (opts("table") -> df.count())
    })
    val counts = PipelineMain.run(spark,
      cfg("proj.analytics", Seq("entries", "tasks")).copy(sink = "bigquery"),
      sinkOverride = Some(bq))
    assert(written.toMap === Map(
      "proj.analytics.entries" -> 5L, "proj.analytics.tasks" -> 3L))
    assert(counts === Map("entries" -> 5L, "tasks" -> 3L))
    // unknown sink is rejected with the available list
    val e = intercept[IllegalArgumentException] {
      PipelineMain.run(spark, cfg("x", Seq("entries")).copy(sink = "kafka"))
    }
    assert(e.getMessage.contains("unknown sink"))
  }

  test("--sink bucketed writes each dataset bucketed on its distribution key") {
    val out = java.nio.file.Files.createTempDirectory("tc_bucketed").toString
    val sink = graft.sources.BucketedSink(8, Seq("id"), tablePrefix = "tc")
    val entriesCat = sink.catalogName(out, "entries")
    val tasksCat = sink.catalogName(out, "tasks")
    try {
      val counts = PipelineMain.run(spark,
        cfg(out, Seq("entries", "tasks")).copy(sink = "bucketed"))
      assert(counts === Map("entries" -> 5L, "tasks" -> 3L))
      // catalog keeps the bucket spec; data round-trips
      assert(spark.table(entriesCat).count() === 5L)
      val ddl = spark.sql(s"SHOW CREATE TABLE $entriesCat").head().getString(0)
      assert(ddl.contains("CLUSTERED BY (id)") && ddl.contains("8 BUCKETS"), ddl)
      val ddlTasks = spark.sql(s"SHOW CREATE TABLE $tasksCat").head().getString(0)
      assert(ddlTasks.contains("CLUSTERED BY (task_id)"), ddlTasks)
    } finally Seq(entriesCat, tasksCat).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("user settings parser handles both reference wire shapes") {
    // LIST format (common/api.py:218-222): flat entries with camelCase
    // userId — numeric or string — matched per requested id
    val list =
      """[{"userId": 2, "name": "disabled_user", "value": "1"},
        | {"userId": 3, "name": "other_setting", "value": "x"}]""".stripMargin
    assert(PipelineMain.parseUserSettings(list, Seq("1", "2", "3"),
      "disabled_user") === Seq("1" -> null, "2" -> "1", "3" -> null))
    // DICT format (common/api.py:203-216): object keyed by user_id,
    // values are lists of {name, value}
    val dict =
      """{"2": [{"name": "disabled_user", "value": "1"},
        |       {"name": "other_setting", "value": "y"}],
        | "3": [{"name": "other_setting", "value": "z"}]}""".stripMargin
    assert(PipelineMain.parseUserSettings(dict, Seq("1", "2", "3"),
      "disabled_user") === Seq("1" -> null, "2" -> "1", "3" -> null))
    // degenerate bodies read as all-enabled, never throw
    assert(PipelineMain.parseUserSettings("null", Seq("1"), "disabled_user")
      === Seq("1" -> null))
    assert(PipelineMain.parseUserSettings("{}", Seq("1"), "disabled_user")
      === Seq("1" -> null))
    assert(PipelineMain.parseUserSettings("[]", Seq("1"), "disabled_user")
      === Seq("1" -> null))
  }

  test("--compact-stores maintenance CLI: ingest 3 batches, compact via " +
    "the CLI, fold batch 4 — outputs identical to the never-compacted " +
    "sequence") {
    import spark.implicits._
    def doc(i: Int): String =
      s"the alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i " +
        s"hotel$i india$i juliet$i"
    val bench = Seq((1L, "benchmark sentence for the winnow store fixture"))
      .toDF("doc_id", "text")
    val ws = graft.ops.Text.winnowStore(bench, "doc_id", "text")
    val batches = Seq(
      Seq((100L, doc(0), "s1"), (101L, doc(1), "s1")),
      Seq((200L, doc(0), "s2"), (201L, doc(2), "s2")), // 200 dups 100
      Seq((300L, doc(3), "s1"), (301L, doc(4), "s3")),
      Seq((400L, doc(1), "s3"), (401L, doc(5), "s2"))) // 400 dups 101
    val rootA = Files.createTempDirectory("cstore_cli").toString
    val rootB = Files.createTempDirectory("cstore_plain").toString
    def fold(root: String, b: Seq[(Long, String, String)]): Unit =
      graft.streaming.EventStream.curateFoldBatch(
        b.toDF("doc_id", "text", "source"), ws, root, "doc_id", "text",
        "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
        numShards = 2)
    batches.take(3).foreach { b => fold(rootA, b); fold(rootB, b) }

    // the CLI path end to end: parseArgs -> maintenance mode
    val c = PipelineMain.parseArgs(Array("--compact-stores", rootA))
    assert(c.compactStores === Some(rootA) && c.compactIvfPq === None)
    PipelineMain.runMaintenance(spark, c)
    val fs = new org.apache.hadoop.fs.Path(rootA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"$rootA/digests/b=*")).length === 1, "append dirs folded into one")

    fold(rootA, batches(3)); fold(rootB, batches(3))
    def outOf(root: String) = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(outOf(rootA) === outOf(rootB),
      "fold-after-compact must equal the uncompacted sequence")
    assert(!outOf(rootA).contains(400L), "cross-batch dup blocked " +
      "through the compacted store")
    assert(spark.read.parquet(s"$rootA/digests").count() ===
      spark.read.parquet(s"$rootB/digests").count())
  }

  test("--compact-ivfpq maintenance CLI: parse, validate, and rewrite " +
    "the artifact to a new table with identical probe results") {
    import spark.implicits._
    import graft.ops.Similarity
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5) / 5.0f))
    }.toDF("vec_id", "embedding")
    val wh = Files.createTempDirectory("ivfpq_cli").toString
    val model = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, ks = 4, iters = 1)
    val cents = Similarity.ivfPqBuild(vecs, "vec_id", "embedding", 2,
      model, 4, wh, "st")
    def probe(table: String) = Similarity.ivfPqProbe(vecs.limit(3),
      Similarity.ivfAssigned(spark, wh, table, "ivfpq"),
      "vec_id", "embedding", 3, cents, model)
      .collect().map(_.toString).sorted.toSeq
    val before = probe("st")

    val c = PipelineMain.parseArgs(
      Array("--compact-ivfpq", s"$wh:st:st_c:4"))
    PipelineMain.runMaintenance(spark, c)
    val after = probe("st_c")
    assert(after === before, "compacted table must probe identically")

    // malformed specs fail loudly, from==to enforced by the library
    intercept[IllegalArgumentException](PipelineMain.runMaintenance(spark,
      PipelineMain.parseArgs(Array("--compact-ivfpq", "a:b:c"))))
    intercept[IllegalArgumentException](PipelineMain.runMaintenance(spark,
      PipelineMain.parseArgs(Array("--compact-ivfpq", "a:b:c:x"))))
    intercept[IllegalArgumentException](PipelineMain.runMaintenance(spark,
      PipelineMain.parseArgs(Array("--compact-ivfpq", s"$wh:st:st:4"))))
  }
}
