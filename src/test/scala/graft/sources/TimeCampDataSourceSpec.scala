package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeCampDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def stubTransport(
      failFor: Set[String] = Set.empty): TimeCampClient.Transport =
    (url, params) => {
      val user = params("user_id")
      if (failFor.contains(user))
        TimeCampClient.Response(500, "boom") // retried then thrown → skipped
      else {
        val dates = params.collect {
          case (k, v) if k.startsWith("dates[") => v
        }.toSeq.sorted
        val rows = dates.map { d =>
          s"""{"user_id":"$user","date":"$d","application_id":"app$user","duration":60}"""
        }
        TimeCampClient.Response(200, rows.mkString("[", ",", "]"))
      }
    }

  test("DSv2 scan plans one partition per (user, ≤20-date chunk) and reads rows") {
    TimeCampDataSource.registerTransport("stub-ok", stubTransport())
    val df = spark.read.format("graft.sources.TimeCampDataSource")
      .option("users", "7,8")
      .option("from", "2024-01-01").option("to", "2024-01-25") // 25 days → 2 chunks/user
      .option("transport", "stub-ok")
      .load()
    assert(df.rdd.getNumPartitions === 4) // 2 users × 2 date chunks
    val out = df.groupBy("user_id").agg(count(lit(1)).as("n"), sum("duration_seconds").as("s"))
      .as[(String, Long, Long)].collect().map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(out === Map("7" -> ((25L, 1500L)), "8" -> ((25L, 1500L))))
    assert(df.where(col("application_id") === "app7").count() === 25)
  }

  test("failed partitions skip-and-continue (reference warn semantics)") {
    // sleep-free stub: 500 responses exhaust retries immediately via the
    // injected no-op sleep? DSv2 path uses real Thread.sleep — use a fast
    // failing status that is NOT retryable instead.
    val fastFail: TimeCampClient.Transport = (url, params) =>
      if (params("user_id") == "1") TimeCampClient.Response(404, "nope")
      else stubTransport()(url, params)
    TimeCampDataSource.registerTransport("stub-fail", fastFail)
    val df = spark.read.format("graft.sources.TimeCampDataSource")
      .option("users", "1,2")
      .option("from", "2024-01-01").option("to", "2024-01-05")
      .option("transport", "stub-fail")
      .load()
    val users = df.select("user_id").distinct().as[String].collect().toSet
    assert(users === Set("2")) // user 1's partition skipped, scan succeeded
  }

  test("activity JSON parse tolerates missing optional fields") {
    val parsed = TimeCampDataSource.parseActivities(
      """[{"user_id":"5","date":"2024-01-01","duration":30},
         |{"user_id":"5","date":"2024-01-02","application_id":"a9"},
         |{"date":"2024-01-03"}]""".stripMargin)
    assert(parsed === Seq(
      ("5", "2024-01-01", None, Some(30L)),
      ("5", "2024-01-02", Some("a9"), None)))
  }

  test("activity JSON parse survives nested objects inside a record") {
    // a regex-bracket parse truncates the record at the inner '}' and
    // silently drops the fields after the nested object
    val parsed = TimeCampDataSource.parseActivities(
      """[{"user_id":"5","meta":{"os":"linux","tags":["a","b"]},
         |"date":"2024-01-01","application_id":"a1","duration":42},
         |{"user_id":"6","date":"2024-01-02",
         |"window":{"title":"x { y }"},"duration":7}]""".stripMargin)
    assert(parsed === Seq(
      ("5", "2024-01-01", Some("a1"), Some(42L)),
      ("6", "2024-01-02", None, Some(7L))))
  }

  test("activity JSON parse rejects malformed and non-array bodies") {
    assert(TimeCampDataSource.parseActivities("""{"error":"rate limit"}""") === Seq.empty)
    assert(TimeCampDataSource.parseActivities("""[{"user_id":"1",""") === Seq.empty)
    // nested-object values never satisfy scalar fields
    assert(TimeCampDataSource.parseActivities(
      """[{"user_id":{"id":1},"date":"2024-01-01"}]""") === Seq.empty)
  }
}
