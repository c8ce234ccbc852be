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

  test("ratelimit.rps paces the AGGREGATE request rate across 8 parallel " +
    "partitions — no scan-start stampede (the reference's serial-pressure " +
    "assumption, restored for the executor fan-out)") {
    // counting stub: record each request's arrival nanos
    val arrivals = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val counting: TimeCampClient.Transport = (url, params) => {
      arrivals.add(System.nanoTime())
      stubTransport()(url, params)
    }
    TimeCampDataSource.registerTransport("stub-paced", counting)
    // 8 users × 1 chunk = 8 partitions; local[4] runs up to 4 at once.
    // 20 rps → 50 ms spacing → 8 requests span ≥ 350 ms. Unpaced, the
    // same scan issues its first 4 concurrently within single-digit ms.
    val df = spark.read.format("graft.sources.TimeCampDataSource")
      .option("users", (1 to 8).mkString(","))
      .option("from", "2024-01-01").option("to", "2024-01-03")
      .option("transport", "stub-paced")
      .option("ratelimit.rps", "20")
      .load()
    assert(df.rdd.getNumPartitions === 8)
    assert(df.count() === 24) // 8 users × 3 days — pacing changes no rows
    val ts = arrivals.toArray.map(_.asInstanceOf[java.lang.Long].longValue).sorted
    assert(ts.length === 8, s"expected 8 requests, saw ${ts.length}")
    val spanMs = (ts.last - ts.head) / 1e6
    // 7 inter-request gaps × 50 ms = 350 ms minimum; generous floor for
    // scheduler jitter (sleep only ever lengthens gaps, never shortens)
    assert(spanMs >= 300.0,
      f"8 paced requests spanned $spanMs%.0f ms — expected >= 300 ms at 20 rps")
    // every consecutive gap honors the interval (fixed-slot pacer, not
    // an average that lets bursts through), asserted at a
    // half-interval floor: sleep overshoot on request i inflates its
    // arrival and can compress the MEASURED gap to i+1 below the true
    // 50 ms slot spacing — but an unpaced burst reads ~0-2 ms, far under
    val gaps = ts.sliding(2).map(p => (p(1) - p(0)) / 1e6).toSeq
    assert(gaps.forall(_ >= 25.0),
      s"burst through the pacer: gaps ${gaps.map(g => f"$g%.1f").mkString(", ")} ms")
  }

  test("the throttled transport paces RETRIES too — each attempt is a " +
    "request against the API budget") {
    val arrivals = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    var calls = 0
    val flaky: TimeCampClient.Transport = (url, params) => {
      arrivals.add(System.nanoTime())
      calls += 1
      if (calls < 3) TimeCampClient.Response(429, """{"retry_after": 0}""")
      else TimeCampClient.Response(200, "[]")
    }
    val paced = RateLimiter.throttled("retry-budget-test", 20.0, flaky)
    val r = TimeCampClient.get(paced, sleep = _ => ())("/x", Map.empty)
    assert(r.status === 200)
    val ts = arrivals.toArray.map(_.asInstanceOf[java.lang.Long].longValue).sorted
    assert(ts.length === 3)
    // retry_after=0 and a no-op retry sleep: only the pacer spaces the
    // attempts, so both gaps must carry the 50 ms interval
    assert(ts.sliding(2).forall(p => (p(1) - p(0)) / 1e6 >= 25.0),
      "retry attempts bypassed the pacer")
  }

  test("one partition's 429 Retry-After cools down EVERY sibling thread " +
    "in the bucket — no further requests until the server-stated window " +
    "expires (the reference's serial pressure, shared across the fan-out)") {
    val arrivals = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var stormEndNanos = 0L
    val stormy: TimeCampClient.Transport = (_, _) => {
      arrivals.add(System.nanoTime())
      if (calls.incrementAndGet() == 1) {
        // the FIRST request (earliest pacer slot) draws the 429; the
        // cooldown the wrapper publishes starts from ~now
        stormEndNanos = System.nanoTime() + 1000000000L
        TimeCampClient.Response(429, "busy", retryAfterHeader = Some(1L))
      } else TimeCampClient.Response(200, "[]")
    }
    // 20 rps → 50 ms slots: threads 2..6 hold slots 50-250 ms after the
    // first, all well inside the 1 s cooldown — unshared, each would
    // fire into the storm; shared, every one must forfeit and re-reserve
    val paced = RateLimiter.throttled("cooldown-shared-test", 20.0, stormy)
    val threads = (1 to 6).map(_ => new Thread(() => {
      paced("/x", Map.empty); ()
    }))
    threads.foreach(_.start())
    threads.foreach(_.join(15000))
    val ts = arrivals.toArray.map(_.asInstanceOf[java.lang.Long].longValue).sorted
    assert(ts.length === 6, s"expected 6 requests, saw ${ts.length}")
    // zero requests between the 429 and cooldown expiry (small floor for
    // sleep-wakeup jitter; an unshared limiter would land 5 requests
    // 50-250 ms in)
    val after429 = ts.drop(1)
    assert(after429.forall(_ >= stormEndNanos - 50000000L),
      s"requests fired into the known storm: " +
        after429.map(t => f"${(t - ts.head) / 1e6}%.0f ms").mkString(", "))
  }
}
