package graft.sources

import scala.annotation.tailrec

/** Driver-side REST source layer, re-expressing the reference's client
  * (`common/api.py:20-425`) without any network dependency: the transport is
  * an injected function, so tests (and this offline environment) plug in a
  * stub while a production deployment plugs in an HTTP client.
  *
  * Semantics carried over from the reference:
  *  - retry: 5 attempts; retryable statuses {429,500,502,503,504}; delay =
  *    Retry-After header, then JSON `retry_after` body, else linear
  *    5s × attempt (`common/api.py:20-64`)
  *  - user-settings lookups batch 50 ids/request (`common/api.py:193-198`)
  *  - application details batch 100 ids/request (`common/api.py:326-345`)
  *  - computer activities: per-user fan-out × ≤20-date chunks, failed
  *    batches skipped with a warning (`common/api.py:226-324`)
  *
  * Scale note: fetches are driver-side by design (the API is the
  * bottleneck, not Spark); results land in `spark.createDataFrame` and all
  * downstream work is distributed. The per-(user, dateChunk) fan-out is the
  * unit a future DataSourceV2 connector would parallelize across executors.
  */
object TimeCampClient {

  final case class Response(status: Int, body: String,
      retryAfterHeader: Option[Long] = None)
  type Transport = (String, Map[String, String]) => Response

  val RetryableStatuses: Set[Int] = Set(429, 500, 502, 503, 504)
  val MaxAttempts = 5

  /** Parse `{"retry_after": N}` without a JSON dependency (driver-side,
    * trusted shape — mirrors `common/api.py:44-50`).
    */
  private[sources] def retryAfterFromBody(body: String): Option[Long] =
    """"retry_after"\s*:\s*(\d+)""".r
      .findFirstMatchIn(body).map(_.group(1).toLong)

  /** Retrying GET. `sleep` injected for testability. */
  def get(transport: Transport, sleep: Long => Unit = Thread.sleep)(
      url: String, params: Map[String, String]): Response = {
    @tailrec def attempt(n: Int): Response = {
      val r = transport(url, params)
      if (!RetryableStatuses.contains(r.status) || n >= MaxAttempts) r
      else {
        val delayMs = r.retryAfterHeader
          .orElse(retryAfterFromBody(r.body))
          .map(_ * 1000L)
          .getOrElse(5000L * n)
        PipelineLogger.active.warning(
          s"API request returned ${r.status}; retrying in ${delayMs / 1000.0} " +
            s"seconds (attempt ${n + 1}/$MaxAttempts)")
        sleep(delayMs)
        attempt(n + 1)
      }
    }
    val r = attempt(1)
    if (r.status >= 400)
      throw new RuntimeException(s"HTTP ${r.status} after retries: $url")
    r
  }

  /** Chunk ids into fixed-size request batches (50 for settings, 100 for
    * applications — asserted by the reference's own tests,
    * `tests/test_api.py:71-87`).
    */
  def batched[A](ids: Seq[A], batchSize: Int): Seq[Seq[A]] =
    ids.grouped(batchSize).toSeq

  /** Multi-format date parse + `yesterday` keyword
    * (`common/utils.py:28-51`): first format that parses wins.
    */
  def parseDateFlexible(s: String,
      today: java.time.LocalDate = java.time.LocalDate.now()): java.time.LocalDate = {
    if (s.trim.toLowerCase == "yesterday") return today.minusDays(1)
    val fmts = Seq("yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "dd-MM-yyyy", "MM-dd-yyyy")
    fmts.iterator.flatMap { f =>
      try Some(java.time.LocalDate.parse(s.trim,
        java.time.format.DateTimeFormatter.ofPattern(f)))
      catch { case _: Exception => None }
    }.nextOption().getOrElse(
      throw new IllegalArgumentException(s"unparseable date: $s"))
  }

  /** Calendar-month addition with day clamped to the target month's length
    * (`dlt_fetch_timecamp.py:165-171`; java.time already clamps).
    */
  def addMonthsClamped(d: java.time.LocalDate, months: Int): java.time.LocalDate =
    d.plusMonths(months)

  /** Split an inclusive date period into ≤`months`-calendar-month batches
    * (`dlt_fetch_timecamp.py:174-191`, `ENTRY_BATCH_MONTHS = 6`).
    */
  def periodBatches(from: java.time.LocalDate, to: java.time.LocalDate,
      months: Int = 6): Seq[(String, String)] = {
    require(months > 0, s"months must be positive, got $months")
    val out = Seq.newBuilder[(String, String)]
    var current = from
    while (!current.isAfter(to)) {
      val nextStart = addMonthsClamped(current, months)
      val batchEnd = Seq(nextStart.minusDays(1), to).min(
        Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
      out += ((current.toString, batchEnd.toString))
      current = batchEnd.plusDays(1)
    }
    out.result()
  }

  /** (user × ≤20-date-chunk) fan-out plan for activity fetches. */
  def activityBatches(userIds: Seq[String], dates: Seq[String],
      maxDates: Int = 20): Seq[(String, Seq[String])] =
    for {
      u <- userIds
      chunk <- dates.grouped(maxDates).toSeq
    } yield (u, chunk)

  /** Run a fetch per batch, skipping failures (warn-and-continue,
    * `common/api.py:258-261`, `:293-296`).
    */
  def fetchSkippingFailures[A, B](batches: Seq[A])(fetch: A => B): Seq[B] =
    batches.flatMap { b =>
      try Some(fetch(b))
      catch {
        case e: Exception =>
          PipelineLogger.active.warning(
            s"batch $b failed, skipping: ${e.getMessage}")
          None
      }
    }
}
