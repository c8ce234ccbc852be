package graft.sources

/** Executor-local request pacing for the DSv2 REST source.
  *
  * Why it exists: the reference client is ONE process, and its 429
  * handling (`common/api.py:34-56`) assumes serial pressure — each
  * request sees the previous one's Retry-After. The DSv2 connector
  * plans one input partition per (user, ≤20-date chunk), so a
  * 1000-executor scan would otherwise open the job with a synchronized
  * stampede of fetches, and every partition would discover the 429 storm
  * independently (N × MaxAttempts hammering, not N requests).
  *
  * Shape: a per-JVM pacer (one bucket per transport key) that hands out
  * request start slots at a fixed interval — `permitsPerSec` requests
  * per second per EXECUTOR. Executors cannot share a clock without a
  * coordination service, so the distributed contract is conservative
  * and explicit: set `spark.graft.ratelimit.rps` to
  * `apiBudget / numExecutors` and the CLUSTER-aggregate rate is bounded
  * by the API budget whatever the scheduler does (fewer concurrent
  * executors → under budget, the safe direction). Within one JVM all
  * partition threads (local mode: the whole scan) serialize through the
  * same bucket, which is exactly the reference's serial pressure.
  *
  * The pacer is a fixed-interval reservation scheme, not a burstable
  * token bucket: `acquire` atomically reserves the next free slot and
  * sleeps until it. No burst credit — a REST API's 429 threshold does
  * not refund idle seconds, and fixed spacing is deterministic to test.
  * Retries re-acquire too (the wrapper gates the TRANSPORT, so
  * `TimeCampClient.get`'s retry loop pays a slot per attempt on top of
  * its Retry-After sleep — a retry is a request to the server like any
  * other).
  */
object RateLimiter {

  /** Session/partition conf key: max transport requests per second PER
    * EXECUTOR JVM for the DSv2 source (also readable as the
    * `ratelimit.rps` reader option). Unset = no pacing (the reference's
    * behavior for a single process issuing serial requests).
    */
  val RpsKey = "spark.graft.ratelimit.rps"

  final class Bucket(permitsPerSec: Double) {
    require(permitsPerSec > 0, s"rps must be > 0, got $permitsPerSec")
    private val intervalNanos = (1e9 / permitsPerSec).toLong
    private var nextFreeNanos = Long.MinValue
    private var cooldownUntilNanos = Long.MinValue

    /** Reserve the next request slot; returns its ABSOLUTE start nanos.
      * Atomic under the bucket lock; the sleep happens OUTSIDE the lock
      * so a long wait never blocks other threads from reserving their
      * later slots.
      */
    private[sources] def reserve(nowNanos: Long): Long = synchronized {
      val start = math.max(nowNanos, nextFreeNanos)
      nextFreeNanos = start + intervalNanos
      start
    }

    /** Shared 429 cooldown: one partition's Retry-After is published to
      * EVERY thread in the bucket, so siblings stop spending request
      * slots into a storm the server already told us about — the
      * reference's serial client sees each Retry-After before its next
      * request (`common/api.py:44-56`); without this, N parallel
      * partitions each had to draw their own 429 first. Pushing
      * `nextFreeNanos` makes all future reservations queue after the
      * cooldown; already-reserved slots are forfeited in [[acquire]].
      */
    private[sources] def noteCooldown(untilNanos: Long): Unit =
      synchronized {
        if (untilNanos > cooldownUntilNanos) cooldownUntilNanos = untilNanos
        if (untilNanos > nextFreeNanos) nextFreeNanos = untilNanos
      }

    private def clearedCooldown(startNanos: Long): Boolean = synchronized {
      startNanos >= cooldownUntilNanos
    }

    def acquire(): Unit = {
      var start = reserve(System.nanoTime())
      var cleared = false
      while (!cleared) {
        val waitNanos = start - System.nanoTime()
        if (waitNanos > 0) {
          val ms = waitNanos / 1000000L
          val ns = (waitNanos % 1000000L).toInt
          Thread.sleep(ms, ns)
        }
        // a sibling's 429 may have published a cooldown while we slept;
        // a slot that now falls inside the window is forfeit (it would
        // be a request INTO the known storm) — re-reserve after it
        cleared = clearedCooldown(start)
        if (!cleared) start = reserve(System.nanoTime())
      }
    }
  }

  // one bucket per (key, rate): a conf change mid-session gets a fresh
  // pacer instead of silently keeping the old interval
  private val buckets =
    new java.util.concurrent.ConcurrentHashMap[(String, Double), Bucket]()

  def bucketFor(key: String, permitsPerSec: Double): Bucket =
    buckets.computeIfAbsent((key, permitsPerSec),
      _ => new Bucket(permitsPerSec))

  /** Gate a transport behind the JVM-wide pacer for `key`. A 429
    * response with a concrete Retry-After (header, then JSON body —
    * the client's own precedence) publishes a shared cooldown into the
    * bucket: sibling partition threads stop spending slots until it
    * expires instead of each discovering the storm with its own 429.
    * A 429 WITHOUT a Retry-After publishes nothing — there is no
    * server-stated window to share, and the caller's linear backoff
    * (TimeCampClient.get) plus per-slot pacing already bound the rate.
    */
  def throttled(
      key: String, permitsPerSec: Double,
      transport: TimeCampClient.Transport): TimeCampClient.Transport = {
    val bucket = bucketFor(key, permitsPerSec)
    (url, params) => {
      bucket.acquire()
      val r = transport(url, params)
      if (r.status == 429) {
        val retryAfterSec = r.retryAfterHeader
          .orElse(TimeCampClient.retryAfterFromBody(r.body))
        retryAfterSec.filter(_ > 0).foreach { sec =>
          bucket.noteCooldown(System.nanoTime() + sec * 1000000000L)
        }
      }
      r
    }
  }
}
