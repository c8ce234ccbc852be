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

    /** Reserve the next request slot; returns the nanos the caller must
      * still wait (0 when the slot is already due). Atomic under the
      * bucket lock; the sleep happens OUTSIDE the lock so a long wait
      * never blocks other threads from reserving their later slots.
      */
    private[sources] def reserve(nowNanos: Long): Long = synchronized {
      val start = math.max(nowNanos, nextFreeNanos)
      nextFreeNanos = start + intervalNanos
      start - nowNanos
    }

    def acquire(): Unit = {
      val waitNanos = reserve(System.nanoTime())
      if (waitNanos > 0) {
        val ms = waitNanos / 1000000L
        val ns = (waitNanos % 1000000L).toInt
        Thread.sleep(ms, ns)
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

  /** Gate a transport behind the JVM-wide pacer for `key`. */
  def throttled(
      key: String, permitsPerSec: Double,
      transport: TimeCampClient.Transport): TimeCampClient.Transport = {
    val bucket = bucketFor(key, permitsPerSec)
    (url, params) => {
      bucket.acquire()
      transport(url, params)
    }
  }
}
