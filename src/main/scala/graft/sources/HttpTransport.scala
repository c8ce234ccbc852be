package graft.sources

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Production HTTP transport for [[TimeCampClient]], backed by the
  * JDK's `java.net.http.HttpClient` (zero extra dependencies — the
  * offline-build constraint). Re-expresses the wire half of the
  * reference client (`common/api.py:21-31` builds
  * `https://{domain}/third_party/api/{endpoint}` with bearer headers;
  * `:29` issues the request) while the RETRY half stays where it
  * already lives, in [[TimeCampClient.get]] — this transport performs
  * exactly ONE request per call and reports status / body /
  * `Retry-After` so the shared retry loop (header → body `retry_after`
  * → linear 5s×attempt, `common/api.py:36-56`) drives it identically
  * to the stub.
  *
  * Differences from the reference, on purpose:
  *  - TLS verification stays ON (the reference passes `verify=False`
  *    at `common/api.py:29` and suppresses the warning at `:11`;
  *    disabling certificate checks is not a behavior worth carrying).
  *  - `Retry-After` is parsed as a numeric seconds value (integral or
  *    fractional, ceiling'd to whole seconds — the reference accepts
  *    `float(retry_after)` at `common/api.py:45`); a non-numeric or
  *    negative value falls through to the body/linear fallbacks,
  *    matching the reference's ValueError path (`:47-50`).
  *
  * Instances are thread-safe (the JDK client is) and cheap to share;
  * [[graft.PipelineMain]] registers one lazily under the key `"http"`
  * reading base URL + auth headers from the live `envConfig`, so
  * `--transport http` is the production path and `--transport stub`
  * stays the offline default.
  */
final class HttpTransport(
    baseUrl: String,
    headers: Map[String, String],
    client: HttpClient = HttpTransport.defaultClient,
    requestTimeout: Duration = Duration.ofSeconds(60)) {

  /** One GET. `url` is the endpoint path the pipeline passes the stub
    * (`"/users"`, `"/entries"`, ...); params become the encoded query
    * string. Connection-level failures (unknown host, refused, timeout)
    * propagate as exceptions — the reference likewise does NOT retry
    * transport errors, only retryable statuses
    * (`common/api.py:58-62` re-raises RequestException immediately).
    */
  def get(url: String, params: Map[String, String]): TimeCampClient.Response = {
    val full = s"${baseUrl.stripSuffix("/")}/${url.stripPrefix("/")}" +
      HttpTransport.queryString(params)
    val b = HttpRequest.newBuilder(URI.create(full))
      .timeout(requestTimeout)
      .GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    TimeCampClient.Response(
      status = resp.statusCode(),
      body = resp.body(),
      retryAfterHeader =
        Option(resp.headers().firstValue("Retry-After").orElse(null))
          .flatMap(HttpTransport.parseRetryAfter))
  }

  /** The `Transport` function shape [[TimeCampClient.get]] consumes. */
  def transport: TimeCampClient.Transport = (url, params) => get(url, params)
}

object HttpTransport {

  /** Shared client: HTTP/1.1 keep-alive pool, 10 s connect timeout.
    * Redirects follow `NORMAL` policy (http→https upgrades allowed,
    * never https→http downgrades).
    */
  lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** Build a transport from the environment config the way the
    * reference constructs its session (`common/api.py:15-16`).
    */
  def fromConfig(config: TimeCampConfig): HttpTransport =
    new HttpTransport(config.baseUrl, config.headers)

  /** Deterministic, sorted-key query string (stable across runs for
    * logging/caching); empty map → no `?`.
    */
  private[sources] def queryString(params: Map[String, String]): String =
    if (params.isEmpty) ""
    else params.toSeq.sortBy(_._1).map { case (k, v) =>
      s"${enc(k)}=${enc(v)}"
    }.mkString("?", "&", "")

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Numeric `Retry-After` seconds: integral or fractional, ceiling'd
    * to whole seconds (the retry loop's unit); negative or
    * non-numeric → None (→ body/linear fallback, the reference's
    * ValueError path `common/api.py:47-50`). HTTP-date values are NOT
    * supported — the reference's `float()` rejects them too.
    */
  private[sources] def parseRetryAfter(v: String): Option[Long] =
    v.trim.toDoubleOption.filter(d => d >= 0 && d.isFinite)
      .map(d => math.ceil(d).toLong)
}
