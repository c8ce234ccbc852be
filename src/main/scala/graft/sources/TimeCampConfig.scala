package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The reference's environment-driven configuration
  * (`common/utils.py:6-26`): API key, API domain and root group id come
  * from `TIMECAMP_*` environment variables, optionally supplied by a
  * `.env` file in the working directory.
  *
  * Precedence mirrors `load_dotenv(override=True)` (`common/utils.py:21`,
  * `dlt_fetch_timecamp.py:105`): a key present in the `.env` file WINS
  * over the same key in the process environment; missing keys fall back
  * to the reference's defaults.
  */
final case class TimeCampConfig(
    apiKey: String,
    domain: String = "app.timecamp.com",
    rootGroupId: Int = 0) {

  /** `https://{domain}/third_party/api` (`common/api.py:15`). */
  def baseUrl: String = s"https://$domain/third_party/api"

  /** Bearer-token request headers (`common/api.py:16`). */
  def headers: Map[String, String] = Map(
    "Accept" -> "application/json",
    "Content-Type" -> "application/json",
    "Authorization" -> s"Bearer $apiKey")
}

object TimeCampConfig {

  /** `TimeCampConfig.from_env` (`common/utils.py:19-26`): read
    * `TIMECAMP_API_KEY` (default empty), `TIMECAMP_DOMAIN` (default
    * `app.timecamp.com`), `TIMECAMP_ROOT_GROUP_ID` (default 0), with the
    * `.env` file overriding the process environment.
    */
  def fromEnv(
      env: Map[String, String] = sys.env,
      dotenv: Path = Paths.get(".env")): TimeCampConfig = {
    val merged = env ++ parseDotenv(dotenv)
    TimeCampConfig(
      apiKey = merged.getOrElse("TIMECAMP_API_KEY", ""),
      domain = merged.getOrElse("TIMECAMP_DOMAIN", "app.timecamp.com"),
      rootGroupId = merged.getOrElse("TIMECAMP_ROOT_GROUP_ID", "0").trim.toInt)
  }

  /** Minimal dotenv subset (what the reference's `.env` needs):
    * `KEY=VALUE` lines, optional `export ` prefix, `#` comment lines,
    * optional matching single/double quotes around the value.
    */
  private[sources] def parseDotenv(p: Path): Map[String, String] =
    if (!Files.isRegularFile(p)) Map.empty
    else Files.readAllLines(p).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map(l => if (l.startsWith("export ")) l.drop(7).trim else l)
      .map { l =>
        val i = l.indexOf('=')
        l.take(i).trim -> unquote(l.drop(i + 1).trim)
      }
      .filter(_._1.nonEmpty)
      .toMap

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v
}
