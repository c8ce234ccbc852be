package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 read connector for the computer-activities endpoint — the
  * executor-parallel upgrade of the reference's driver-side fan-out
  * (`common/api.py:226-324`): one Spark INPUT PARTITION per
  * (user, ≤20-date chunk), so a 1000-executor cluster issues its
  * rate-limited fetches concurrently and each partition's rows enter the
  * plan columnar-ready, with no driver materialization and no
  * `spark.createDataFrame` bottleneck.
  *
  * {{{
  * spark.read.format("graft.sources.TimeCampDataSource")
  *   .option("users", "1,2,3")
  *   .option("from", "2024-01-01").option("to", "2024-02-15")
  *   .option("transport", "<registry key>")
  *   .load()
  * }}}
  *
  * Transports are injected through a registry key (options carry only
  * strings): tests register a deterministic stub; production registers an
  * HTTP client with the retry/backoff semantics of
  * `TimeCampClient.get`. Fetch failures follow the reference's
  * skip-and-continue: a failed (user, chunk) partition yields zero rows
  * with a warning rather than failing the scan (`common/api.py:293-296`).
  *
  * Request pacing: the reference is ONE process and its 429 handling
  * assumes serial pressure (`common/api.py:34-56`); this connector's
  * fan-out would stampede the API with one concurrent request per
  * partition. Set the `ratelimit.rps` reader option (or the
  * `spark.graft.ratelimit.rps` session conf) to the per-EXECUTOR request
  * budget — `apiBudget / numExecutors` — and every partition thread in a
  * JVM serializes through one fixed-interval pacer ([[RateLimiter]]),
  * bounding the cluster-aggregate rate by the API budget. Unset = no
  * pacing.
  *
  * Rows: (user_id, date, application_id, duration_seconds) — the flattened
  * shape the reference emits per activity record.
  */
class TimeCampDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TimeCampDataSource.schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TimeCampDataSource.ActivitiesTable(properties.asScala.toMap)
}

object TimeCampDataSource {

  val schema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("application_id", StringType, nullable = true),
    StructField("duration_seconds", LongType, nullable = true)))

  /** Executor-visible transport registry (options are string-only). The
    * registered function must be serializable-free: partitions carry only
    * the KEY and look the transport up on the executor — in local mode the
    * same JVM, on a cluster the registration happens in executor-side
    * setup (or the key names a well-known production transport).
    */
  private val transports =
    new java.util.concurrent.ConcurrentHashMap[String, TimeCampClient.Transport]()

  def registerTransport(key: String, t: TimeCampClient.Transport): Unit =
    transports.put(key, t)

  private[sources] def transportFor(key: String): TimeCampClient.Transport =
    Option(transports.get(key)).getOrElse(
      throw new IllegalStateException(s"no transport registered under '$key'"))

  /** Activity-record parse: `[{"user_id":..,"date":"..",
    * "application_id":"..","duration":N}, ...]` — the flattened shape;
    * tolerant of missing fields (reference rows vary by API version) and
    * of NESTED objects inside a record (a regex-bracket parse would
    * silently drop fields there). Jackson, same as the pipeline's parsers.
    * One shared mapper: `readTree` is thread-safe, and the object lives
    * per-JVM on the executor — never serialized with the partition.
    */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[sources] def parseActivities(
      body: String): Seq[(String, String, Option[String], Option[Long])] = {
    val root =
      try mapper.readTree(body)
      catch { case _: java.io.IOException => return Seq.empty }
    if (root == null || !root.isArray) return Seq.empty
    def scalar(n: com.fasterxml.jackson.databind.JsonNode, k: String) =
      Option(n.get(k)).filter(v => v.isValueNode && !v.isNull).map(_.asText)
    root.elements().asScala.toSeq.collect {
      case n if n.isObject =>
        for {
          u <- scalar(n, "user_id")
          d <- scalar(n, "date")
        } yield (u, d, scalar(n, "application_id"),
          Option(n.get("duration")).filter(v => v.isValueNode && !v.isNull)
            .map(_.asLong))
    }.flatten
  }

  private case class ActivityPartition(
      userId: String, dates: Seq[String], transportKey: String,
      // per-executor request pacing (RateLimiter.RpsKey), resolved at
      // PLAN time and shipped in the partition: executors see options
      // only through their partition descriptor
      ratelimitRps: Option[Double])
    extends InputPartition

  private class ActivitiesTable(props: Map[String, String])
      extends Table with SupportsRead {
    override def name(): String = "timecamp_activities"
    override def schema(): StructType = TimeCampDataSource.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder with Scan with Batch {
        private val opts = props ++ options.asScala
        override def build(): Scan = this
        override def readSchema(): StructType = TimeCampDataSource.schema
        override def toBatch: Batch = this

        override def planInputPartitions(): Array[InputPartition] = {
          val users = opts.getOrElse("users", "")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val from = java.time.LocalDate.parse(opts("from"))
          val to = java.time.LocalDate.parse(opts("to"))
          val dates = Iterator.iterate(from)(_.plusDays(1))
            .takeWhile(!_.isAfter(to)).map(_.toString).toSeq
          val key = opts.getOrElse("transport", "default")
          // request pacing: reader option wins, session conf is the
          // deployment default (resolved here on the driver — executors
          // only ever see the partition descriptor)
          val rps = opts.get("ratelimit.rps").map(_.toDouble)
            .orElse(org.apache.spark.sql.SparkSession.active.conf
              .getOption(RateLimiter.RpsKey).map(_.toDouble))
          require(rps.forall(_ > 0),
            s"${RateLimiter.RpsKey} must be > 0, got ${rps.get}")
          // the reference's fan-out plan, now as Spark partitions
          TimeCampClient.activityBatches(users, dates)
            .map { case (u, chunk) =>
              ActivityPartition(u, chunk, key, rps): InputPartition
            }.toArray
        }

        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
              val part = p.asInstanceOf[ActivityPartition]
              new PartitionReader[InternalRow] {
                private val rows: Iterator[InternalRow] = {
                  val fetched = try {
                    val raw = transportFor(part.transportKey)
                    // pace BEFORE retrying wraps it: every attempt of the
                    // retry loop is a real request against the API budget
                    val transport = part.ratelimitRps
                      .map(r => RateLimiter.throttled(part.transportKey, r, raw))
                      .getOrElse(raw)
                    val params = Map("user_id" -> part.userId) ++
                      part.dates.zipWithIndex.map { case (d, i) =>
                        s"dates[$i]" -> d
                      }
                    val r = TimeCampClient.get(transport)(
                      "/computer_activities", params)
                    parseActivities(r.body)
                  } catch {
                    case e: Exception => // skip-and-continue, like the reference
                      System.err.println(
                        s"[timecamp] partition (${part.userId}, ${part.dates.headOption.getOrElse("")}..) failed, skipping: ${e.getMessage}")
                      Seq.empty
                  }
                  fetched.iterator.map { case (u, d, app, dur) =>
                    InternalRow(
                      UTF8String.fromString(u), UTF8String.fromString(d),
                      app.map(UTF8String.fromString).orNull,
                      dur.map(Long.box).orNull)
                  }
                }
                override def next(): Boolean = rows.hasNext
                override def get(): InternalRow = rows.next()
                override def close(): Unit = ()
              }
            }
          }
      }
  }
}
