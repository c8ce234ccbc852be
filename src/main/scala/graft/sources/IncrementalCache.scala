package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incremental fetch cache — the Spark rendering of the reference's two
  * JSON caches: the per-date computer-activities cache
  * (`dlt_fetch_timecamp.py:194-302`) and the permanent application-details
  * cache (`common/api.py:362-425`).
  *
  * Design: a parquet table partitioned by the cache key column. Partition
  * pruning then serves point lookups without scanning the whole cache, the
  * "which keys are missing" question is a `left_anti` join, and refreshing
  * a key overwrites only its partition (dynamic partition overwrite), the
  * same replace-one-date semantics as the reference's per-date JSON files.
  *
  * Scale notes: the cache table can grow without bound (years × users);
  * every read here stays partition-pruned or key-joined, never a full
  * scan. Writers only touch the partitions they refresh, so concurrent
  * daily runs don't rewrite history.
  */
object IncrementalCache {

  /** Read the cache, tolerating a missing or unreadable store: the
    * reference treats a corrupt cache file as empty and refetches
    * (`dlt_fetch_timecamp.py:222-237`) rather than failing the run.
    */
  def loadOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame =
    try {
      // Probe WITHOUT the user schema first: schema inference forces a
      // footer read, so missing/corrupt stores throw here instead of at
      // the first downstream action.
      spark.read.parquet(path).schema
      spark.read.schema(schema).parquet(path)
    } catch {
      // ONLY missing/unreadable-store shapes read as "empty cache" — a
      // blanket catch turned credential/permission failures (and fatal
      // JVM errors) into a silent full refetch of years of history from
      // the rate-limited API on every run
      case e: Exception if isMissingOrCorrupt(e) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def isMissingOrCorrupt(e: Throwable): Boolean = {
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => t.getClass.getName + ": " + String.valueOf(t.getMessage))
      .mkString(" | ")
    msgs.contains("PATH_NOT_FOUND") ||
      msgs.contains("FileNotFoundException") ||
      msgs.contains("UNABLE_TO_INFER_SCHEMA") ||
      msgs.contains("CANNOT_READ_FILE_FOOTER") ||
      msgs.contains("Could not read footer")
  }

  /** Hot/cold split on a date column: dates within `thresholdDays` of
    * `today` are "hot" (always refetched — late edits arrive for recent
    * days), older dates are served from cache
    * (`dlt_fetch_timecamp.py:194-217`, CACHE_THRESHOLD_DAYS = 7).
    * Returns (hot, cold).
    */
  def hotColdSplit(
      requested: DataFrame, dateCol: String, today: java.time.LocalDate,
      thresholdDays: Int = 7): (DataFrame, DataFrame) = {
    val cutoff = lit(today.minusDays(thresholdDays).toString).cast("date")
    val d = col(dateCol).cast("date")
    // NULL/uncastable dates go HOT: both comparisons are null for them,
    // so a plain two-predicate split dropped such rows from BOTH sides —
    // never refetched, never served. Refetching is the conservative side.
    (requested.where(d >= cutoff || d.isNull),
      requested.where(d < cutoff))
  }

  /** Keys in `requested` with no cache entry — the fetch list
    * (`common/api.py:402-417`: `missing_ids`). Anti-join, so only the
    * cache's key column is read (column pruning reaches the scan).
    */
  def missingKeys(requested: DataFrame, cache: DataFrame, keyCol: String): DataFrame =
    requested.join(cache.select(keyCol), Seq(keyCol), "left_anti")

  /** Serve a request from cache + fresh rows: cached rows for keys the
    * fresh set doesn't cover, fresh rows otherwise (fresh wins, like the
    * reference's cache-update-then-merge).
    */
  def merge(cache: DataFrame, fresh: DataFrame, keyCol: String): DataFrame =
    cache.join(fresh.select(keyCol).distinct(), Seq(keyCol), "left_anti")
      .unionByName(fresh)

  /** Write rows into the cache, replacing ONLY the partitions present in
    * `rows` (dynamic partition overwrite — the per-date JSON file replace
    * of `dlt_fetch_timecamp.py:229-237`).
    */
  def upsertPartitions(rows: DataFrame, path: String, partitionCol: String): Unit =
    rows.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
}
