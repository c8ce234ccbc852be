package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** File sink matching the reference's dlt filesystem destination: one
  * directory per run, files named `{table}.{file_id}.{ext}`, compression
  * disabled (`dlt_fetch_timecamp.py:36`, `:685-698`).
  *
  * Spark writes part-files per partition (the distributed path — at scale
  * this is the only write pattern that doesn't serialize through one node);
  * the layout pass renames them to the reference's naming scheme. S3 is the
  * same code via `s3a://` (Hadoop FS handles both), rename becomes a copy.
  */
object FileSink extends Sink {

  val Formats: Set[String] = Set("csv", "jsonl", "parquet")

  override def write(df: DataFrame, outDir: String, table: String,
      format: String): Unit = {
    require(Formats.contains(format), s"unsupported format: $format")
    val sparkFormat = if (format == "jsonl") "json" else format
    val writer = df.write.mode("overwrite")
      .option("compression", "none")
    val withHeader =
      if (format == "csv") writer.option("header", "true") else writer
    if (outDir.contains("://")) {
      // Object store / URI target (s3a://bucket/..., matching the
      // reference's S3 destination, docs/fetch-project-data-to-s3.md):
      // executors write part files directly under {out}/{table}/ — no
      // local rename pass (object stores have no cheap rename; the
      // reference's own S3 output likewise keeps the writer's naming).
      withHeader.format(sparkFormat).save(s"$outDir/$table")
    } else {
      val tmp = s"$outDir/_tmp_$table"
      withHeader.format(sparkFormat).save(tmp)
      layout(Paths.get(tmp), Paths.get(outDir), table, format)
    }
  }

  /** Rename part-files to `{table}.{file_id}.{ext}` and drop the tmp dir.
    * Stale `{table}.*.{ext}` files beyond the new part count are deleted
    * FIRST: Spark's overwrite mode only clears the `_tmp` dir, so a
    * rewrite that shrinks from 10 parts to 2 would otherwise leave
    * `t.00002..t.00009` from the previous run for `read`'s glob to mix
    * into the new data. (`Files.list` streams are closed explicitly —
    * each holds an open directory descriptor.)
    */
  private def layout(tmp: Path, outDir: Path, table: String, ext: String): Unit = {
    def listed[A](dir: Path)(f: Iterator[Path] => A): A = {
      val st = Files.list(dir)
      try f(st.iterator().asScala) finally st.close()
    }
    val stalePattern = java.util.regex.Pattern
      .compile(java.util.regex.Pattern.quote(table) + "\\.\\d+\\." +
        java.util.regex.Pattern.quote(ext))
    listed(outDir)(_.filter(p =>
        stalePattern.matcher(p.getFileName.toString).matches())
      .toSeq).foreach(Files.delete)
    val parts = listed(tmp)(_.filter(
        _.getFileName.toString.startsWith("part-")).toSeq)
      .sortBy(_.getFileName.toString)
    parts.zipWithIndex.foreach { case (p, i) =>
      Files.move(p, outDir.resolve(f"$table.$i%05d.$ext"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    listed(tmp)(_.toSeq).foreach(Files.delete)
    Files.delete(tmp)
  }

  /** Re-read a table written by `write` (glob over its file ids, or the
    * per-table directory for URI targets).
    */
  def read(spark: org.apache.spark.sql.SparkSession, outDir: String,
      table: String, format: String): DataFrame = {
    val sparkFormat = if (format == "jsonl") "json" else format
    val uriTarget = outDir.contains("://")
    val reader = if (uriTarget) spark.read
      else spark.read.option("pathGlobFilter", s"$table.*.$format")
    val withHeader =
      if (format == "csv")
        reader.option("header", "true").option("inferSchema", "true")
      else reader
    withHeader.format(sparkFormat)
      .load(if (uriTarget) s"$outDir/$table" else outDir)
  }
}

/** Bucketed parquet destination through the same [[Sink]] seam: each table
  * is hash-partitioned ONCE at write time into `numBuckets` buckets on
  * `bucketCols` (optionally sorted within buckets), so every later
  * equi-join or aggregation on those keys runs with ZERO Exchange — the
  * write pays the shuffle once instead of every query paying it. At 100 TB
  * the repeated fact-table shuffle is the dominant join cost; bucketing the
  * warehouse layout is the standing answer (PlanSpec proves the
  * shuffle-free plan on sink-written tables).
  *
  * Spark can only express bucketing through the session catalog
  * (`saveAsTable`; a bare path `save()` has nowhere to record the bucket
  * spec), so data files land under `target/table` and the bucket metadata
  * under catalog name `{tablePrefix}_{table}` — [[read]] resolves through
  * the catalog so the spec survives the round-trip.
  */
final case class BucketedSink(
    numBuckets: Int, bucketCols: Seq[String], sortCols: Seq[String] = Nil,
    tablePrefix: String = "bucketed") extends Sink {

  require(numBuckets > 0, s"numBuckets must be positive, got: $numBuckets")
  require(bucketCols.nonEmpty, "bucketed write needs at least one bucket column")

  /** Catalog identifier for (target, table). The target is folded in (as a
    * short stable digest — catalog names must be bare identifiers, paths are
    * not) so two writes of the same table name to DIFFERENT targets get
    * distinct catalog entries instead of silently repointing one; without
    * it, `write(df1, "/wh/a", "t")` then `write(df2, "/wh/b", "t")` left
    * the catalog's `t` pointing at `/wh/b` while `/wh/a/t`'s files became
    * unreachable through the bucket-aware path.
    */
  def catalogName(target: String, table: String): String = {
    // Normalize before digesting so equivalent spellings of one directory
    // (trailing slash, relative vs absolute, ./ segments) resolve to the
    // SAME catalog entry — write("/wh/a/", t) then read("/wh/a", t) must
    // not miss. URI targets (s3a://...) only get trailing-slash stripping
    // (java.nio normalization would mangle the scheme).
    val canonical =
      if (target.contains("://")) target.replaceAll("/+$", "")
      else java.nio.file.Paths.get(target).toAbsolutePath.normalize.toString
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${tablePrefix}_${table}_$digest"
  }

  override def write(df: DataFrame, target: String, table: String,
      format: String): Unit = {
    require(format == "parquet",
      s"bucketed layout is parquet-only (columnar + splittable), got: $format")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", s"$target/$table")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(catalogName(target, table))
  }

  /** Append an ingest batch to an EXISTING bucketed table under the same
    * spec — the incremental-ingest arm ([[write]] is the full rebuild).
    * Each appended file set is bucketed by the same hash, so probes keep
    * their shuffle-free join; Spark validates the spec against the
    * catalog entry, so an append under a different (numBuckets, cols)
    * fails at analysis rather than silently mixing two layouts in one
    * directory.
    */
  def append(df: DataFrame, target: String, table: String): Unit = {
    val w = df.write.mode("append").format("parquet")
      .option("path", s"$target/$table")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(catalogName(target, table))
  }

  /** Catalog-resolved read: keeps the bucket spec visible to the planner
    * (reading the bare path would silently drop it and reintroduce the
    * join shuffle this sink exists to remove). Catalog entries persist only
    * with a durable metastore; in a fresh ephemeral-metastore session,
    * re-register via [[write]] (or `CREATE TABLE ... USING parquet
    * CLUSTERED BY ... LOCATION` over the existing files — no data
    * rewrite) before reading. SinkSpec's fresh-session case pins that
    * recovery path end-to-end.
    */
  def read(spark: org.apache.spark.sql.SparkSession, target: String,
      table: String): DataFrame =
    spark.table(catalogName(target, table))
}
