package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * Each table is a single parquet file under the sf dir; reads go through
  * the DataSource V2 parquet scan so filter pushdown / column pruning apply.
  *
  * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark only reads as a
  * nanos-since-epoch Long (`spark.sql.legacy.parquet.nanosAsLong=true`,
  * set by Verify/Bench/Explain sessions); the loader normalizes it to a
  * micros TimestampType column — the same truncation DuckDB applies when
  * casting timestamp_ns → timestamp.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Type-adaptive: the driver's parquet stores ts as TIMESTAMP(NANOS)
    // (read as Long under nanosAsLong); re-materialized copies (e.g. the
    // scaled sf1 evidence set) store a real timestamp and need no rewrite.
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
