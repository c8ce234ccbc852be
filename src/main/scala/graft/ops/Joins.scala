package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark has no single built-in operator for, built scale-first.
  * The reference pipeline itself needs only equi/semi/anti joins
  * (SURVEY.md §2.3); these are the §7.5 extensions a training-data /
  * event-analytics workload adds on top.
  */
object Joins {

  /** As-of join: for every left row, attach the latest right row with
    * `rightTs <= leftTs` for the same key (NULL payload when none).
    *
    * NOT implemented as a join at all: both sides are unioned with a side
    * tag and swept by ONE window pass per key ordered by (ts, side) —
    * `last(payload, ignoreNulls)` carries the most recent right payload
    * forward onto each left row. At 100 TB this is a single shuffle on the
    * key (the same cost as any keyed aggregation); the naive
    * inequality-join formulation is a per-key cross product that explodes
    * quadratically, and a per-left-row subquery doesn't distribute at all.
    *
    * Determinism: right rows sort before left rows at equal ts (<= match
    * includes same-instant rows), and ties among right rows break on
    * `rightTieBreak` (the LAST one in that order wins, i.e. the max).
    * Callers needing a different tie policy pre-dedup the right side with
    * `Transforms.firstPerGroup`.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], rightTieBreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(right(_)) :+
      rightTieBreak.as("_tie"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        rightTieBreak.as("_tie"), payload.as("_rp")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(r.schema("_tie").dataType).as("_tie"),
        lit(null).cast(r.schema("_rp").dataType).as("_rp")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_match", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col(s"_match.$p").as(p)): _*)
  }

  /** Banded range join: pairs (left, right) on the same key with
    * `rightTs` in `[leftTs, leftTs + window)`.
    *
    * The naive formulation is an inequality join — a per-key cross product.
    * Here both sides are assigned to fixed-width time bands of `window`
    * millis; a qualifying right row lives either in the left row's band or
    * the next one, so the left side fans out to exactly 2 (key, band)
    * probes and the join is a plain equi-join on (key, band) + a residual
    * range filter. One shuffle, linear fan-out, no cross product — the
    * same trick Databricks' range-join optimization applies, expressed in
    * plan-level primitives.
    */
  def rangeJoinBucketed(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, windowMs: Long): DataFrame = {
    val lMs = unix_micros(col(leftTs).cast("timestamp")) / 1000L
    val rMs = unix_micros(col(rightTs).cast("timestamp")) / 1000L
    val l = left
      .withColumn("_lms", lMs.cast("long"))
      .withColumn("_band", explode(array(
        floor(col("_lms") / windowMs).cast("long"),
        (floor(col("_lms") / windowMs) + 1).cast("long"))))
    val r = right
      .withColumn("_rms", rMs.cast("long"))
      .withColumn("_band", floor(col("_rms") / windowMs).cast("long"))
    l.join(r, keys :+ "_band")
      .where(col("_rms") >= col("_lms") &&
        col("_rms") < col("_lms") + windowMs)
      .drop("_band", "_lms", "_rms")
  }
}
