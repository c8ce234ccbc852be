package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan-level observability — the engine analog of the reference's run
  * counters (`total_entries += len(entries)`, `dlt_fetch_timecamp.py:470`,
  * `:486`): `Dataset.observe` attaches aggregate metrics to the plan, so
  * the counts/sums are collected DURING the normal execution pass — no
  * second job, no extra scan, delivered to `QueryExecutionListener` /
  * `StreamingQueryListener` on completion. The reference pays a Python
  * loop per row for its counters; here they ride the codegen'd pipeline.
  */
object Observe {

  /** Attach row count (+ optional sums) under `name`. Read back via
    * `df.collectObservedMetrics` semantics: a listener, or
    * `observedMetrics` on the QueryExecution.
    */
  def withRowMetrics(df: DataFrame, name: String, sums: Column*): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sums.zipWithIndex.map { case (c, i) => sum(c).as(s"sum_$i") }
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
