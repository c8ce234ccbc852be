package graft.reports

import graft.Materialize
import graft.ops.Closure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship analytics query: recursive budget-vs-tracked
  * rollup (`SAMPLE-REPORTS.md:20-112`).
  *
  * Logical chain (identical to the published DuckDB report):
  * tasks → transitive closure → entries ⋈ closure → SUM per ancestor →
  * tasks ⟕ rollup → budget filter → presentation projection → sort.
  *
  * Scale notes: `tasks` is a dimension (small at any fact scale), so the
  * closure is cheap and the closure⋈entries join broadcasts the closure —
  * the 100 TB side (`entries`) is scanned exactly once, aggregated with
  * map-side partial SUM, and never re-shuffled.
  */
object BudgetReport {

  /** @param tasks   (task_id: String, parent_id: String nullable,
    *                 name: String, budgeted: Long seconds)
    * @param entries (task_id: String, duration: Long seconds)
    */
  def apply(tasks: DataFrame, entries: DataFrame): DataFrame = {
    // Recursive-CTE closure: same UNION ALL shape as the published report's
    // own recursive CTE (SAMPLE-REPORTS.md:59-75) — both assume a forest.
    // Materialized once before the broadcast: the UnionLoop otherwise
    // re-runs inside the broadcast-exchange computation, and the
    // dimension-sized result (|tasks| × depth) is checkpoint-cheap
    // (measured ~0.4s off the report at sf0.1).
    val closure = Closure.transitiveClosureRecursive(tasks, "task_id", "parent_id")
      .transform(Materialize.checkpoint)
    val tracked = entries
      .join(broadcast(closure),
        entries("task_id") === closure("descendant_id"))
      .groupBy(col("ancestor_id").as("task_id"))
      .agg(sum("duration").as("tracked_seconds"))
    tasks
      .join(tracked, Seq("task_id"), "left")
      .where(col("budgeted") > 0)
      .select(
        col("task_id"), col("name"),
        col("budgeted").as("budgeted_seconds"),
        coalesce(col("tracked_seconds"), lit(0L)).as("tracked_seconds"),
        (col("budgeted") - coalesce(col("tracked_seconds"), lit(0L)))
          .as("remaining_seconds"),
        format_string("%.4f",
          coalesce(col("tracked_seconds"), lit(0L)).cast("double") / 3600.0)
          .as("tracked_hours"))
      .orderBy(col("tracked_seconds").desc, col("task_id"))
  }
}
