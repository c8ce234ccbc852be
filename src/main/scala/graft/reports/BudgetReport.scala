package graft.reports

import graft.Materialize
import graft.ops.{Closure, Joins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship analytics query: recursive budget-vs-tracked
  * rollup (`SAMPLE-REPORTS.md:20-112`).
  *
  * Logical chain (identical to the published DuckDB report):
  * tasks → transitive closure → entries ⋈ closure → SUM per ancestor →
  * tasks ⟕ rollup → budget filter → presentation projection → sort.
  *
  * Scale notes: the fact side is pre-aggregated per task BEFORE the
  * closure join (eager aggregation, Yan & Larson VLDB'95 — SUM is
  * decomposable, so SUM-per-ancestor = SUM over SUM-per-task): the
  * 100 TB side is scanned exactly once, collapses to ≤|tasks| partial
  * rows via map-side combine, and the closure join touches only those
  * partials — never the raw fact rows. The closure side broadcasts only
  * while it is actually broadcast-sized ([[graft.ops.Joins.broadcastIfSmall]]);
  * two decades up a 15M-pair closure falls to a shuffle join of two
  * dimension-sized frames instead of a ~1 GB forced broadcast.
  */
object BudgetReport {

  /** @param tasks   (task_id: String, parent_id: String nullable,
    *                 name: String, budgeted: Long seconds)
    * @param entries (task_id: String, duration: Long seconds)
    */
  def apply(tasks: DataFrame, entries: DataFrame): DataFrame =
    apply(tasks, entries, doublingClosure = false)

  /** `doublingClosure` swaps the closure derivation for the O(log depth)
    * doubling variant — the ClosureGradedAB `budget` case times both
    * INSIDE the full report at any SF to keep the shipped choice a
    * measured one (round-8 finding: variant A/Bs outside the graded
    * context mislead; sf1 numbers in SCALE.md round 14).
    */
  def apply(tasks: DataFrame, entries: DataFrame,
      doublingClosure: Boolean): DataFrame = {
    // Recursive-CTE closure: same UNION ALL shape as the published report's
    // own recursive CTE (SAMPLE-REPORTS.md:59-75) — both assume a forest.
    // Materialized once before the broadcast: the UnionLoop otherwise
    // re-runs inside the broadcast-exchange computation, and the
    // dimension-sized result (|tasks| × depth) is checkpoint-cheap
    // (measured ~0.4s off the report at sf0.1).
    // counted checkpoint: the count IS the forcing job, and it feeds the
    // broadcastIfSmall dispatch below (the retired eager-checkpoint +
    // uncounted broadcastIfSmall shape paid a separate count job)
    val (closure, nClosure) = Materialize.checkpointCounted(
      if (doublingClosure)
        Closure.transitiveClosureDoubling(tasks, "task_id", "parent_id")
          .select(col("descendant_id"), col("ancestor_id"))
      else
        Closure.transitiveClosureRecursive(tasks, "task_id", "parent_id"))
    // Eager aggregation below the join: 60M fact rows → ≤|tasks| partials
    // (the shuffle carries map-side-combined partial sums, not raw rows).
    val perTask = entries
      .groupBy(col("task_id").as("descendant_id"))
      .agg(sum("duration").as("_partial"))
    val tracked = perTask
      .join(Joins.broadcastIfSmall(closure, Some(nClosure)), Seq("descendant_id"))
      .groupBy(col("ancestor_id").as("task_id"))
      .agg(sum("_partial").as("tracked_seconds"))
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
