package graft.ops

import graft.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy operators — the one capability the reference needs
  * that Spark has no single built-in operator for.
  *
  * Semantics from the reference's recursive CTE (`SAMPLE-REPORTS.md:59-75`,
  * `SAMPLE-PROJECT-BUDGET-REPORT.md:53-70`) and the Python breadcrumb
  * walkers (`dlt_fetch_timecamp.py:313-346`, `:527-547`).
  *
  * Implementation is an iterative fixpoint of DataFrame self-joins. Scale
  * notes: hierarchy dimensions are small (tasks/groups — thousands to low
  * millions of rows) even when the fact side is 100 TB, so each iteration
  * is a small shuffle (or broadcast) join; an eager
  * [[graft.Materialize.checkpoint]] per iteration truncates lineage so the
  * plan stays O(1) per step instead of growing exponentially (local
  * checkpoint on local mode, reliable checkpoint on clusters — see
  * Materialize's scaladoc), and the final closure is typically broadcast
  * against the fact table by AQE.
  */
object Closure {

  /** Transitive closure of a parent-pointer forest.
    *
    * Input: any DataFrame with an id column and a nullable parent column
    * (NULL parent = root). Output: `(descendant_id, ancestor_id)` pairs
    * including the reflexive self-pair for every node, exactly as the
    * reference's base case does (`SAMPLE-REPORTS.md:61-63`).
    *
    * `maxDepth` caps iterations: cycle *tolerance*, not cycle detection —
    * the reference's walkers return partial paths on cycles rather than
    * erroring (`dlt_fetch_timecamp.py:534`).
    */
  def transitiveClosure(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxDepth: Int = 32): DataFrame = {
    val edges = nodes
      .select(col(idCol).as("_e_id"), col(parentCol).as("_e_parent"))
      .where(col(parentCol).isNotNull)
      .transform(Materialize.checkpoint)

    val self = nodes.select(
      col(idCol).as("descendant_id"), col(idCol).as("ancestor_id"))

    // frontier k = (descendant, ancestor-at-distance-k), minus pairs already
    // seen — the set-difference makes cyclic graphs converge (the pair
    // space is finite) instead of re-deriving pairs until the cap. Only
    // frontiers are eagerly checkpointed; the accumulated result is a
    // union of those materialized RDDs, so its plan stays shallow without
    // paying one extra materialization job per iteration.
    var result = self.transform(Materialize.checkpoint)
    var frontier = edges
      .select(col("_e_id").as("descendant_id"), col("_e_parent").as("ancestor_id"))
      .transform(Materialize.checkpoint)
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      result = result.unionByName(frontier)
      frontier = frontier
        .join(edges, frontier("ancestor_id") === edges("_e_id"))
        .select(frontier("descendant_id"), edges("_e_parent").as("ancestor_id"))
        .distinct()
        .join(result, Seq("descendant_id", "ancestor_id"), "left_anti")
        .transform(Materialize.checkpoint)
      depth += 1
    }
    result
  }

  /** Transitive closure via Spark 4's native recursive CTE (`WITH
    * RECURSIVE` → `UnionLoop`): one query execution, no driver-side
    * fixpoint loop or per-iteration checkpoints. Spark only supports the
    * UNION ALL step form, which re-derives pairs forever on a cycle — use
    * this on inputs known to be acyclic (every hierarchy the reference
    * ships is a forest) and `transitiveClosure` when cycle tolerance is
    * required. Semantics on forests are identical.
    */
  /** Spark's recursive CTE guards against runaway recursion with a
    * 1M-row default cap (`RECURSION_ROW_LIMIT_EXCEEDED`) — sized for
    * interactive misuse, not ETL: a closure over a 2M-node forest
    * legitimately emits tens of millions of pairs (hit at sf10 by the
    * bench's error reporting). Raise the session cap, never lower it —
    * the depth cap (`cteRecursionLevelLimit`, default 100) stays, it is
    * the actual cycle guard.
    */
  private def raiseRecursionRowLimit(nodes: DataFrame): Unit = {
    val key = "spark.sql.cteRecursionRowLimit"
    val conf = nodes.sparkSession.conf
    val target = Int.MaxValue
    if (conf.getOption(key).map(_.toLong).getOrElse(1000000L) < target)
      conf.set(key, target)
  }

  def transitiveClosureRecursive(
      nodes: DataFrame, idCol: String, parentCol: String): DataFrame = {
    raiseRecursionRowLimit(nodes)
    val view = s"_graft_closure_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    // Materialize the projection once: UnionLoop re-executes the step plan
    // per level, which would otherwise re-run the source scan every level.
    nodes.select(col(idCol).as("id"), col(parentCol).as("parent"))
      .transform(Materialize.checkpoint)
      .createOrReplaceTempView(view)
    val out = nodes.sparkSession.sql(
      s"""WITH RECURSIVE th(descendant_id, ancestor_id) AS (
         |  SELECT id AS descendant_id, id AS ancestor_id FROM $view
         |  UNION ALL
         |  SELECT th.descendant_id, n.parent AS ancestor_id
         |  FROM th JOIN $view n ON th.ancestor_id = n.id
         |  WHERE n.parent IS NOT NULL
         |) SELECT descendant_id, ancestor_id FROM th""".stripMargin)
    out
  }

  /** Breadcrumbs via Spark 4's native recursive CTE — single query
    * execution instead of a per-level driver loop. Unlike the closure,
    * this shape is cycle-SAFE even with UNION ALL: paths grow strictly
    * downward from roots, so cycle components are never reached and the
    * loop drains — they surface with NULL path/breadcrumb exactly like
    * `breadcrumbs`. Only behavioral difference: forests deeper than the
    * engine recursion limit (default 100) error instead of truncating at
    * `maxDepth`.
    */
  def breadcrumbsRecursive(
      nodes: DataFrame, idCol: String, parentCol: String,
      nameCol: String): DataFrame = {
    raiseRecursionRowLimit(nodes)
    val view = s"_graft_bc_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    // Materialized once — the per-level step re-executes its scan of this
    // view, and the anchor's NOT IN needs a second pass over it.
    nodes.select(col(idCol).as("id"), col(parentCol).as("parent"),
      col(nameCol).as("name"))
      .transform(Materialize.checkpoint)
      .createOrReplaceTempView(view)
    // Orphan detection is NOT EXISTS, not NOT IN: a NOT IN over a nullable
    // subquery is a null-aware anti-join, which Spark can only execute as
    // a BroadcastNestedLoopJoin — O(n²) row comparisons in the anchor
    // (~4×10^10 at 200k nodes; the operator appeared to hang at sf1).
    // NOT EXISTS with an equality correlate plans as a hash LEFT ANTI join.
    val done = nodes.sparkSession.sql(
      s"""WITH RECURSIVE bc(id, path) AS (
         |  SELECT id, array(name) FROM $view c
         |  WHERE parent IS NULL
         |     OR NOT EXISTS (SELECT 1 FROM $view v WHERE v.id = c.parent)
         |  UNION ALL
         |  SELECT c.id, concat(p.path, array(c.name))
         |  FROM $view c JOIN bc p ON c.parent = p.id
         |) SELECT id, path FROM bc""".stripMargin)
    nodes.join(
      done.select(col("id").as(idCol), col("path"),
        concat_ws(" / ", col("path")).as("breadcrumb")),
      Seq(idCol), "left")
  }

  /** Root-to-self breadcrumb paths for a parent-pointer forest.
    *
    * Returns the input columns plus:
    *  - `path`: ArrayType(String) of names, root first, self last
    *  - `breadcrumb`: `" / "`-joined path (`dlt_fetch_timecamp.py:559-561`)
    *
    * Missing-parent tolerance matches the reference: a node whose parent id
    * does not exist in the table starts its own path (the walker stops at
    * the missing ancestor, `dlt_fetch_timecamp.py:534`). Depth is capped.
    */
  def breadcrumbs(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      nameCol: String,
      maxDepth: Int = 32): DataFrame = {
    val base = nodes
      .select(col(idCol).as("_b_id"), col(parentCol).as("_b_parent"),
        col(nameCol).as("_b_name"))
      .transform(Materialize.checkpoint)

    val ids = base.select(col("_b_id"))
    // Roots: parent NULL, or parent not present in the table (orphans).
    val roots = base
      .join(ids.withColumnRenamed("_b_id", "_p_id"),
        base("_b_parent") === col("_p_id"), "left_anti")
      .select(col("_b_id"), array(col("_b_name")).as("path"))

    // Each level is checkpointed once (the next level's join re-reads it),
    // but the ACCUMULATED result is unioned lazily at the end — re-
    // checkpointing `done` per level re-materializes O(depth × n) rows
    // for nothing (~25% of the operator at sf1/200k nodes). The final
    // union's lineage is `depth` flat union nodes over already-
    // materialized frames.
    val levels = scala.collection.mutable.ArrayBuffer(roots.transform(Materialize.checkpoint))
    var level = levels.last
    var depth = 1
    while (depth < maxDepth && !level.isEmpty) {
      val next = base
        .join(level.withColumnRenamed("_b_id", "_l_id"),
          base("_b_parent") === col("_l_id"))
        .select(base("_b_id"),
          concat(col("path"), array(col("_b_name"))).as("path"))
        .transform(Materialize.checkpoint)
      level = next
      if (!next.isEmpty) levels += next
      depth += 1
    }
    val done = levels.reduce(_ unionByName _)
    nodes.join(
      done.select(col("_b_id").as(idCol), col("path"),
        concat_ws(" / ", col("path")).as("breadcrumb")),
      Seq(idCol), "left")
  }

  /** Fan the first `levels` breadcrumb elements out to string columns
    * (`task_level_1..8` / `group_level_1..5`, empty string beyond depth —
    * `dlt_fetch_timecamp.py:563-567`). Expects a `path` array column.
    */
  def withLevelColumns(df: DataFrame, prefix: String, levels: Int): DataFrame =
    (1 to levels).foldLeft(df) { (d, i) =>
      d.withColumn(s"${prefix}_level_$i",
        coalesce(try_element_at(col("path"), lit(i)), lit("")))
    }
}
