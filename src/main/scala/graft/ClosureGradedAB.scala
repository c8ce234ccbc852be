package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Round-8 adjudicator for the `q_transitive_closure` variant ship:
  * times doubling vs recursive-CTE vs iterative under the GRADED
  * harness's exact conditions, which `ABBench closure` does not
  * reproduce — ABBench runs a dedicated session with the tasks input
  * cached and no prior suite traffic, and its winner (doubling) moved
  * the graded row 0.997 s → 1.386 s when shipped (round-7 verdict,
  * "What's wrong" #2). Differences replicated here, each of which can
  * flip a sub-2 s measurement:
  *   - session built with Bench's builder (AQE explicitly on, WARN log
  *     level, same shuffle-partition default);
  *   - input read fresh from parquet per execution (never cached);
  *   - the FULL query suite executes once first, so the JVM/codegen/
  *     shuffle state matches what the graded row sees mid-suite;
  *   - variants then run as interleaved rounds and the per-variant MIN
  *     is reported (Bench's min-of-2 aggregation).
  * Usage: sbt "runMain graft.ClosureGradedAB [sfDir] [rounds] [case]"
  *   case = closure (default) | breadcrumb — the breadcrumb ship rests
  *   on the same dedicated-session A/B that misled the closure ship, so
  *   it gets the same graded-conditions adjudication.
  */
object ClosureGradedAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val which = if (args.length > 2) args(2) else "closure"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Bench's table warmup, then one full-suite pass: the graded row's
    // timing context is "mid-suite on a warm session", not "first query
    // on a fresh one".
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach(t => Tables(spark, sfDir, t).count())
    val t0 = System.nanoTime()
    var skipped = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      // the warm pass builds JVM/codegen/shuffle context, it does not
      // grade: a query whose scale guard trips at an off-grading SF
      // (e.g. the cosine banding SLA at sf1's embedding count) is
      // skipped, not fatal
      try force(fn(spark, sfDir))
      catch { case e: Exception =>
        skipped += 1
        System.err.println(s"CLOSUREAB warm skip $name: ${e.getMessage.linesIterator.next()}")
      }
    }
    println(f"CLOSUREAB suite warm pass: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
      (if (skipped > 0) s" ($skipped skipped)" else ""))

    def tasks() = reports.TaskTree.tasks(spark, sfDir)
    val variants: Seq[(String, () => DataFrame)] = which match {
      // the WHOLE flagship report with the closure variant swapped inside
      // it — the round-13 verdict's ask: close the iterative-vs-doubling
      // question with a number measured in the report's own context
      case "budget" => Seq(
        "report_recursive" -> (() => reports.BudgetReport(
          tasks(), reports.TaskTree.entries(spark, sfDir))),
        "report_doubling" -> (() => reports.BudgetReport(
          tasks(), reports.TaskTree.entries(spark, sfDir),
          doublingClosure = true)))
      case "breadcrumb" => Seq(
        "doubling" -> (() => ops.Closure.breadcrumbsDoubling(
          tasks(), "task_id", "parent_id", "name")
          .select(col("task_id"), col("breadcrumb"))),
        "recursive" -> (() => ops.Closure.breadcrumbsRecursive(
          tasks(), "task_id", "parent_id", "name")
          .select(col("task_id"), col("breadcrumb"))),
        "iterative" -> (() => ops.Closure.breadcrumbs(
          tasks(), "task_id", "parent_id", "name")
          .select(col("task_id"), col("breadcrumb"))))
      case _ => Seq(
        "doubling" -> (() => ops.Closure.transitiveClosureDoubling(
          tasks(), "task_id", "parent_id")),
        "recursive" -> (() => ops.Closure.transitiveClosureRecursive(
          tasks(), "task_id", "parent_id")),
        "iterative" -> (() => ops.Closure.transitiveClosure(
          tasks(), "task_id", "parent_id")))
    }
    val times = (1 to rounds).map { _ =>
      variants.map { case (name, f) =>
        val s0 = System.nanoTime()
        force(f())
        name -> (System.nanoTime() - s0) / 1e9
      }.toMap
    }
    variants.foreach { case (name, _) =>
      val ts = times.map(_(name))
      println(f"CLOSUREAB $which/$name: ${ts.map(t => f"$t%.3f").mkString("/")} s " +
        f"min=${ts.min}%.3f s")
    }
    spark.stop()
  }
}
