package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Derives a reference-shaped task hierarchy + entries from the TPC-H-ish
  * testdata, so the recursive-report operators have a deterministic oracle
  * (the DuckDB side derives the identical tree — see SparkEntry.oracleSql).
  *
  * Tree: task k's parent is k/10 (integer division); k < 10 are roots.
  * IDs are strings, like the reference (`FIXTURES.md` convention). Floors
  * (not casts) convert doubles → longs: Spark's ANSI double→long cast
  * truncates while DuckDB's rounds, so only floor/round are portable.
  */
object TaskTree {

  def tasks(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part").select(
      col("p_partkey").cast("string").as("task_id"),
      when(col("p_partkey") >= 10,
        floor(col("p_partkey") / 10).cast("long").cast("string"))
        .as("parent_id"),
      col("p_name").as("name"),
      (floor(col("p_retailprice")).cast("long") * 10).as("budgeted"))

  def entries(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem").select(
      col("l_partkey").cast("string").as("task_id"),
      (floor(col("l_quantity")).cast("long") * 60).as("duration"))

  /** The DuckDB-SQL rendering of the same derivation (shared by several
    * oracle queries).
    */
  val tasksSql: String =
    """SELECT CAST(p_partkey AS VARCHAR) AS task_id,
      | CASE WHEN p_partkey >= 10 THEN CAST(p_partkey // 10 AS VARCHAR) END AS parent_id,
      | p_name AS name,
      | CAST(FLOOR(p_retailprice) AS BIGINT) * 10 AS budgeted
      |FROM part""".stripMargin.replace("\n", " ")

  val entriesSql: String =
    """SELECT CAST(l_partkey AS VARCHAR) AS task_id,
      | CAST(FLOOR(l_quantity) AS BIGINT) * 60 AS duration
      |FROM lineitem""".stripMargin.replace("\n", " ")

  val closureSql: String =
    s"""WITH RECURSIVE t AS ($tasksSql),
       |th AS (
       |  SELECT task_id AS descendant_id, task_id AS ancestor_id FROM t
       |  UNION ALL
       |  SELECT th.descendant_id, t.parent_id
       |  FROM th JOIN t ON th.ancestor_id = t.task_id
       |  WHERE t.parent_id IS NOT NULL)""".stripMargin.replace("\n", " ")
}
