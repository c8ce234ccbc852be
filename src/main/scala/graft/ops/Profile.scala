package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: per-column row counts, null counts, cardinality and
  * min/max — the data-quality summary every ingest step of a training-data
  * pipeline runs before trusting a new drop (the reference relies on dlt's
  * implicit schema report; this is the queryable equivalent).
  *
  * Two variants with one output schema:
  *  - [[profile]] — EXACT distinct counts. Catalyst rewrites the
  *    multi-column DISTINCT aggregate into an Expand (one duplicated row
  *    per profiled column), so the shuffle is |cols| × |rows| — fine for
  *    dimension-sized tables and for the DuckDB oracle twin.
  *  - [[profileApprox]] — HLL++ `approx_count_distinct` per column: ONE
  *    pass, no Expand, constant memory per column. This is the 100 TB
  *    path; its estimates are spec-checked against exact counts within
  *    the sketch's documented error.
  *
  * Both profile every column in ONE aggregate job (no per-column scans),
  * and min/max compare through a string cast so the output schema is
  * column-type-agnostic (lexicographic on both engines).
  */
object Profile {

  private def metrics(exact: Boolean)(c: String) = Seq(
    count(col(c)).as(s"_n_$c"),
    (if (exact) countDistinct(col(c))
    else approx_count_distinct(col(c))).as(s"_d_$c"),
    min(col(c).cast("string")).as(s"_min_$c"),
    max(col(c).cast("string")).as(s"_max_$c"))

  private def build(df: DataFrame, cols: Seq[String], exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(metrics(exact))
    val one = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"_n_$c").as("n_nonnull"),
        (col("_total") - col(s"_n_$c")).as("n_null"),
        col(s"_d_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    build(df, cols, exact = true)

  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    build(df, cols, exact = false)

  /** Oracle-gradeable twin of [[profileApprox]]: runs the HLL++ sketch AND
    * the exact distinct in the same single aggregate and grades the sketch
    * in-engine — `within_bound` asserts |approx − exact| ≤ 6×rsd×exact
    * (default rsd 0.05 → 30%), the same error-bound-contract pattern as
    * the `q_approx_distinct` query. The hash-graded bound is deliberately
    * 6×rsd, not 3×rsd: the HLL error is probabilistic, and at 3σ a
    * ~0.3%-tail sketch miss on otherwise-correct code would flip the flag
    * and read as a semantics regression in the oracle gate; at 6σ the tail
    * is ~1e-9 while real estimator breakage (typically off by far more)
    * still fails loudly. The tight 3×rsd contract is asserted in
    * ProfileSpec, outside the hash comparison. The deterministic columns
    * (counts, exact distinct, min/max, flag) are what the DuckDB twin
    * reproduces; the sketch value itself never leaves the engine. At
    * 100 TB the deployed path is [[profileApprox]] (no exact-distinct
    * Expand); this variant exists so that path's estimator has a
    * CORRECTNESS row.
    */
  def profileApproxChecked(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      metrics(exact = true)(c) :+
        approx_count_distinct(col(c)).as(s"_a_$c")
    }
    val one = df.agg(count(lit(1)).as("_total"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"_n_$c").as("n_nonnull"),
        (col("_total") - col(s"_n_$c")).as("n_null"),
        col(s"_d_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"),
        (abs(col(s"_a_$c") - col(s"_d_$c")).cast("double") <=
          col(s"_d_$c").cast("double") * 0.30).as("within_bound"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
