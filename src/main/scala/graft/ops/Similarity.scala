package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (ArrayType(Float)).
  *
  * Scale notes: brute force is a broadcast nested loop of the (small) query
  * set against the corpus — one corpus scan, no shuffle of the big side,
  * then a per-query top-k window. The bucketed variant (`lshTopK`) first
  * assigns each vector to a sign-random-projection bucket so candidate
  * generation joins on the bucket key — the classic IVF/LSH trade: recall
  * for a shuffle that's O(corpus) instead of O(corpus × queries).
  */
object Similarity {

  /** Elementwise dot product of two float-array columns, accumulated in
    * Double left-to-right (deterministic evaluation order, so the DuckDB
    * oracle reproduces the exact same floating-point result).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding self), ties broken by corpus id.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Sign-random-projection bucket id: bit per hyperplane, hyperplane h =
    * deterministic ±1 pattern derived from md5(h || ':' || index) — fully
    * engine-portable, no RNG state.
    */
  def srpBucket(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { h =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            when(substring(md5(concat(lit(s"$h:"), i.cast("string"))
              .cast("binary")), 1, 1) >= "8", lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << h)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates limited to same-bucket
    * vectors, then exact cosine + rank within candidates.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      srpBucket(col(vecCol), numPlanes).as("_bkt"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      srpBucket(col(vecCol), numPlanes).as("_bkt"))
    val scored = q.join(c, Seq("_bkt"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("_qv"), col("_cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }
}
