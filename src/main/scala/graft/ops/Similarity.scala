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
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** Sign-random-projection bucket id: bit per hyperplane, hyperplane h =
    * deterministic ±1 pattern derived from md5(h || ':' || index) — fully
    * engine-portable, no RNG state. The sign patterns are plan-time
    * constants, precomputed on the driver and inlined as literal arrays:
    * evaluating md5 per row × element would redo ~dim × planes digests of
    * constants on every row of a 100 TB corpus.
    */
  private def srpSign(plane: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (hex.charAt(0) >= '8') 1.0 else -1.0 // same test as substr(md5,1,1) >= '8'
  }

  private val srpMaxDim = 4096

  def srpBucket(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { h =>
      val signs = lit((0 until srpMaxDim).map(srpSign(h, _)).toArray)
      val proj = aggregate(
        zip_with(vec, slice(signs, lit(1), size(vec)),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1 << h)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Embedding-cosine near-duplicate pairs, LSH-blocked: vectors sharing a
    * sign-random-projection bucket are compared exactly; pairs with cosine
    * >= threshold survive. One corpus pass for bucketing, one shuffle to
    * group bucket members, pairs generated in-bucket — never O(n²) across
    * the corpus (the standard recall-for-throughput trade; raise numPlanes
    * to shrink buckets at larger corpora).
    */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 4): DataFrame = {
    // Norms ride along with each vector so the per-pair score is one dot
    // product, not three (norms would otherwise be recomputed for every
    // pair a vector participates in).
    val bucketed = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_v"),
        srpBucket(col(vecCol), numPlanes).as("_bkt"))
      .select(col("_id"), col("_v"), col("_bkt"), norm(col("_v")).as("_n"))
      .groupBy("_bkt")
      .agg(sort_array(collect_list(
        struct(col("_id"), col("_v"), col("_n")))).as("_m"))
      .where(size(col("_m")) > 1)
    bucketed
      .select(explode(flatten(transform(col("_m"), (a, i) =>
        transform(slice(col("_m"), i + lit(2), size(col("_m"))),
          b => struct(
            a.getField("_id").as("id_a"),
            b.getField("_id").as("id_b"),
            (dot(a.getField("_v"), b.getField("_v")) /
              (a.getField("_n") * b.getField("_n"))).as("score"))))))
        .as("_p"))
      .select(col("_p.id_a"), col("_p.id_b"),
        round(col("_p.score"), 6).as("score"))
      .where(col("score") >= threshold)
      .distinct()
  }

  /** IVF (inverted-file) approximate top-k. Coarse quantizer = the first
    * `nCentroids` corpus vectors by id (deterministic, oracle-replicable;
    * a production build would train k-means centroids offline). Every
    * vector is assigned to its max-cosine centroid (ties → smaller
    * centroid id); search compares the query only against its own cell.
    * The centroid set is broadcast, so assignment is a map-side pass over
    * the corpus — the shuffle is one hash partition by cell id.
    */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nCentroids: Int = 4): DataFrame = {
    // Centroids live on the driver (an IVF coarse quantizer is a model
    // artifact, not data) and are inlined as literals — cell assignment is
    // then a pure map-side projection, no join, no shuffle of the corpus.
    val cents = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(nCentroids).collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble // exact widening, matches CAST(FLOAT AS DOUBLE)
        case d: Double => d
        case n: java.lang.Number => n.doubleValue
      }))
    def cell(v: Column): Column =
      array_max(array(cents.map { case (cid, cv) =>
        val cvLit = array(cv.map(lit): _*)
        struct(round(cosine(v, cvLit), 9).as("s"),
          lit(-cid).as("nid"))
      }: _*)).getField("nid") * -1
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      cell(col(vecCol)).as("_cell"), norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      cell(col(vecCol)).as("_cell"), norm(col(vecCol)).as("_cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    q.join(c, Seq("_cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }

  /** LSH-bucketed approximate top-k: candidates limited to same-bucket
    * vectors, then exact cosine + rank within candidates.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      srpBucket(col(vecCol), numPlanes).as("_bkt"),
      norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      srpBucket(col(vecCol), numPlanes).as("_bkt"),
      norm(col(vecCol)).as("_cn"))
    val scored = q.join(c, Seq("_bkt"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("score",
        dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "score")
  }
}
