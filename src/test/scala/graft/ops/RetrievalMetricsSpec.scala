package graft.ops

import graft.SparkSpec

/** Hand-computed golden pins for [[Similarity.retrievalMetrics]]: the
  * three conventions (recall over the truth's own depth, MRR = 0 on
  * no-hit, binary nDCG with the IDCG fold) on a fixture small enough to
  * verify on paper.
  */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("recall@k / MRR / nDCG@k: exact hand values, missing-query zeros, " +
    "truth-depth recall, k guard") {
    // truth: q1 → [10, 11, 12]; q2 → [20]; q3 → [30, 31]
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1),
      (3L, 30L, 1), (3L, 31L, 2)
    ).toDF("query_id", "neighbor_id", "rank")
    // results: q1 hits 11 at rank 1 and 12 at rank 3 (10 missed);
    // q2 misses entirely; q3 absent from results (scores all-zero)
    val results = Seq(
      (1L, 11L, 1), (1L, 99L, 2), (1L, 12L, 3),
      (2L, 98L, 1), (2L, 97L, 2)
    ).toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.retrievalMetrics(results, truth, 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // q1: 2/3 recall; MRR 1/1; DCG = 1/log2(2) + 1/log2(4) = 1.5;
    //     IDCG = 1 + 1/log2(3) + 1/2
    val idcg1 = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(got(1L) === ((3L, 2L, r6(2.0 / 3), 1.0, r6(1.5 / idcg1))))
    // q2: one relevant, no hit → all zeros
    assert(got(2L) === ((1L, 0L, 0.0, 0.0, 0.0)))
    // q3: absent from results entirely → zeros over its 2 relevants
    assert(got(3L) === ((2L, 0L, 0.0, 0.0, 0.0)))
    // truth-depth recall: at k = 1 the truth window shrinks to rank 1,
    // so q1's hit at rank 1 (neighbor 11) is NOT the rank-1 truth (10)
    val atK1 = Similarity.retrievalMetrics(results, truth, 1)
      .where($"query_id" === 1L).select("recall").as[Double].head()
    assert(atK1 === 0.0, s"k=1 window must use truth rank 1 only: $atK1")
    val bad = intercept[IllegalArgumentException] {
      Similarity.retrievalMetrics(results, truth, 0)
    }
    assert(bad.getMessage.contains("k >= 1"))
  }
}
