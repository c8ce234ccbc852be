package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator` (the §2.9 UDAF pattern): keeps at
  * most k (value, id) pairs per group, ordered by value DESC then id ASC.
  *
  * This is the partial-aggregable top-k: each map task reduces its rows to
  * a k-element buffer BEFORE the shuffle, so the exchange carries
  * |groups| × k rows — where the `row_number()` window formulation
  * (`q_topk_per_group`) shuffles and sorts every row of the fact table.
  * At 100 TB the window shape is a full-data sort per group; this one is a
  * per-partition heap merge, the same contract as `min(struct(...))` for
  * k = 1 (`Transforms.firstPerGroup`).
  *
  * Buffer is a sorted Vector capped at k (k is small by contract); merge
  * is a linear merge of two sorted buffers.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(
      b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    merge(b, Vector(a))

  override def merge(
      b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAggregator {
  /** DataFrame-facing UDAF: `topK(3)(col(value), col(id))` →
    * array<struct<_1: value, _2: id>> sorted best-first.
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k))
}
