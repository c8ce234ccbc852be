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
  * Buffer is a sorted Vector capped at k (k is small by contract).
  * `reduce` is an O(k) bounded insertion with an O(1) reject of rows
  * that cannot make the cut (the overwhelmingly common case on the map
  * side at corpus scale); `merge` is a linear merge of two sorted
  * buffers.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // k <= 0 would make reduce's full-buffer fast path call b.last on an
  // empty buffer (b.size >= k holds vacuously) and throw mid-job
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(
      b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    // O(1) reject when the buffer is full and `a` can't beat the worst
    // kept row; otherwise a single O(k) ordered insertion — the previous
    // (b ++ Vector(a)).sorted was an O(k log k) allocation-heavy re-sort
    // PER INPUT ROW, on the map-side path this class exists for
    if (b.size >= k && ord.gteq(a, b.last)) b
    else {
      val i = b.indexWhere(e => ord.gt(e, a)) match {
        case -1 => b.size
        case n => n
      }
      val inserted = (b.take(i) :+ a) ++ b.drop(i)
      if (inserted.size > k) inserted.take(k) else inserted
    }
  }

  override def merge(
      b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    // linear merge of two sorted buffers, capped at k
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < b1.size || j < b2.size)) {
      val takeLeft = j >= b2.size ||
        (i < b1.size && ord.lteq(b1(i), b2(j)))
      if (takeLeft) { out += b1(i); i += 1 } else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
  }

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
