package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear (fastText-style) quality-classifier scoring as a native
  * Catalyst expression: `classifier_score(tokens, weights, bias)` →
  * Double, the rational-sigmoid squash of `bias + mean token weight`.
  *
  * Byte-identical to the composed higher-order-function form it
  * replaces (`aggregate(ts, 0.0, (acc, t) => acc +
  * coalesce(element_at(wm, t), 0.0))` + the `when(size > 0, ...)` mean
  * + `0.5·(1 + z/(1+|z|))`) — the fold adds `weight-or-0.0` per token
  * IN ARRAY ORDER, the mean divides by the token count as double, and
  * every operation is plain IEEE arithmetic, so the pre-round score
  * compares bit-for-bit with the retired form AND with the DuckDB
  * twin's `list_reduce` chain (ClassifierScoreExprSpec pins the first
  * equivalence property-style; the graded oracle rows pin the second).
  * NULL tokens input (NULL text upstream — `ws_tokens` is
  * null-intolerant) scores `squash(bias)`, never NULL: the composed
  * form's `when(size(ts) > 0, ...)` treated a NULL condition as false
  * and fell through to the bias-only arm, and that behavior is part of
  * the graded contract. Hence `nullable = false` and a custom
  * `doGenCode` instead of `nullSafeCodeGen`.
  *
  * Why native (the `ws_tokens` playbook, applied to the last
  * CodegenFallback on a graded hot path): the Catalyst `aggregate` HOF
  * is CodegenFallback, which fences the WHOLE projection containing it
  * out of whole-stage codegen — and this expression sits in the stage-1
  * scan of all six curation composites (~40% of the bench's wall time)
  * plus the standalone `q_quality_classifier` row. Worse, per token the
  * HOF's `element_at` on a literal map is a LINEAR SCAN of the map's
  * key array (Catalyst map literals are array-backed, unhashed), so the
  * composed form pays O(tokens × |vocab|) comparisons per row. Here
  * the foldable weights literal is parsed ONCE per plan into a
  * `java.util.HashMap[UTF8String, Double]` shipped as a reference
  * object (the `bpe_encode` merges-table pattern) — O(tokens) hashed
  * probes per row, inside one generated loop, no codegen fence
  * (CodegenBudgetSpec pins the consumer's WholeStageCodegen span).
  *
  * `weights` must be a foldable `map<string, double>`; a NULL weights
  * literal fails at PLAN time (a weight table that failed to load must
  * not silently score every document with bias alone — the
  * model-artifact-fails-at-plan-time contract of `vec_argmax_cell` /
  * `bpe_encode`). An EMPTY map stays legal at this layer; the ops
  * entry point (`Text.classifierScore`) keeps its non-empty require.
  * `bias` must be a foldable double. NULL map VALUES weigh 0.0 —
  * `coalesce(element_at(...), 0.0)` semantics, kept for drop-in
  * equivalence.
  */
case class ClassifierScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "classifier_score"

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokensOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    val weightsOk = second.dataType match {
      case MapType(StringType, DoubleType, _) => second.foldable
      case _ => false
    }
    val biasOk = third.dataType == DoubleType && third.foldable
    if (tokensOk && weightsOk && biasOk) {
      try { table; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "classifier_score expects (array<string>, foldable map<string,double>, " +
        s"foldable double), got (${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}${if (second.foldable) "" else ", non-foldable"}, " +
        s"${third.dataType.simpleString}${if (third.foldable) "" else ", non-foldable"})")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ClassifierScore =
    copy(first = newFirst, second = newSecond, third = newThird)

  @transient private lazy val table: ClassifierScore.Weights = {
    val m = second.eval().asInstanceOf[MapData]
    if (m == null) throw new IllegalArgumentException(
      "classifier_score: weights map literal is NULL — a weight table " +
        "that failed to load must not silently score every doc with " +
        "bias alone")
    val b = third.eval()
    if (b == null) throw new IllegalArgumentException(
      "classifier_score: bias literal is NULL")
    val keys = m.keyArray()
    val vals = m.valueArray()
    val n = m.numElements()
    val hm = new java.util.HashMap[UTF8String, java.lang.Double](
      Math.max(8, n * 2))
    var i = 0
    while (i < n) {
      // clone: literal-backed UTF8Strings are stable, but the map
      // outlives the eval call and a defensive copy is one-time cost
      val w = if (vals.isNullAt(i)) 0.0 else vals.getDouble(i)
      hm.put(keys.getUTF8String(i).clone(), w)
      i += 1
    }
    ClassifierScore.Weights(hm, b.asInstanceOf[Double])
  }

  override def eval(input: InternalRow): Any = {
    val arr = first.eval(input)
    ClassifierScore.score(arr.asInstanceOf[ArrayData], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("classifierWeights", table,
      classOf[ClassifierScore.Weights].getName)
    val tokensGen = first.genCode(ctx)
    // NULL tokens must reach score() as a Java null (→ squash(bias)),
    // so the null check folds into the argument, not into ev.isNull.
    val arrArg =
      if (first.nullable)
        s"(${tokensGen.isNull} ? null : ${tokensGen.value})"
      else tokensGen.value
    ev.copy(
      code = code"""
        ${tokensGen.code}
        double ${ev.value} = graft.functions.ClassifierScore.score($arrArg, $ref);
      """,
      isNull = FalseLiteral)
  }
}

object ClassifierScore {

  /** The plan-time-parsed model artifact: hashed vocab→weight table +
    * bias, shipped to executors once as a codegen reference object.
    */
  final case class Weights(
      map: java.util.HashMap[UTF8String, java.lang.Double], bias: Double)

  /** The full scoring kernel — fold, mean, rational sigmoid. Kept as
    * ONE static method used by both eval paths so interpreted and
    * codegen'd execution cannot drift. `arr == null` models NULL text
    * (score = squash(bias), the composed form's fall-through arm).
    */
  def score(arr: ArrayData, w: Weights): Double = {
    var z = w.bias
    if (arr != null) {
      val n = arr.numElements()
      if (n > 0) {
        var acc = 0.0
        var i = 0
        while (i < n) {
          // NULL elements contribute 0.0 (the composed form's
          // coalesce(element_at, ...) arm) — the tokenizer never emits
          // them, but the function is SQL-registered so user-built
          // arrays with NULL slots must not read undefined bytes
          if (!arr.isNullAt(i)) {
            val e = w.map.get(arr.getUTF8String(i))
            // unconditional add of weight-or-0.0: bit-identical to the
            // retired fold's `acc + coalesce(element_at, 0.0)` even at
            // the -0.0 edge
            acc += (if (e == null) 0.0 else e.doubleValue())
          }
          i += 1
        }
        z += acc / n.toDouble
      }
      // n == 0: z stays bias — the composed form's otherwise(0.0) arm
    }
    0.5 * (1.0 + z / (1.0 + Math.abs(z)))
  }
}
