package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Min-squared-L2 codeword assignment as ONE generated loop:
  * `vec_argmin_l2(vec, codebook)` → Int index (0-based) of the codebook
  * row with the smallest squared Euclidean distance to `vec`; ties go to
  * the SMALLEST index. `codebook` must be a foldable
  * `array<array<double>>` — a plan-time model artifact, materialized once
  * per (executor, plan) as a reference object, never per row.
  *
  * The L2 sibling of [[VecArgmaxCell]] (which is cosine — the IVF/k-means
  * quantizer metric). Product quantization (Similarity.pqTrain/pqEncode)
  * assigns SUBVECTORS to per-subspace codewords by squared L2, the PQ
  * paper's metric: subvector norms carry real signal there, so a cosine
  * assignment would collapse distinct magnitudes into one codeword. Same
  * native-expression rationale as the cosine loop: k inlined literal
  * branches blow the codegen method limits and drop to interpreted past a
  * few dozen codewords, and higher-order-function formulations
  * (`aggregate`/`zip_with`) are CodegenFallback on the corpus hot path.
  *
  * Tie/rounding contract — the mirror of [[VecArgmaxCell]]'s, so a
  * literal `array_min(array(struct(round(d2, 9), idx)))` formulation is
  * interchangeable under the oracle gate: distances compare as
  * `round(d², 9)` (HALF_UP via BigDecimal.valueOf — Spark `Round`
  * bit-identity), ties take the smaller index, and a NaN distance (NaN
  * input element) ranks GREATEST — for an argMIN that means a NaN row
  * loses to every real distance, and an all-NaN scan falls back to the
  * smallest index (Spark's struct ordering under array_min: equal NaN
  * firsts, then the index field decides). Distances accumulate
  * left-to-right in double — [[VecDot]]'s portability discipline.
  *
  * Null semantics: NULL vector or NULL vector element → NULL; a vector
  * whose length differs from a codeword's → NULL. The codebook itself
  * must be non-null, non-empty, with non-null elements — it is a literal
  * the CALLER builds, so violations fail at plan time (the shared
  * [[VecArgmaxCell.parseCents]] contract), not as silent per-row NULLs.
  */
case class VecArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmin_l2"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ModelConst.isConst(right)
      case _ => false
    }
    if (vecOk && matOk) {
      // force the MEMOIZED parse here so an invalid codebook fails the
      // plan identically in interpreted and codegen modes (the
      // VecArgmaxCell lesson, verbatim)
      try { book; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "vec_argmin_l2 expects (array<float|double>, foldable-or-model_const " +
        s"array<array<double>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}${if (right.foldable) "" else ", non-foldable"})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgminL2 =
    copy(left = newLeft, right = newRight)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val book: Array[Array[Double]] =
    VecArgmaxCell.parseCents(right.eval(), prettyName)

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VecArgminL2.argmin(x, isFloat, book)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("book", book, "double[][]")
    val lf = isFloat
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val res = ctx.freshName("res")
      s"""
         |Integer $res = graft.functions.VecArgminL2.argmin(
         |  $a, $lf, $bookRef);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.intValue(); }
       """.stripMargin
    })
  }
}

object VecArgminL2 {

  /** Shared by eval and codegen. Candidate-filtered rounding (the
    * VecArgmaxCell round-9 discipline, inverted for a min): find the raw
    * minimum cheaply, round only the candidates within one 1e-9 bucket
    * of it — BigDecimal rounding per CODEWORD made the cosine argmax 10×
    * slower than its own arithmetic at production k, and the same
    * per-value cost applies here.
    */
  def argmin(
      x: ArrayData, leftIsFloat: Boolean,
      book: Array[Array[Double]]): Integer = {
    val n = x.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val k = book.length
    val d2 = new Array[Double](k)
    var sawReal = false
    var rawMin = Double.PositiveInfinity
    var j = 0
    while (j < k) {
      val c = book(j)
      if (c.length != n) return null
      var s = 0.0
      i = 0
      while (i < n) { val d = v(i) - c(i); s += d * d; i += 1 }
      d2(j) = s
      if (s == s) { sawReal = true; if (s < rawMin) rawMin = s }
      j += 1
    }
    // all-NaN (NaN input element poisons every distance): smallest index
    // — the struct-ordering fallback documented on the expression
    if (!sawReal) return Integer.valueOf(0)
    // unlike a cosine (bounded ±1), d² has no a-priori bound: past ~9e9
    // the 1e-9-unit Long representation overflows (longValueExact throws
    // mid-row) AND a double's own ulp already exceeds 1e-9, so rounded
    // and raw comparison are the same relation — take the raw argmin
    if (rawMin > 1e9) {
      j = 0
      while (j < k) { if (d2(j) == rawMin) return Integer.valueOf(j); j += 1 }
    }
    val s9min = VecArgmaxCell.round9(rawMin)
    j = 0
    while (j < k) {
      val dj = d2(j)
      if (dj <= rawMin + 1.5e-9 && VecArgmaxCell.round9(dj) == s9min)
        return Integer.valueOf(j)
      j += 1
    }
    Integer.valueOf(-1) // unreachable: the rawMin codeword always matches
  }
}
