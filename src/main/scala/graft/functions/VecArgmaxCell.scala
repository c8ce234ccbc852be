package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Max-cosine centroid assignment as ONE generated loop:
  * `vec_argmax_cell(vec, centsMatrix)` → Int index (0-based) of the
  * centroid with the highest cosine to `vec`; ties go to the SMALLEST
  * index. `centsMatrix` must be a foldable `array<array<double>>` — a
  * plan-time model artifact, materialized once per (executor, plan) as a
  * reference object, never per row.
  *
  * Why native (the SURVEY §2.9 decision table, same tier as [[VecDot]]):
  * the alternative shapes both fail at production cell counts, measured
  * at sf1 (20k vectors, k = 141, SCALE.md round 8):
  *  - k inlined literal cosine branches (`array_max(array(struct...))`)
  *    blow the Janino/JVM method limits past a few dozen centroids and
  *    the whole projection drops to INTERPRETED evaluation — 16.5 s;
  *  - a broadcast centroid join + argmax aggregation pays a k-fold row
  *    multiply and a corpus shuffle — 6.7-8.2 s even with the argmax
  *    packed into a primitive `max()` buffer.
  *  This expression is the same k×dim work as the literal path but as a
  *  LOOP instead of unrolled branches: whole-stage codegen compiles it
  *  at any k, zero shuffle, zero extra rows.
  *
  * Tie/rounding contract — IDENTICAL to the literal path so the two are
  * interchangeable under the oracle gate: scores compare as
  * `round(cos, 9)` (HALF_UP, Spark's `Round` semantics, computed here
  * via BigDecimal into exact 1e-9 units), ties take the smaller index,
  * and a NaN cosine (zero-norm vector or centroid) ranks GREATEST,
  * matching Spark's double ordering in `array_max`. Dot products and
  * norms accumulate left-to-right in double — [[VecDot]]'s portability
  * discipline.
  *
  * Null semantics: NULL vector or NULL vector element → NULL; a vector
  * whose length differs from a centroid's → NULL (mirrors vec_dot on
  * length mismatch). The matrix itself must be non-null, non-empty, with
  * non-null elements — it is a literal the CALLER builds, so violations
  * throw at plan time rather than yielding per-row NULLs.
  */
case class VecArgmaxCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmax_cell"

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
      // reject a NULL/empty/null-row matrix HERE, not lazily:
      // interpreted eval null-short-circuits before the matrix is ever
      // forced (silent per-row NULLs), codegen forces it at codegen
      // time (a crash mid-planning) — the documented contract is one
      // plan-time failure, identical in both execution modes. Forcing
      // the MEMOIZED `cents` (not a bare right.eval()) means the k×dim
      // interpreted literal walk runs once per expression instance even
      // when analysis re-checks across passes.
      try { cents; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "vec_argmax_cell expects (array<float|double>, foldable-or-model_const " +
        s"array<array<double>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}${if (right.foldable) "" else ", non-foldable"})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecArgmaxCell =
    copy(left = newLeft, right = newRight)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // the model artifact: evaluated ONCE from the foldable child, shipped
  // to executors inside the (serialized) expression / as a codegen
  // reference object
  @transient private lazy val cents: Array[Array[Double]] =
    VecArgmaxCell.parseCents(right.eval(), prettyName)

  @transient private lazy val cnorms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(v: Any, m: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    VecArgmaxCell.argmax(x, isFloat, cents, cnorms)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cnormsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val lf = isFloat
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val res = ctx.freshName("res")
      s"""
         |Integer $res = graft.functions.VecArgmaxCell.argmax(
         |  $a, $lf, $centsRef, $cnormsRef);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res.intValue(); }
       """.stripMargin
    })
  }
}

object VecArgmaxCell {

  /** Parse + validate the foldable centroid-matrix literal — shared by
    * vec_argmax_cell and vec_top_cells so the plan-time contract ("the
    * matrix must be non-null, non-empty, with non-null rows AND
    * elements — violations fail at plan time") lives in exactly one
    * place. The per-ELEMENT check matters: ArrayData.toDoubleArray
    * unboxes a null element to 0.0, which would silently corrupt a
    * centroid (every row then scores against the wrong vector) instead
    * of failing the plan.
    */
  private[functions] def parseCents(
      evaluated: Any, name: String): Array[Array[Double]] = {
    val arr = evaluated.asInstanceOf[ArrayData]
    require(arr != null && arr.numElements() > 0,
      s"$name: empty or null centroid matrix")
    Array.tabulate(arr.numElements()) { j =>
      val c = arr.getArray(j)
      require(c != null, s"$name: null centroid row $j")
      var i = 0
      while (i < c.numElements()) {
        require(!c.isNullAt(i),
          s"$name: null element $i in centroid row $j — repair the " +
            "model artifact (a null would silently read as 0.0)")
        i += 1
      }
      c.toDoubleArray()
    }
  }

  /** Shared by eval and codegen (one hand-tuned loop beats two copies;
    * the JIT inlines it — the per-row work is k×dim multiplies, and the
    * method boundary is noise next to them). Returns null (boxed) on the
    * NULL cases documented on the expression.
    */
  def argmax(
      x: ArrayData, leftIsFloat: Boolean,
      cents: Array[Array[Double]], cnorms: Array[Double]): Integer = {
    val n = x.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      v(i) = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    var nv = 0.0
    i = 0
    while (i < n) { nv += v(i) * v(i); i += 1 }
    nv = math.sqrt(nv)
    // Phase A: raw cosines only. The comparison contract is on
    // round(cos, 9) — but BigDecimal.valueOf (Double.toString semantics,
    // what Spark's Round codegen uses and therefore what bit-identity
    // with the literal path requires) costs ~100× a 64-element dot
    // product, and running it per CELL made the k=469 production
    // assignment 10× slower than its own arithmetic (measured at the
    // 220k decade, round 9). Rounding is monotone in the real value, so
    // the rounded argmax lies among the cells within one 1e-9 bucket of
    // the raw max — find the raw max cheaply, then round only those.
    val k = cents.length
    val cos = new Array[Double](k)
    var firstNaN = -1
    var rawMax = Double.NegativeInfinity
    var j = 0
    while (j < k) {
      val c = cents(j)
      if (c.length != n) return null
      var dot = 0.0
      i = 0
      while (i < n) { dot += v(i) * c(i); i += 1 }
      val cj = dot / (nv * cnorms(j))
      cos(j) = cj
      if (cj != cj) { if (firstNaN < 0) firstNaN = j }
      else if (cj > rawMax) rawMax = cj
      j += 1
    }
    // NaN ranks greatest (Spark's double ordering in array_max); ties
    // keep the first (smallest) index — so any NaN cell wins outright.
    if (firstNaN >= 0) return Integer.valueOf(firstNaN)
    // Phase B: exact decimal rounding, candidates only. Two doubles with
    // equal round9 lie strictly within 1e-9 of each other; 1.5e-9 adds
    // ulp margin. False positives just pay one extra round9 — the
    // EQUALITY check below is the exact contract, the filter is only a
    // guard against paying it k times.
    val s9max = round9(rawMax)
    j = 0
    while (j < k) {
      val cj = cos(j)
      if (cj >= rawMax - 1.5e-9 && round9(cj) == s9max)
        return Integer.valueOf(j)
      j += 1
    }
    Integer.valueOf(-1) // unreachable: the rawMax cell always matches
  }

  /** round(d, 9) in exact 1e-9 units — BigDecimal.valueOf
    * (Double.toString semantics), NOT the exact binary-expansion
    * constructor, because that is what Spark's Round codegen uses; the
    * two can HALF_UP differently at 9th-decimal halfway points, and the
    * contract here is bit-identity with the literal round(cos, 9) path.
    */
  private[functions] def round9(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(9, java.math.RoundingMode.HALF_UP)
      .movePointRight(9).longValueExact()
}
