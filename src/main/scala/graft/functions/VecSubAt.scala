package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** `vec_sub_at(vec, mat, idx)` → `array<double>`: `vec − mat[idx]`, the
  * per-cell residual of the IVFADC residual arm
  * (`Similarity.ivfPqResiduals`) as ONE generated loop over the matrix
  * reference object.
  *
  * Why an expression: the composed form
  * (`zip_with(vec, element_at(matLit, cell), (a, b) -> a - b)`) is a
  * higher-order lambda — CodegenFallback — and it sits UNDER the m
  * per-subspace `slice(...)` arguments of the encode's `vec_argmin_l2`
  * calls, so interpreted evaluation recomputes the whole subtraction (and
  * the map lookup) once per subspace per row while also knocking the
  * projection out of whole-stage codegen. Measured on the 22k-corpus
  * RecallBench residual legs: 26–30 s per ivfPqTopK call with the lambda
  * vs the raw arm's 2 s — this loop closes that gap (numbers in SCALE.md
  * round 12). Same doctrine as `vec_argmax_cell`/`vec_argmin_l2`: model
  * matrices ride as plan-time reference objects, corpus-side arithmetic
  * stays in generated loops.
  *
  * Arithmetic contract: elementwise `double(vec[i]) − mat[idx][i]`, exact
  * IEEE subtraction (no rounding, no accumulation) — bit-identical to the
  * lambda form and to the DuckDB twin's `CAST(v[i] AS DOUBLE) − cv[i]`,
  * so swapping the implementations cannot move a graded rank.
  *
  * Null semantics (the family's poison discipline): NULL vec, NULL vec
  * element, NULL idx, idx out of `[0, mat.length)`, or a vec whose length
  * differs from `mat[idx]`'s → NULL row (downstream encode poisons to
  * NULL codes; a probe row drops at its `_cell` join). The matrix is a
  * caller-built literal — violations fail at plan time via the shared
  * [[VecArgmaxCell.parseCents]] contract, not as per-row NULLs. NaN
  * elements pass through (NaN − x = NaN): the consumer's argmin/table
  * build owns NaN ranking, same as a raw vector.
  */
case class VecSubAt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sub_at"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ModelConst.isConst(second)
      case _ => false
    }
    val idxOk = third.dataType == IntegerType
    if (vecOk && matOk && idxOk) {
      // force the memoized parse so an invalid matrix fails the plan
      // identically in interpreted and codegen modes
      try { mat; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "vec_sub_at expects (array<float|double>, foldable-or-model_const " +
        "array<array<double>>, int), got (" +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}" +
        s"${if (second.foldable) "" else " non-foldable"}, " +
        s"${third.dataType.simpleString})")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecSubAt =
    copy(first = f, second = s, third = t)

  private def isFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val mat: Array[Array[Double]] =
    VecArgmaxCell.parseCents(second.eval(), prettyName)

  override def nullSafeEval(v: Any, m: Any, i: Any): Any =
    VecSubAt.subAt(v.asInstanceOf[ArrayData], isFloat, mat,
      i.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val lf = isFloat
    nullSafeCodeGen(ctx, ev, (a, _, i) => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.VecSubAt.subAt($a, $lf, $matRef, $i);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }
}

object VecSubAt {

  /** Shared by eval and codegen. */
  def subAt(
      x: ArrayData, leftIsFloat: Boolean,
      mat: Array[Array[Double]], idx: Int): ArrayData = {
    if (idx < 0 || idx >= mat.length) return null
    val c = mat(idx)
    val n = x.numElements()
    if (n != c.length) return null
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = v - c(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}
