package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Top-p max-cosine centroid assignment as ONE generated loop:
  * `vec_top_cells(vec, centsMatrix, p)` → `array<int>` of the 0-based
  * indices of the `min(p, k)` centroids closest to `vec` by cosine —
  * the multi-probe generalization of [[VecArgmaxCell]] (nprobe > 1 is
  * the standard IVF recall lever: probe the query's p nearest cells
  * instead of only the argmax cell).
  *
  * ORDER AND TIE CONTRACT — element 0 is IDENTICAL to
  * `vec_argmax_cell(vec, centsMatrix)` by construction (spec-pinned),
  * so `nprobe = 1` probes are bit-identical to the single-probe path:
  * cells rank by `round(cos, 9)` DESC (HALF_UP via BigDecimal.valueOf,
  * [[VecArgmaxCell.round9]] — the single definition), ties take the
  * smaller index, and NaN cosines (zero-norm vector or centroid) rank
  * GREATEST, ordered among themselves by index.
  *
  * Cost discipline (the round-9 candidate-filter lesson — per-value
  * costs invisible at oracle scale must stay off the hot path even
  * though this expression runs on QUERY batches, never the corpus):
  * raw cosines first, one O(k log k) primitive sort to find the p-th
  * largest raw value, then exact decimal rounding only for cells within
  * 1.5e-9 of that threshold — a cell whose rounded rank reaches the
  * top p must lie within one 1e-9 bucket of the p-th raw value, so the
  * filter is exact, not approximate.
  *
  * Null semantics mirror [[VecArgmaxCell]]: NULL vector or NULL element
  * → NULL; vector length differing from a centroid's → NULL; the matrix
  * must be a foldable non-empty literal (plan-time failure otherwise).
  */
case class VecTopCells(left: Expression, right: Expression, p: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_top_cells"

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ModelConst.isConst(right)
      case _ => false
    }
    if (p < 1)
      TypeCheckResult.TypeCheckFailure(s"vec_top_cells: need p >= 1, got $p")
    else if (vecOk && matOk) {
      // memoized plan-time matrix validation — see VecArgmaxCell
      try { cents; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "vec_top_cells expects (array<float|double>, foldable-or-model_const " +
        s"array<array<double>>, int literal), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}${if (right.foldable) "" else ", non-foldable"})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecTopCells =
    copy(left = newLeft, right = newRight)

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // parse + validation shared with vec_argmax_cell — one place owns the
  // plan-time matrix contract (incl. the null-ELEMENT check; see there)
  @transient private lazy val cents: Array[Array[Double]] =
    VecArgmaxCell.parseCents(right.eval(), prettyName)

  @transient private lazy val cnorms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override def nullSafeEval(v: Any, m: Any): Any =
    VecTopCells.topCells(v.asInstanceOf[ArrayData], isFloat, cents, cnorms, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cnormsRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
    val lf = isFloat
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.VecTopCells.topCells($a, $lf, $centsRef, $cnormsRef, $p);
         |if ($res == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $res; }
       """.stripMargin
    })
  }
}

object VecTopCells {

  /** Shared by eval and codegen. Returns null on the documented NULL
    * cases, else an int ArrayData of min(p, k) cell indices in contract
    * order (round9 cosine DESC, NaN greatest, ties by index ASC).
    */
  def topCells(
      x: ArrayData, leftIsFloat: Boolean,
      cents: Array[Array[Double]], cnorms: Array[Double], p: Int): ArrayData = {
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
    val k = cents.length
    val cos = new Array[Double](k)
    var nanCount = 0
    var j = 0
    while (j < k) {
      val c = cents(j)
      if (c.length != n) return null
      var dot = 0.0
      i = 0
      while (i < n) { dot += v(i) * c(i); i += 1 }
      val cj = dot / (nv * cnorms(j))
      cos(j) = cj
      if (cj != cj) nanCount += 1
      j += 1
    }
    val take = math.min(p, k)
    val out = new Array[Int](take)
    var filled = 0
    // NaN ranks greatest; among NaNs, index ascending (matches the
    // argmax's first-NaN-wins)
    j = 0
    while (j < k && filled < take) {
      if (cos(j) != cos(j)) { out(filled) = j; filled += 1 }
      j += 1
    }
    val remaining = take - filled
    if (remaining > 0) {
      // raw threshold: the `remaining`-th largest non-NaN cosine
      val reals = new Array[Double](k - nanCount)
      var r = 0
      j = 0
      while (j < k) {
        val cj = cos(j); if (cj == cj) { reals(r) = cj; r += 1 }; j += 1
      }
      java.util.Arrays.sort(reals)
      val t = reals(reals.length - remaining)
      // exact-round only the cells within one 1e-9 bucket of the
      // threshold (plus ulp margin), then contract-order them
      val cand = Array.newBuilder[(Long, Int)]
      j = 0
      while (j < k) {
        val cj = cos(j)
        if (cj == cj && cj >= t - 1.5e-9)
          cand += ((VecArgmaxCell.round9(cj), j))
        j += 1
      }
      val ordered = cand.result().sortBy { case (r9, idx) => (-r9, idx) }
      var c = 0
      while (c < remaining) {
        out(filled) = ordered(c)._2; filled += 1; c += 1
      }
    }
    new GenericArrayData(out)
  }
}
