package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DataType

/** A plan-COMPACT constant: carries a model artifact (centroid matrix, PQ
  * codebook, id decode array — kilo-element nested arrays) exactly like a
  * `Literal`, but renders, hashes and canonicalizes in O(1).
  *
  * Why `Literal` is the wrong carrier for model artifacts, measured
  * (ProfileStacks over q_ivfpq_res_topk, round 18): `Literal.toString`
  * renders EVERY array element, and Spark stringifies the executed plan
  * once per action (`SparkListenerSQLExecutionStart.physicalPlanDescription`)
  * plus once per AQE re-plan (`SparkListenerSQLAdaptiveExecutionUpdate`) —
  * with √n-law centroid matrices (~3k doubles at sf0.1) and PQ codebooks
  * in the plan, 16% of the PQ family's wall clock was the DRIVER inside
  * `GenericArrayData.toString`, another ~5% in the surrounding
  * `truncatedString` (`spark.sql.debug.maxToStringFields` truncates the
  * NUMBER of rendered fields, never the size of one literal's rendering).
  * The cost scales with model size × action count × AQE stage count — a
  * real cluster pays it too, on every event-log/UI plan description.
  *
  * Deliberately NOT foldable: `ConstantFolding` rewrites any foldable
  * non-Literal back into a `Literal(eval())`, which would undo the
  * compact rendering before the executed plan is ever stringified. The
  * native model-consuming expressions ([[VecArgminL2]], [[VecArgmaxCell]],
  * [[VecSubAt]], [[VecTopCells]]) accept it via [[ModelConst.isConst]]
  * (they only need `eval()` at plan/setup time, which works identically).
  * Value semantics are exactly the wrapped Literal's: deterministic,
  * non-null, evaluated as the same catalyst value on every row; codegen
  * references the value object once per plan, the `Literal` non-primitive
  * shape.
  *
  * Construction: `call_function("model_const", typedlit(...))` — the
  * registry builder pattern-matches the transient Literal argument and
  * rewraps its already-converted catalyst value (no reconversion). The
  * Literal exists only in the unresolved plan, which nothing renders.
  */
case class ModelConst(
    value: Any, dataType: DataType, desc: String, valueHash: Long)
    extends LeafExpression {

  require(value != null, "model_const: value must be non-null")

  override def nullable: Boolean = false
  override def foldable: Boolean = false // survive ConstantFolding
  override def prettyName: String = "model_const"

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the Literal non-primitive shape: one reference object per plan
    val javaType = CodeGenerator.javaType(dataType)
    val ref = ctx.addReferenceObj("modelConst", value, javaType)
    ev.copy(isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .global(ref, dataType))
  }

  // O(1) plan rendering — the reason this class exists
  override def toString: String = s"model_const($desc#${valueHash.toHexString})"
  override def sql: String = toString
  override def simpleString(maxFields: Int): String = toString

  // O(1) hashing for canonicalization/semantic-equality traversals; full
  // equality still compares values (correct, rare — only cross-plan
  // subtree matching like ReuseExchange gets there, and only on hash hits)
  override def hashCode(): Int =
    31 * dataType.hashCode() + java.lang.Long.hashCode(valueHash)
  override def equals(other: Any): Boolean = other match {
    case m: ModelConst =>
      (m eq this) ||
        (m.valueHash == valueHash && m.dataType == dataType &&
          m.value == value)
    case _ => false
  }
}

object ModelConst {

  /** Wrap an already-converted catalyst constant. `desc` is the compact
    * shape tag rendered into plans.
    */
  def fromLiteral(lit: Literal): ModelConst = {
    require(lit.value != null,
      "model_const: argument must be a non-null literal")
    ModelConst(lit.value, lit.dataType, describe(lit.value, lit.dataType),
      contentHash(lit.value))
  }

  /** Constant-for-model-artifact check the native vec_* expressions use
    * in place of bare `foldable`: a ModelConst IS a plan-time constant
    * (eval() at setup time works identically), it just refuses constant
    * folding to keep plans compact.
    */
  def isConst(e: Expression): Boolean =
    e.foldable || e.isInstanceOf[ModelConst]

  private def describe(value: Any, dt: DataType): String = value match {
    case a: ArrayData =>
      val n = a.numElements()
      val inner = if (n > 0) a.get(0, dt.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType) else null
      inner match {
        case ia: ArrayData => s"${dt.simpleString.take(32)}:${n}x${ia.numElements()}"
        case _ => s"${dt.simpleString.take(32)}:$n"
      }
    case other => dt.simpleString.take(32)
  }

  /** One O(n) pass at construction; plans hash/render in O(1) after. */
  private def contentHash(value: Any): Long = value match {
    case a: ArrayData => a.hashCode().toLong & 0xffffffffL
    case other => other.hashCode().toLong & 0xffffffffL
  }
}
