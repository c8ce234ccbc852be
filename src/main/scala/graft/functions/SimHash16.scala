package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-bit SimHash over a token array as a native Catalyst expression.
  *
  * `simhash16(tokens)` → Long: for hex-digit position j ∈ [0,16) of
  * md5(token), vote +1 if the digit ≥ '8' (top bit of the nibble set)
  * else −1; output bit j (value `1 << (15−j)`) is set when the summed
  * vote is positive. Bit-identical to the built-in composition
  * (`aggregate(transform(ts, md5), …struct of 16 votes…)`) that the
  * DuckDB oracles replicate — equivalence spec-checked in SimHash16Spec.
  *
  * Why native (same reasoning as [[MinHashSig]]): higher-order functions
  * are interpreted — the builtin merge allocates a 16-field struct row
  * per TOKEN and boxes every vote, and `Md5` instantiates a digest per
  * evaluation. One pass, one MessageDigest, one int[16], nibbles read
  * straight from the digest bytes (hex char ≥ '8' ⟺ nibble ≥ 8 — the
  * hex rendering is never built). Kept inside whole-stage codegen via
  * `doGenCode`; registered through `GraftExtensions`.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 expects array<string>, got ${other.simpleString}")
    }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHash16.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash16.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash($c);")
  }
}

object SimHash16 {

  /** One pass: md5 per non-null token, ±1 vote per nibble position,
    * assemble bits from positive votes. Nibble j of the digest = high
    * nibble of byte j/2 when j is even, low nibble otherwise — matching
    * `substring(hex, j+1, 1) >= '8'` without rendering the hex string.
    */
  def hash(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        var j = 0
        while (j < 16) {
          val nibble =
            if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
          votes(j) += (if (nibble >= 8) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) h |= 1L << (15 - j)
      j += 1
    }
    h
  }
}
