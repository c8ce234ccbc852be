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

/** 64-bit SimHash over a token array — the near-dup pair variant's hash
  * (`simhash64(tokens)` → Long). Bit j (value `1 << j`) is set when the
  * summed ±1 vote over bit (j mod 4) of hex-digit j/4 of md5(token) is
  * positive — bit-identical to the explode → 64-column vote-SUM groupBy
  * composition (the shape the DuckDB oracles replicate; equivalence
  * spec-checked in SimHash16Spec).
  *
  * The aggregate composition was the right DISTRIBUTED shape when votes
  * had to survive a shuffle, but simhash votes are entirely per-document:
  * computing them per row deletes the explode (|tokens|× row blowup) and
  * the 64-column vote shuffle from every simhash pair query — the hash
  * step becomes a pure map inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString}")
    }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hash($c);")
  }
}

object SimHash64 {

  /** One pass: md5 per non-null token; vote j is ±1 on bit (j mod 4) of
    * the VALUE of hex digit j/4 (digit at 0-based index k = high nibble
    * of byte k/2 when k is even, low nibble otherwise); output bit j set
    * when the vote sum is positive.
    */
  def hash(arr: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        var j = 0
        while (j < 64) {
          val k = j >> 2
          val nibble =
            if ((k & 1) == 0) (d(k >> 1) >> 4) & 0xf else d(k >> 1) & 0xf
          votes(j) += (if (((nibble >> (j & 3)) & 1) == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) h |= 1L << j
      j += 1
    }
    h
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
