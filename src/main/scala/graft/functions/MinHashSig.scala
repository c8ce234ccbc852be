package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a native Catalyst expression.
  *
  * `minhash_sig(shingles, numHashes)` → Array[String]: for seed
  * `i ∈ [0, numHashes)`, the lexicographic minimum over the shingle set of
  * `md5(i || ':' || shingle)` — bit-identical to the built-in composition
  * `array(array_min(transform(sh, s => md5(concat('i:', s)))) …)` (the
  * definition every DuckDB oracle twin reproduces), so swapping it in
  * changes no query result.
  *
  * Why native (SURVEY §2.9 decision table): the built-in form materializes
  * `numHashes` intermediate md5-hex ARRAYS per row and instantiates a
  * fresh MessageDigest per md5 evaluation (commons-codec under Spark's
  * `Md5`), i.e. `numHashes × |shingles|` allocations of digest + hex
  * string + array slots. This expression makes ONE pass over the shingle
  * array with ONE MessageDigest, tracks the running minimum as the raw
  * 16-byte digest (hex encoding is order-preserving, so digest-byte
  * comparison == hex-string comparison), and hex-encodes only the
  * `numHashes` winners. Signature computation dominates the minhash dedup
  * family's map side at corpus scale. Implemented with `doGenCode` so it
  * stays inside whole-stage codegen; registered via the public
  * `SparkSessionExtensions.injectFunction` hook (`GraftExtensions`).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if numHashes > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects (array<string>, positive numHashes), got " +
            s"(${other.simpleString}, $numHashes)")
    }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.signature($c, $numHashes);")
  }
}

object MinHashSig {

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned byte-wise comparison — equals the lexicographic order of the
    * lowercase-hex rendering (each byte maps to two hex chars high-nibble
    * first, and the nibble→char map is monotone in ASCII).
    */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** One pass over the shingles, all seeds tracked simultaneously. Null
    * elements are skipped (matching `array_min` over a transform that maps
    * null→null); an empty or all-null input yields all-null mins exactly
    * like `array_min` on an empty array.
    */
  def signature(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = new Array[Array[Byte]](numHashes)
    var s = 0
    while (s < numHashes) {
      prefixes(s) = (s.toString + ":").getBytes("UTF-8")
      s += 1
    }
    val mins = new Array[Array[Byte]](numHashes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var seed = 0
        while (seed < numHashes) {
          md.reset()
          md.update(prefixes(seed))
          md.update(bytes)
          val d = md.digest()
          if (mins(seed) == null || less(d, mins(seed))) mins(seed) = d
          seed += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var j = 0
    while (j < numHashes) {
      out(j) = if (mins(j) == null) null else hex(mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
