package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling window hash as a native Catalyst expression.
  *
  * `rolling_hash(text, window)` → Array[Long]: hash of every `window`-byte
  * window of the UTF-8 text, hash(w) = Σ byte_i · base^(window-1-i) mod m,
  * rolled incrementally — O(n) per document. The equivalent built-in
  * formulation (`transform(sequence(...), i => aggregate(substring(...)))`)
  * recomputes every window from scratch, O(n·window), and allocates a
  * substring per window.
  *
  * This is the one place graft drops below the DataFrame API (SURVEY §2.9
  * decision table): a per-window incremental recurrence has no
  * constant-factor-efficient rendering in `org.apache.spark.sql.functions`.
  * Implemented as a full `UnaryExpression` with `doGenCode` so it stays
  * inside whole-stage codegen (no UDF boxing, no codegen fence), and
  * registered through the public `SparkSessionExtensions.injectFunction`
  * hook (`GraftExtensions`) — use `expr("rolling_hash(col, 8)")`.
  *
  * Engine-portable: base·mod < 2^63, so DuckDB replicates exact values
  * with BIGINT arithmetic.
  */
case class RollingHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && window > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects (string, positive window), got " +
          s"(${child.dataType.simpleString}, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    ArrayData.toArrayData(RollingHash.hashes(bytes, window))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.hashes($c.getBytes(), $window));""".stripMargin)
  }
}

object RollingHash {
  /** 31 and 1e9+7: classic Karp–Rabin parameters; base·mod < 2^63 keeps
    * every intermediate in signed 64-bit on any engine.
    */
  val Base = 31L
  val Mod = 1000000007L

  /** O(n) incremental window hashes over raw UTF-8 bytes (unsigned). */
  def hashes(bytes: Array[Byte], window: Int): Array[Long] = {
    val n = bytes.length
    if (n < window || window <= 0) return Array.emptyLongArray
    // base^(window-1) mod m, for removing the outgoing byte
    var pow = 1L
    var i = 1
    while (i < window) { pow = pow * Base % Mod; i += 1 }
    val out = new Array[Long](n - window + 1)
    var h = 0L
    i = 0
    while (i < window) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    out(0) = h
    i = window
    while (i < n) {
      h = (h - (bytes(i - window) & 0xff) * pow % Mod + Mod) % Mod
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      out(i - window + 1) = h
      i += 1
    }
    out
  }
}
