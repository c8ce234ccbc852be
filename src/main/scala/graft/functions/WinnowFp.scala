package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint picks (Schleimer, Wilkerson & Aiken 2003) as a
  * native Catalyst expression.
  *
  * `winnow_fp(text, k, w)` → Array[Long]: over the Karp–Rabin hashes of
  * every k-byte window ([[RollingHash.hashes]]), slide a window of `w`
  * consecutive hashes, keep the minimum of each (ties to the RIGHTMOST
  * occurrence), dedup the picks, and pack each pick into one BIGINT,
  * `pos · 2³¹ + hash` (KR hash < 1e9+7 < 2³¹), `pos` the 0-based byte
  * offset of the chosen k-gram.
  *
  * Exactly the value the composed built-in formulation produced
  * (`transform(sequence(...), i => slice/array_min/reverse/array_position)`
  * then `array_distinct`) — but one O(n) pass with a monotonic-deque
  * sliding minimum instead of O(n·w) with four array allocations per
  * window position. Dedup note: with rightmost-tie minima the picked
  * position is NON-DECREASING as the window slides (the pick only changes
  * when it falls out of the window, forcing a pick at or right of the new
  * window start, or when an incoming ≤-hash takes over at the window's
  * right edge), so duplicates are always consecutive and a last-pick skip
  * reproduces `array_distinct` exactly, in the same ascending-pos order.
  *
  * Same §2.9 decision-table rationale as [[RollingHash]]: a stateful
  * per-window recurrence has no constant-factor-efficient rendering in
  * `org.apache.spark.sql.functions`; a full `doGenCode` keeps it inside
  * whole-stage codegen. Engine-portable: the packed values are exact
  * BIGINTs the DuckDB twin reproduces with the same integer arithmetic.
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && k > 0 && w > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fp expects (string, positive k, positive w), got " +
          s"(${child.dataType.simpleString}, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    ArrayData.toArrayData(WinnowFp.fingerprints(bytes, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WinnowFp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new ${classOf[GenericArrayData].getName}(
         |  $cls.fingerprints($c.getBytes(), $k, $w));""".stripMargin)
  }
}

object WinnowFp {
  /** One-pass winnow over raw UTF-8 bytes: KR k-gram hashes, then a
    * monotonic deque (strictly increasing hash values, each entry the
    * rightmost occurrence of its value — the `>=` pop implements the
    * rightmost tie-break) whose front is each window's pick. Docs with
    * fewer than k + w − 1 bytes have no full hash window → empty.
    */
  def fingerprints(bytes: Array[Byte], k: Int, w: Int): Array[Long] = {
    val h = RollingHash.hashes(bytes, k)
    val nh = h.length
    if (nh < w) return Array.emptyLongArray
    // deque of hash-array indices; [head, tail) live. Sized nh: tail
    // only ever advances one slot per element, so nh slots suffice
    // without ring arithmetic.
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0
    val out = new Array[Long](nh - w + 1)
    var m = 0
    var last = -1
    var i = 0
    while (i < nh) {
      while (tail > head && h(dq(tail - 1)) >= h(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val p = dq(head)
        if (p != last) {
          out(m) = p.toLong * 2147483648L + h(p)
          m += 1
          last = p
        }
      }
      i += 1
    }
    if (m == out.length) out else java.util.Arrays.copyOf(out, m)
  }
}
