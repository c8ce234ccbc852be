package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles as a native Catalyst expression.
  *
  * `token_shingles(tokens, n)` → Array[String]: every window of `n`
  * consecutive tokens joined with a single space; an array shorter than
  * `n` collapses to ONE whole-array join (the short-doc convention every
  * shingle consumer shares — a 2-token doc still minhashes).
  *
  * Exactly the value the composed formulation produced
  * (`zip_with`-fold over n shifted `slice`s, short arrays via
  * `concat_ws`), with the same null semantics: NULL array → NULL; a NULL
  * token inside a window → that window NULL (concat propagation); NULL
  * tokens in the short-array branch are skipped (concat_ws semantics).
  * Why native (§2.9 decision table): Spark's higher-order functions
  * (`zip_with`, `transform`) are CodegenFallback — each element pays an
  * interpreted lambda round-trip — and the fold materializes n−1
  * intermediate full-length arrays whose strings copy ~k·|token| bytes at
  * fold step k (Σk ≈ n²/2 per window versus the n the output needs).
  * This expression builds each window string ONCE with a single
  * `UTF8String.concatWs` byte pass and stays inside whole-stage codegen.
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_shingles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_shingles expects (array<string>, positive n), got " +
            s"(${other.simpleString}, $n)")
    }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    TokenShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.shingle($c, $n);")
  }
}

object TokenShingles {
  private val Space = UTF8String.fromString(" ")

  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    val toks = new Array[UTF8String](sz)
    var i = 0
    while (i < sz) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    if (sz < n) {
      // concat_ws: null tokens skipped, empty array → ""
      new GenericArrayData(
        Array[Any](UTF8String.concatWs(Space, toks: _*)))
    } else {
      val m = sz - n + 1
      val out = new Array[Any](m)
      val win = new Array[UTF8String](n)
      i = 0
      while (i < m) {
        var j = 0
        var hasNull = false
        while (j < n) {
          val t = toks(i + j)
          if (t == null) hasNull = true
          win(j) = t
          j += 1
        }
        // concat (not concat_ws) semantics inside a full window: any
        // null token nulls the window — matches the zip_with fold
        out(i) = if (hasNull) null else UTF8String.concatWs(Space, win: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
