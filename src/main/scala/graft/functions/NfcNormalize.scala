package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization as a native
  * Catalyst expression — `nfc_normalize(text)`, the same name and
  * semantics as DuckDB's built-in, which is what makes the cleanup
  * operator oracle-checkable.
  *
  * Training-corpus motivation: crawled text mixes composed ("é") and
  * decomposed ("e" + U+0301) forms of the same grapheme; every
  * downstream content-keyed operator (exact-dedup digests, shingle
  * minhash, winnowing fingerprints, tokenizer merges) treats the two
  * encodings as DIFFERENT bytes, silently splitting what a reader sees
  * as identical text. Normalizing to NFC before any content hash is the
  * standard first stage (every major pipeline's `clean` step does it);
  * [[graft.ops.Text.cleanText]] composes it with control-char stripping
  * and whitespace collapsing.
  *
  * Spark has no built-in for this (2.13/4.x), and a Scala UDF would box
  * every row out of Tungsten — so it is a `UnaryExpression` with
  * `doGenCode` (SURVEY §2.9 decision table), staying inside whole-stage
  * codegen. Hot-path shape: `Normalizer.isNormalized` is a single scan
  * that short-circuits on the first character with a non-zero
  * quick-check property — for the overwhelmingly-ASCII bulk of a crawl
  * the expression never materializes a second string.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.normalize($c);")
  }
}

object NfcNormalize {
  /** Already-NFC input returns the SAME UTF8String. Two tiers of fast
    * path: pure-ASCII (the web-crawl bulk) is decided by
    * `isFullAscii()` on the raw bytes — no String materialization at
    * all; non-ASCII input pays one `toString` for the
    * `Normalizer.isNormalized` quick-check (a scan that short-circuits
    * at the first character with a non-zero NFC quick-check property)
    * and re-encodes only when composition actually changes something.
    */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
