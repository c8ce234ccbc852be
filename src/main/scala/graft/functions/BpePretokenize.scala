package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_pretokenize(text)` → `array<string>`: the first two stages of
  * the byte-level BPE pipeline ([[BpeEncode]]) WITHOUT the merge loop —
  * GPT-2 pre-tokenizer regex, then each pre-token's UTF-8 bytes mapped
  * through the standard bytes→unicode alphabet (space → `Ġ` etc).
  *
  * This is the corpus-scan primitive BPE merge TRAINING needs: the
  * trainer's first (and only corpus-sized) pass is
  * `explode(bpe_pretokenize(text))` → word-count aggregation; every
  * merge-learning round after that operates on the bounded word-count
  * table ([[graft.ops.BpeTrain]]). Encoding with the LEARNED table then
  * flows through `bpe_encode`, whose own pre-tokenization is this exact
  * code path — training and encoding cannot disagree on word
  * boundaries or the byte alphabet.
  *
  * Null text → NULL; empty text → empty array. Map-side, codegen.
  */
case class BpePretokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_pretokenize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_pretokenize expects a string, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): BpePretokenize =
    copy(child = newChild)

  override def nullSafeEval(text: Any): Any =
    BpeEncode.preTokenize(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.BpeEncode.preTokenize($t);
         |${ev.value} = $res;
       """.stripMargin
    })
}
