package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenization (the public GPT-2 scheme: Radford et al.
  * 2019, "Language Models are Unsupervised Multitask Learners", §2.2;
  * merges-table format of the released `merges.txt`):
  * `bpe_encode(text, merges)` → `array<string>` of subword tokens.
  *
  * Pipeline, faithful to the published reference implementation:
  *  1. pre-tokenize with the GPT-2 regex
  *     (`'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`)
  *     — contractions split, a leading space rides with the word;
  *  2. map each pre-token's UTF-8 BYTES through the standard
  *     bytes→unicode table (printable bases keep their codepoint,
  *     the rest shift to 256+i — so every byte is a visible character
  *     and a space becomes `Ġ`, the marker real merges files use);
  *  3. greedy merge loop per pre-token: repeatedly fuse the adjacent
  *     pair with the LOWEST merge rank until no pair is in the table.
  *
  * `merges` is a foldable `array<string>` of `"left right"` lines in
  * file order (rank = position) — the same model-artifact-as-literal
  * pattern as `vec_argmax_cell`'s centroid matrix: parsed once per
  * plan, shipped as a reference object, never per row. Token COUNTS
  * from this expression (`Text.bpeTokenCount`) are what the budget
  * operators (mixture sampling, sequence packing, chunking) should be
  * denominated in when a real tokenizer's budget is the contract —
  * whitespace counts overstate a subword budget by the fertility
  * factor. Token→id lookup (vocab.json) is a separate dimension join
  * and deliberately out of scope here.
  *
  * Null text → NULL; empty text → empty array. Correctness is pinned
  * against an INDEPENDENT implementation: `tools/bpe_reference.py`
  * (pure-Python, the published algorithm) generates golden vectors the
  * spec asserts byte-for-byte.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val textOk = left.dataType == StringType
    val mergesOk = right.dataType match {
      case ArrayType(StringType, _) => right.foldable
      case _ => false
    }
    if (textOk && mergesOk) {
      // force the memoized table at plan time: a NULL merges literal
      // (a merges file that failed to load) must fail HERE, not emit
      // NULL for every row and silently mis-denominate every
      // token-budget operator downstream — the same
      // model-artifact-fails-at-plan-time contract as vec_argmax_cell.
      // An EMPTY (non-null) merges array stays legal: tokenizing with
      // zero merges is the pure byte alphabet.
      try { table; TypeCheckResult.TypeCheckSuccess }
      catch { case e: IllegalArgumentException =>
        TypeCheckResult.TypeCheckFailure(e.getMessage)
      }
    } else TypeCheckResult.TypeCheckFailure(
      "bpe_encode expects (string, foldable array<string> of 'left right' " +
        s"merge lines), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString}${if (right.foldable) "" else ", non-foldable"})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(left = newLeft, right = newRight)

  @transient private lazy val table: BpeEncode.Table = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr != null,
      "bpe_encode: merges table literal is NULL — a merges file that " +
        "failed to load must not silently tokenize everything to NULL")
    val lines = Array.tabulate(arr.numElements()) { i =>
      val l = arr.getUTF8String(i)
      require(l != null, s"bpe_encode: null merges line $i")
      l.toString
    }
    // malformed merge lines fail HERE, in the same plan-time validation
    // path as the NULL-literal check: a truncated or corrupted
    // merges.txt (a line that is not 'left right') must not silently
    // drop ranks and quietly coarsen every downstream token budget.
    // The comment exemption is ONLY the leading '#version' header line:
    // published GPT-2-family merges files contain genuine merges whose
    // LEFT token is '#' ('# #' producing '##'), so a blanket '#' comment
    // rule would silently drop exactly the ranks this guard exists to
    // protect — HuggingFace's loader skips only the first-line
    // '#version' header. Blank lines stay legal (not rank-bearing).
    lines.zipWithIndex.foreach { case (l, i) =>
      val t = l.trim
      if (t.nonEmpty && !BpeEncode.isVersionHeader(t, i)) {
        val sp = t.indexOf(' ')
        require(sp > 0 && sp < t.length - 1 && t.indexOf(' ', sp + 1) < 0,
          s"bpe_encode: malformed merges line $i: '$l' — expected " +
            "'left right' (exactly one separating space; tokens encode " +
            "spaces as the bytes-to-unicode alphabet, never raw)")
      }
    }
    BpeEncode.Table(lines)
  }

  override def nullSafeEval(text: Any, m: Any): Any =
    BpeEncode.encode(text.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncode.Table].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.BpeEncode.encode($t, $tableRef);
         |${ev.value} = $res;
       """.stripMargin
    })
  }
}

object BpeEncode {

  /** True only for the published format's first-line `#version` header —
    * the ONE line the HuggingFace loader skips. A '#' anywhere else is a
    * genuine token (`'# #'` is a real GPT-2 merge producing `'##'`), so
    * the parse and the validator share this single definition of
    * "comment" (skew between them would re-open the silent-rank-drop
    * hole the validator closes).
    */
  private[functions] def isVersionHeader(trimmed: String, idx: Int): Boolean =
    idx == 0 && trimmed.startsWith("#version")

  /** Parsed merges: rank by `"left right"` pair string. Serializable —
    * ships to executors inside the expression / as a codegen reference
    * object. Only a first-line `#version` header and blank lines are
    * skipped, matching how the published file is consumed (see
    * [[isVersionHeader]] — '#' is a legal merge token).
    */
  final case class Table(lines: Array[String]) extends Serializable {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer]()
      var rank = 0
      var i = 0
      while (i < lines.length) {
        val t = lines(i).trim
        if (t.nonEmpty && !isVersionHeader(t, i) && t.indexOf(' ') > 0) {
          if (!m.containsKey(t)) m.put(t, Integer.valueOf(rank))
          rank += 1
        }
        i += 1
      }
      m
    }
  }

  /** The GPT-2 pre-tokenizer. `\p{L}`/`\p{N}` are Unicode classes in
    * Java regex exactly as in the published Python pattern;
    * UNICODE_CHARACTER_CLASS makes `\s` Unicode-aware too (Python's
    * `regex` module is Unicode-native) — without it NBSP/thin-space/
    * ideographic space, ubiquitous in scraped web text, fall into the
    * punctuation branch and form merge scopes the reference never does.
    */
  private val preTokenizer = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The standard bytes→unicode table: bytes that are printable latin-1
    * (minus space-ish controls) map to themselves; the rest take
    * 256, 257, ... in byte order. Identical to the published
    * `bytes_to_unicode()`.
    */
  private val byteToChar: Array[Char] = {
    // '!'..'~', '¡'..'¬', '®'..'ÿ' — integer literals so the table does
    // not depend on this source file's own encoding
    val direct = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val out = new Array[Char](256)
    var shifted = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + shifted).toChar; shifted += 1 }
      b += 1
    }
    out
  }

  /** Map one pre-token's UTF-8 bytes through the bytes→unicode
    * alphabet — the symbol string the merge loop (and the trainer)
    * operates on.
    */
  private def mapBytes(tok: String): String = {
    val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Stages 1+2 only (pre-tokenizer regex + byte alphabet), no merge
    * loop — the [[BpePretokenize]] expression body, and the exact code
    * path `encode` itself pre-tokenizes with.
    */
  def preTokenize(text: UTF8String): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val m = preTokenizer.matcher(s)
    while (m.find()) out += UTF8String.fromString(mapBytes(m.group()))
    new GenericArrayData(out.toArray)
  }

  /** Shared by eval and codegen. */
  def encode(text: UTF8String, table: Table): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val ranks = table.ranks
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val m = preTokenizer.matcher(s)
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // byte-level alphabet: one mapped char per byte
      var parts = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        parts(i) = String.valueOf(byteToChar(bytes(i) & 0xff))
        i += 1
      }
      // greedy rank-ordered merge loop (the published algorithm): fuse
      // ALL adjacent occurrences of the lowest-ranked pair, repeat
      // until no adjacent pair is in the table
      var done = parts.length <= 1
      while (!done) {
        var best = -1
        var bestRank = Int.MaxValue
        i = 0
        while (i < parts.length - 1) {
          val r = ranks.get(parts(i) + " " + parts(i + 1))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); best = i
          }
          i += 1
        }
        if (best < 0) done = true
        else {
          val a = parts(best); val b = parts(best + 1)
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          i = 0
          while (i < parts.length) {
            if (i < parts.length - 1 && parts(i) == a && parts(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += parts(i); i += 1 }
          }
          parts = merged.toArray
          done = parts.length <= 1
        }
      }
      i = 0
      while (i < parts.length) {
        out += UTF8String.fromString(parts(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
