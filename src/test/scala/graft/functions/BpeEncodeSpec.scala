package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native byte-level BPE applier against GOLDEN vectors
  * computed by the independent Python reference implementation
  * (tools/bpe_reference.py — run it to regenerate; every expected
  * value below is pasted from its output). Ġ (U+0120) is the
  * byte-alphabet image of the space byte, as in the published GPT-2
  * merges format.
  */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val G = "Ġ" // Ġ
  private val merges = Seq(
    "#version: spec-fixture",
    "h e", "l l", "he ll", "hell o",
    s"$G w", s"${G}w o", s"${G}wo r", s"${G}wor ld",
    "l d", s"${G}wor l", "1 2", "12 3")

  private def run(texts: Seq[String], codegen: Boolean): Seq[Option[Seq[String]]] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      texts.zipWithIndex.toDF("t", "i").orderBy("i")
        .select(graft.ops.Text.bpeTokens(col("t"), merges).as("toks"))
        .collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getSeq[String](0).toSeq))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("golden vectors from the independent reference implementation, " +
    "both execution modes") {
    val cases = Seq(
      // multi-step merges incl. the space marker chain
      "hello world" -> Seq("hello", s"${G}world"),
      // double space: the pre-tokenizer emits a bare space token
      "hello  world" -> Seq("hello", G, s"${G}world"),
      // case sensitivity, punctuation split, digit merges
      "Hello, world! 123" ->
        Seq("H", "e", "ll", "o", ",", s"${G}world", "!", G, "123"),
      // merge stops when no adjacent pair is in the table
      "hell" -> Seq("hell"),
      // empty text -> empty array, not null
      "" -> Seq.empty[String],
      // multi-byte UTF-8 rides the byte alphabet (é = C3 A9, ü = C3 BC)
      "café ü" ->
        Seq("c", "a", "f", "Ã", "©", G, "Ã", "¼"),
      // Unicode whitespace (NBSP, thin space, ideographic space) takes
      // the \s branch exactly as in the Python `regex` reference — the
      // pre-tokenizer must compile with UNICODE_CHARACTER_CLASS or
      // these fall into the punctuation branch and form different
      // merge scopes (0xA0 -> ł = U+0142, 0x80 -> Ģ, 0x89 -> ī)
      "a !" -> Seq("a", "Â", "ł", "!"),
      "a b" -> Seq("a", "â", "Ģ", "ī", "b"),
      "　hello" -> Seq("ã", "Ģ", "Ģ", "hello"))
    Seq(true, false).foreach { cg =>
      assert(run(cases.map(_._1), cg) === cases.map(c => Some(c._2)),
        s"codegen=$cg")
    }
  }

  test("null text yields NULL; rank priority beats line order") {
    Seq(true, false).foreach { cg =>
      assert(run(Seq(null), cg) === Seq(None), s"codegen=$cg")
    }
    // 'l l' (rank 1) outranks 'e l' (rank 2) at the shared 'l': hello
    // must merge ll first, leaving 'e' unpaired
    val toks = Seq("hello").toDF("t")
      .select(graft.ops.Text.bpeTokens(col("t"),
        Seq("l l", "e l", "o o")).as("x"))
      .head.getSeq[String](0)
    assert(toks === Seq("h", "e", "ll", "o"))
  }

  test("bpeTokenCount denominates the packing budget: fertility > 1 vs " +
    "whitespace counts on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val counts = docs.select(
      sum(graft.ops.Text.tokenCount(col("text"))).as("ws"),
      sum(graft.ops.Text.bpeTokenCount(col("text"), merges)).as("bpe"))
      .head
    val (ws, bpe) = (counts.getLong(0), counts.getLong(1))
    // with a tiny merges table almost nothing fuses, so subword counts
    // strictly exceed whitespace counts — the fertility factor a
    // whitespace-denominated budget silently ignores
    assert(bpe > ws, s"expected subword fertility > 1, got ws=$ws bpe=$bpe")
    // and the counts drop into the q_pack_sequences window shape
    // unchanged (budget operators are Column-parametric)
    val packed = docs.select(col("doc_id"),
      graft.ops.Text.bpeTokenCount(col("text"), merges).as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(floor((col("_cum") - col("n_tokens")) / 2048).as("bin"))
    assert(packed.agg(max("bin")).head.getLong(0) >= 0)
  }

  test("NBSP never shares a merge scope with adjacent punctuation: " +
    "an ASCII-only \\s would pre-tokenize \"\\u00a0!\" as one token " +
    "and fuse it") {
    // golden from tools/bpe_reference.py with merges ["Â ł", "Âł !"]:
    // the reference keeps "!" a separate pre-token, so the second
    // merge is dead and the output is ["a", "Âł", "!"] — an ASCII \s
    // groups "\u00a0!" together and produces ["a", "Âł!"] instead
    Seq(true, false).foreach { cg =>
      val mode = if (cg) "CODEGEN_ONLY" else "NO_CODEGEN"
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val toks = Seq("a\u00a0!").toDF("t")
          .select(graft.ops.Text.bpeTokens(col("t"),
            Seq("Â ł", "Âł !")).as("x"))
          .head.getSeq[String](0)
        assert(toks === Seq("a", "Âł", "!"), s"codegen=$cg")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("non-foldable merges rejected at analysis") {
    val df = Seq(("x", Seq("a b"))).toDF("t", "m")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("bpe_encode", col("t"), col("m"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }

  test("NULL merges literal fails at analysis (a merges file that " +
    "failed to load must not silently tokenize everything to NULL); " +
    "an EMPTY merges table is legal and yields the pure byte alphabet") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("t")
        .select(call_function("bpe_encode", col("t"),
          expr("CAST(NULL AS ARRAY<STRING>)"))).collect()
    }
    assert(e.getMessage.contains("NULL"))
    val toks = Seq("hi").toDF("t")
      .select(graft.ops.Text.bpeTokens(col("t"), Seq.empty).as("x"))
      .head.getSeq[String](0)
    assert(toks === Seq("h", "i"))
  }

  test("malformed merges line fails at analysis like the NULL literal — " +
    "a truncated merges file must not silently drop ranks") {
    // no separating space (a torn line), leading space, two spaces:
    // all three are not 'left right' and must fail loudly
    Seq("ab", " ab", "a b c").foreach { bad =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Seq("x").toDF("t")
          .select(graft.ops.Text.bpeTokens(col("t"),
            Seq("h i", bad)).as("x")).collect()
      }
      assert(e.getMessage.contains("malformed"), s"line '$bad'")
    }
    // comments and blank lines stay legal (the published header format)
    val toks = Seq("hi").toDF("t")
      .select(graft.ops.Text.bpeTokens(col("t"),
        Seq("#version: 0.2", "", "h i")).as("x"))
      .head.getSeq[String](0)
    assert(toks === Seq("hi"))
  }
}
