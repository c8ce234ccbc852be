package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[BpeTrain]] (both arms) byte-identical to the independent
  * Python trainer (tools/bpe_reference.py `train()` — run it to
  * regenerate the golden below), and the two arms equal to each other
  * on adversarial inputs the golden corpus doesn't cover.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // tools/bpe_reference.py TRAIN_CORPUS, verbatim
  private val corpus = Seq(
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and the hat",
    "low lower lowest low low",
    "new newer newest new",
    "café café crema",
    "unique singleton tokens appear once")

  // `python3 tools/bpe_reference.py` trainer golden:
  // num_merges=24, min_pair_freq=2 -> 22 merges (early stop: no pair
  // with frequency >= 2 remains, the min_pair_freq rule firing)
  private val G = "Ġ" // the space marker the byte alphabet emits
  private val golden = Seq(
    "a t", "h e", "l o", "lo w", "t he", s"$G c", "e w", "n ew",
    s"$G low", "o n", s"$G new", s"$G the", s"${G}c at", "a f",
    "af Ã", "afÃ ©", "e r", "e s", "es t", s"$G a",
    s"$G on", s"$G s")

  private def corpusDf = corpus.toDF("text")

  test("driver arm (train over a DataFrame) reproduces the Python " +
    "golden byte for byte, early-stopping below min_pair_freq") {
    val learned = BpeTrain.train(corpusDf, "text", numMerges = 24)
    assert(learned === golden)
  }

  test("distributed arm (merge rounds as Spark jobs) reproduces the " +
    "same golden — the two arms cannot drift") {
    val learned = BpeTrain.trainDistributed(corpusDf, "text",
      numMerges = 24, checkpointEvery = 4)
    assert(learned === golden)
  }

  test("encoding with the LEARNED merges flows through bpe_encode and " +
    "matches the Python re-encode golden") {
    val got = corpusDf.limit(2)
      .select(Text.bpeTokens(col("text"), golden).as("toks"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("the", s"${G}cat", s"${G}s", "at", s"${G}on",
      s"${G}the", G, "m", "at"))
    assert(got(1) === Seq("the", s"${G}cat", G, "at", "e", s"${G}the",
      G, "r", "at"))
  }

  test("numMerges truncates the learned table to a prefix (rank order " +
    "is stable under the budget)") {
    val short = BpeTrain.train(corpusDf, "text", numMerges = 5)
    assert(short === golden.take(5))
    assert(BpeTrain.train(corpusDf, "text", numMerges = 0) === Nil)
  }

  test("minPairFreq=1 keeps merging singleton pairs; raising it stops " +
    "earlier (monotone prefix)") {
    val strict = BpeTrain.trainFromWordCounts(
      Seq(("aaab", 1L), ("aaac", 1L)), numMerges = 10, minPairFreq = 2)
    // 'a a' appears 2x in each word -> freq 4; after 'a a' -> 'aa':
    // ['aa','a','b'] / ['aa','a','c'] -> 'aa a' freq 2 -> 'aaa';
    // then every remaining pair ('aaa b', 'aaa c') is freq 1 -> stop
    assert(strict === Seq("a a", "aa a"))
    val loose = BpeTrain.trainFromWordCounts(
      Seq(("aaab", 1L), ("aaac", 1L)), numMerges = 10, minPairFreq = 1)
    assert(loose.take(2) === strict && loose.length > 2)
  }

  test("tie-break is the lexicographically smallest pair string on " +
    "equal frequency, identically in both arms") {
    // 'x y' and 'p q' both appear exactly twice; 'p q' < 'x y'
    val wc = Seq(("xy", 2L), ("pq", 2L))
    assert(BpeTrain.trainFromWordCounts(wc, 1) === Seq("p q"))
    val df = Seq("xy", "xy", "pq", "pq").toDF("text")
    assert(BpeTrain.train(df, "text", 1) === Seq("p q"))
    assert(BpeTrain.trainDistributed(df, "text", 1) === Seq("p q"))
  }

  test("mergeFold (the distributed arm's Catalyst fold) equals the " +
    "in-process left-to-right applyMerge on adversarial overlaps") {
    val cases = Seq(
      (Array("a", "a", "a"), "a", "a"),          // overlapping run
      (Array("a", "b", "a", "b"), "a", "b"),     // back-to-back pairs
      (Array("ab", "ab", "c"), "ab", "c"),       // prior symbol == a
      (Array("x"), "x", "x"),                    // single symbol
      (Array("a", "b", "b"), "a", "b"),          // b repeats after merge
      (Array("b", "a", "b"), "a", "b"))          // leading non-match
    cases.foreach { case (syms, a, b) =>
      val expected = BpeTrain.applyMerge(syms, a, b, a + b).toSeq
      val got = Seq(Tuple1(syms.toSeq)).toDF("syms")
        .select(BpeTrain.mergeFold(col("syms"), a, b).as("m"))
        .as[Seq[String]].head()
      assert(got === expected, s"(${syms.mkString(",")}) merge ($a,$b)")
    }
  }

  test("wordCounts: one corpus pass, weighted by occurrence; " +
    "bpe_pretokenize agrees with bpe_encode's own pre-tokenization") {
    val wc = BpeTrain.wordCounts(Seq("the cat the").toDF("text"), "text")
      .as[(String, Long)].collect().toMap
    assert(wc === Map("the" -> 1L, s"${G}cat" -> 1L, s"${G}the" -> 1L))
    // zero-merges bpe_encode = per-byte split of the pretokens
    val pre = Seq("café !").toDF("text")
      .select(explode(call_function("bpe_pretokenize", col("text"))).as("w"))
      .as[String].collect().toSeq
    val enc = Seq("café !").toDF("text")
      .select(Text.bpeTokens(col("text"), Nil).as("t"))
      .as[Seq[String]].head()
    assert(pre.map(_.length).sum === enc.length)
    assert(pre.mkString === enc.mkString)
  }
}
