package graft.functions

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.{AnalysisException, Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Pins the native `classifier_score` expression byte-identical to the
  * Catalyst-HOF fold it replaced (kept here as the twin), including the
  * NULL-text, empty-text, and all-OOV arms — the `ws_tokens` playbook's
  * equivalence contract applied to the classifier gate.
  */
class ClassifierScoreSpec extends SparkSpec {
  import spark.implicits._

  /** The RETIRED composed form, verbatim: Catalyst `aggregate` fold over
    * `element_at` on a literal map, mean, rational sigmoid, round 6.
    * The graded rows ran on this through round 15; the native expression
    * must reproduce it bit for bit.
    */
  private def composedScore(
      text: Column, weights: Map[String, Double], bias: Double): Column = {
    val wm = typedLit(weights)
    val ts = Text.tokens(lower(text))
    val sum = aggregate(ts, lit(0.0),
      (acc, t) => acc + coalesce(element_at(wm, t), lit(0.0)))
    val z = lit(bias) +
      when(size(ts) > 0, sum / size(ts).cast("double")).otherwise(lit(0.0))
    round(lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z))), 6)
  }

  private val w = Map("good" -> 1.5, "fine" -> 0.25, "bad" -> -2.0,
    "ünïcode" -> 0.125, "的" -> -0.5)

  private def both(df: DataFrame, bias: Double): (Seq[Double], Seq[Double]) = {
    val native = df.select(Text.classifierScore($"t", w, bias).as("s"))
      .as[Double].collect().toSeq
    val composed = df.select(composedScore($"t", w, bias).as("s"))
      .as[Double].collect().toSeq
    (native, composed)
  }

  test("native == retired HOF form on the fixture arms: mixed vocab, " +
    "all-OOV, empty, null, unicode") {
    val df = Seq(
      "good fine bad", "totally unseen words", "", "  ",
      null.asInstanceOf[String], "ünïcode 的 good", "bad bad bad")
      .toDF("t")
    val (n0, c0) = both(df, 0.0)
    assert(n0 === c0)
    val (n1, c1) = both(df, -0.75)
    assert(n1 === c1)
    // NULL text scores squash(bias), not NULL — the graded contract
    val nullScore = df.where($"t".isNull)
      .select(Text.classifierScore($"t", w, -0.75)).as[Double].head()
    val zb = -0.75
    val expect = BigDecimal(0.5 * (1.0 + zb / (1.0 + math.abs(zb))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nullScore === expect)
  }

  test("property: native == retired HOF form for arbitrary texts, " +
    "weights and bias") {
    val word = Gen.oneOf("good", "fine", "bad", "oov1", "zz", "ünïcode",
      "的", "x")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val wGen = Gen.mapOf(Gen.zip(word,
      Gen.chooseNum(-4.0, 4.0))).suchThat(_.nonEmpty)
    val biasGen = Gen.chooseNum(-2.0, 2.0)
    val prop = Prop.forAll(textGen, wGen, biasGen) { (t, wm, b) =>
      val df = Seq(Tuple1(t)).toDF("t")
      df.select(Text.classifierScore($"t", wm, b)).head().getDouble(0) ==
        df.select(composedScore($"t", wm, b)).head().getDouble(0)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("plan-time model-artifact contract: NULL weights literal fails " +
    "analysis, never scores rows") {
    val df = Seq(Tuple1("good")).toDF("t")
    val nullMap = lit(null).cast("map<string,double>")
    val e = intercept[AnalysisException] {
      df.select(call_function("classifier_score",
        Text.tokens(lower($"t")), nullMap, lit(0.0))).collect()
    }
    assert(e.getMessage.contains("classifier_score") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }

  test("non-foldable weights are rejected (the weights are a model " +
    "artifact, not a per-row column)") {
    val df = Seq(Tuple1("good")).toDF("t")
    val perRow = map(lit("good"), lit(1.0)) // foldable, fine
    df.select(call_function("classifier_score",
      Text.tokens(lower($"t")), perRow, lit(0.0))).collect()
    val notFoldable = map($"t", lit(1.0))
    val e = intercept[AnalysisException] {
      df.select(call_function("classifier_score",
        Text.tokens(lower($"t")), notFoldable, lit(0.0))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getMessage.contains("classifier_score"))
  }

  test("NULL array ELEMENTS weigh 0.0 and still count toward the mean — " +
    "the composed form's coalesce(element_at, ...) arm; the function is " +
    "SQL-registered, so user-built arrays with NULL slots must not read " +
    "undefined bytes") {
    val wm = typedLit(Map("good" -> 1.5, "bad" -> -2.0))
    // the null slot depends on the row so the array is NOT foldable —
    // constant folding must not hide the codegen path from the test
    val df = Seq(Tuple1(1)).toDF("i")
    val arr = array(lit("good"),
      when($"i" === 0, lit("x")).otherwise(lit(null).cast("string")),
      lit("bad"))
    // the retired composed form over the SAME array (null slot included)
    val composedSum = aggregate(arr, lit(0.0),
      (acc, t) => acc + coalesce(element_at(wm, t), lit(0.0)))
    val zc = lit(0.25) +
      when(size(arr) > 0, composedSum / size(arr).cast("double"))
        .otherwise(lit(0.0))
    val composed = lit(0.5) * (lit(1.0) + zc / (lit(1.0) + abs(zc)))
    val Array(native, twin) = df.select(
      call_function("classifier_score", arr, wm, lit(0.25)).as("n"),
      composed.as("c")).head().toSeq.map(_.asInstanceOf[Double]).toArray
    val z = 0.25 + (1.5 + 0.0 + -2.0) / 3.0
    val expect = 0.5 * (1.0 + z / (1.0 + math.abs(z)))
    assert(native === expect)
    assert(native === twin)
  }
}
