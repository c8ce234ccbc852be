package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

class SimHash16Spec extends SparkSpec {
  import spark.implicits._

  test("native simhash16 is bit-identical to the builtin composition") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "x"), (4L, "")
    ).toDF("doc_id", "text")
    val native = docs.select(Dedup.simhash16(col("text")))
      .as[Long].collect().toSeq
    val builtin = docs.select(Dedup.simhash16Builtin(col("text")))
      .as[Long].collect().toSeq
    assert(native === builtin)
    assert(native(0) === native(1)) // identical docs, identical hash
  }

  test("property: native == builtin for arbitrary texts") {
    val textGen = Gen.listOfN(10,
      Gen.oneOf("alpha", "beta", "g", "zz", "ünïcode", "的", "x1", ""))
      .map(_.mkString(" "))
    val prop = Prop.forAll(textGen) { t =>
      val df = Seq(Tuple1(t)).toDF("text")
      df.select(Dedup.simhash16(col("text"))).head().getLong(0) ==
        df.select(Dedup.simhash16Builtin(col("text"))).head().getLong(0)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("native simhash64 frame is identical to the builtin aggregate frame") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "der schnelle braune fuchs"), (4L, "x"),
      (5L, ""), (6L, null.asInstanceOf[String]) // both dropped by each path
    ).toDF("doc_id", "text")
    val native = Dedup.simhash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val builtin = Dedup.simhash64Builtin(docs, "doc_id", "text")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(native === builtin)
    assert(native.map(_._1) === Seq(1L, 2L, 3L, 4L)) // 5,6 dropped
    assert(native(0)._2 === native(1)._2)
  }

  test("property: native simhash64 == builtin for arbitrary texts") {
    val textGen = Gen.listOfN(8,
      Gen.oneOf("alpha", "beta", "g", "zz", "ünïcode", "的", "x1"))
      .map(_.mkString(" "))
    val prop = Prop.forAll(textGen) { t =>
      val df = Seq((1L, t)).toDF("doc_id", "text")
      Dedup.simhash64(df, "doc_id", "text").head().getLong(1) ==
        Dedup.simhash64Builtin(df, "doc_id", "text").head().getLong(1)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("null text yields null; empty token array yields 0") {
    val n = Seq(Tuple1(null: String)).toDF("text")
      .select(Dedup.simhash16(col("text"))).collect()
    assert(n(0).isNullAt(0))
    assert(Seq(Tuple1(Seq.empty[String])).toDF("ts")
      .selectExpr("simhash16(ts)").head().getLong(0) === 0L)
  }
}
