package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native signature is bit-identical to the builtin composition") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a b"), // fewer tokens than shingle size → single joined shingle
      (3L, "der schnelle braune fuchs springt und das war gut so ja")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
    val native = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("sh"), 8).as("sig")).orderBy("doc_id").collect()
    val builtin = docs.select(col("doc_id"),
      Dedup.minhashSignatureBuiltin(col("sh"), 8).as("sig")).orderBy("doc_id").collect()
    assert(native.map(_.getSeq[String](1)).toSeq ===
      builtin.map(_.getSeq[String](1)).toSeq)
  }

  test("property: native == builtin for arbitrary token lists and hash counts") {
    val tokens = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "", "ünïcode", "的"))
    val prop = Prop.forAll(tokens, Gen.choose(1, 12)) { (ts, k) =>
      val df = Seq(Tuple1(ts)).toDF("sh")
      val n = df.select(Dedup.minhashSignature(col("sh"), k)).head().getSeq[String](0)
      val b = df.select(Dedup.minhashSignatureBuiltin(col("sh"), k)).head().getSeq[String](0)
      n == b
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(8).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("empty array yields all-null mins; null input yields null") {
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 4)).head().getSeq[String](0)
    assert(empty === Seq(null, null, null, null))
    val n = Seq(Tuple1(null: Seq[String])).toDF("sh")
      .select(Dedup.minhashSignature(col("sh"), 4)).collect()
    assert(n(0).isNullAt(0))
  }

  test("registered SQL function evaluates through codegen") {
    val out = Seq((1L, Seq("a", "b", "c"))).toDF("id", "sh")
      .selectExpr("minhash_sig(sh, 2) AS sig").head().getSeq[String](0)
    // md5('0:a'|'0:b'|'0:c') minimum, computed independently
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(out(0) === Seq(m("0:a"), m("0:b"), m("0:c")).min)
    assert(out(1) === Seq(m("1:a"), m("1:b"), m("1:c")).min)
  }
}
