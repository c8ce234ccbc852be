package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VecHammingSpec extends SparkSpec {
  import spark.implicits._

  private def builtinHamming(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)

  test("vec_hamming matches the built-in fold and Long.bitCount on " +
    "packed words (incl. full-width and empty arrays)") {
    val df = Seq(
      (1L, Array(0L, 0L), Array(0L, 0L)),                    // 0
      (2L, Array(0xFFFFFFFFL, 0L), Array(0L, 0L)),           // 32
      (3L, Array(0b1010L, 0b0110L), Array(0b0110L, 0b1010L)), // 2+2
      (4L, Array(-1L), Array(0L)),                           // 64 (sign bit)
      (5L, Array.empty[Long], Array.empty[Long])             // 0
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      call_function("vec_hamming", col("a"), col("b")).as("native"),
      builtinHamming(col("a"), col("b")).as("builtin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 0L), (2L, 32L), (3L, 4L), (4L, 64L), (5L, 0L)))
    out.foreach(r => assert(r._2 === r._3, s"id ${r._1} builtin parity"))
  }

  test("vec_hamming: null array, length mismatch, null element → NULL") {
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L)))),
      (2L, None, Some(Seq(Some(1L)))),
      (3L, Some(Seq(Some(1L), None)), Some(Seq(Some(1L), Some(2L))))
    ).toDF("id", "a", "b")
    val out = df.select(call_function("vec_hamming", col("a"), col("b")))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("vec_hamming rejects non-bigint arrays at analysis") {
    val df = Seq((1L, Array(1.0f), Array(1.0f))).toDF("id", "a", "b")
    val e = intercept[Exception] {
      df.select(call_function("vec_hamming", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("vec_hamming") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("interpreted eval (codegen off) matches the codegen path") {
    val df = Seq(
      (Array(0x123456789ABCDEFL, -1L), Array(0L, 0x0F0F0F0F0F0F0F0FL)),
      (Array(0L), Array(0L))
    ).toDF("a", "b")
    val expr = call_function("vec_hamming", col("a"), col("b"))
    val withCodegen = df.select(expr).collect().map(_.getLong(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(expr).collect().map(_.getLong(0))
      assert(withCodegen.toSeq === interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      // unset, not hardcode: the session is shared across suites and the
      // Spark default (FALLBACK) must come back for everyone after us
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
