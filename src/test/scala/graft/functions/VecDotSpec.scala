package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def builtinDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot matches the built-in fold bit-for-bit on float arrays") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.7f, 0.11f, 0.13f)),
      (3L, Array.empty[Float], Array.empty[Float])
    ).toDF("id", "a", "b")
    val out = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      builtinDot(col("a"), col("b")).as("builtin")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot: null array, length mismatch, null element → NULL") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0f), Some(2.0f))), Some(Seq(Some(3.0f)))), // length mismatch
      (2L, None, Some(Seq(Some(1.0f)))), // null array
      (3L, Some(Seq(Some(1.0f), None)), Some(Seq(Some(1.0f), Some(2.0f)))) // null element
    ).toDF("id", "a", "b")
    val out = df.select(call_function("vec_dot", col("a"), col("b")))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("vec_dot mixes float and double element types (literal signs)") {
    val df = Seq((1L, Array(1.0f, -2.0f))).toDF("id", "a")
    val signs = lit(Array(1.0, -1.0))
    val out = df.select(call_function("vec_dot", col("a"), signs)).head.getDouble(0)
    assert(out === 3.0)
  }

  test("interpreted eval (codegen off) matches the codegen path bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val expr = call_function("vec_dot", col("a"), col("b"))
    val withCodegen = df.select(expr).collect().map(_.getDouble(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(expr).collect().map(_.getDouble(0))
      assert(withCodegen.map(java.lang.Double.doubleToLongBits).toSeq ===
        interpreted.map(java.lang.Double.doubleToLongBits).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("Similarity.dot routes through vec_dot and keeps oracle-exact scores") {
    val df = Seq(
      (1L, Array(0.5f, 0.25f, 0.125f)),
      (2L, Array(0.3f, 0.7f, 0.9f))
    ).toDF("id", "v")
    val paired = df.as("x").crossJoin(df.as("y"))
      .select(graft.ops.Similarity.cosine(col("x.v"), col("y.v")).as("c"))
    val cs = paired.collect().map(_.getDouble(0))
    assert(cs.count(c => math.abs(c - 1.0) < 1e-12) == 2) // self pairs
  }
}
