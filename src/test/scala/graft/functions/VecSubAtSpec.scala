package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract pins for the native residual subtraction (the IVFADC
  * residual arm's hot-path loop): exact elementwise `vec − mat[idx]`
  * bit-identity with the composed `zip_with` form it replaced, the
  * null/out-of-range/length-mismatch poison contract, NaN pass-through,
  * and codegen/interpreted agreement.
  */
class VecSubAtSpec extends SparkSpec {
  import spark.implicits._

  private def mat(cs: Seq[Seq[Double]]) =
    array(cs.map(c => array(c.map(lit): _*)): _*)

  private def run(
      rows: Seq[(Seq[java.lang.Float], java.lang.Integer)],
      cs: Seq[Seq[Double]], codegen: Boolean): Seq[Option[Seq[Double]]] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      rows.zipWithIndex.map { case ((v, i), o) => (v, i, o) }
        .toDF("v", "idx", "o").orderBy("o")
        .select(call_function("vec_sub_at", col("v"), mat(cs), col("idx"))
          .as("r"))
        .collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Double](0).toSeq))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("subtracts the idx-th matrix row elementwise, exact IEEE double " +
    "(bit-identical to the zip_with form), in both execution modes") {
    val cs = Seq(Seq(1.0, -2.0), Seq(0.25, 0.125))
    val rows = Seq(
      (Seq[java.lang.Float](3.0f, 1.0f), java.lang.Integer.valueOf(0)),
      (Seq[java.lang.Float](3.0f, 1.0f), java.lang.Integer.valueOf(1)))
    val expected = Seq(
      Some(Seq(3.0 - 1.0, 1.0 - -2.0)),
      Some(Seq(3.0 - 0.25, 1.0 - 0.125)))
    Seq(true, false).foreach { cg =>
      assert(run(rows, cs, cg) === expected, s"codegen=$cg")
    }
    // bit-identity with the composed lambda on non-representable floats
    val v = Seq(Tuple1(Seq(0.1f, 0.3f))).toDF("v")
    val native = v.select(call_function("vec_sub_at", col("v"), mat(cs),
      lit(0)).as("r")).head.getSeq[Double](0)
    val lambda = v.select(zip_with(col("v"),
      typedlit(cs.head), (a, b) => a.cast("double") - b).as("r"))
      .head.getSeq[Double](0)
    assert(native === lambda,
      "native subtraction must be bit-identical to the zip_with form")
  }

  test("NULL vector, NULL element, NULL idx, idx out of [0, k), and " +
    "length mismatch all poison to NULL") {
    val cs = Seq(Seq(1.0, 0.0))
    val out = run(Seq(
      (Seq[java.lang.Float](1.0f, 2.0f), java.lang.Integer.valueOf(0)),
      (null, java.lang.Integer.valueOf(0)),
      (Seq[java.lang.Float](1.0f, null), java.lang.Integer.valueOf(0)),
      (Seq[java.lang.Float](1.0f, 2.0f), null),
      (Seq[java.lang.Float](1.0f, 2.0f), java.lang.Integer.valueOf(1)),
      (Seq[java.lang.Float](1.0f, 2.0f), java.lang.Integer.valueOf(-1)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), java.lang.Integer.valueOf(0))),
      cs, codegen = true)
    assert(out === Seq(Some(Seq(0.0, 2.0)), None, None, None, None, None,
      None))
  }

  test("NaN elements pass through (the consumer owns NaN ranking, same " +
    "as a raw vector); double vectors accepted") {
    val cs = Seq(Seq(1.0, 0.0))
    val out = Seq(Tuple1(Seq(Double.NaN, 2.0)))
      .toDF("v")
      .select(call_function("vec_sub_at",
        col("v").cast("array<double>"), mat(cs), lit(0)).as("r"))
      .head.getSeq[Double](0)
    assert(out(0).isNaN && out(1) === 2.0)
  }

  test("non-foldable matrix and null matrix elements are rejected at " +
    "analysis (plan-time model contract, not per-row NULLs)") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(Seq(1.0, 0.0)))).toDF("v", "m")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_sub_at", col("v"),
        col("m").cast("array<array<double>>"), lit(0))).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("foldable"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_sub_at", col("v"),
        expr("array(array(1.0D, CAST(NULL AS DOUBLE)))"), lit(0))).collect()
    }
    assert(e2.getMessage.contains("null element"))
  }
}
