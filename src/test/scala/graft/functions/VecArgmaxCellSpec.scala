package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract pins for the native argmax-cell expression: tie-breaks,
  * rounding boundary, NaN-greatest, float/double inputs, null
  * propagation, and codegen/interpreted agreement.
  */
class VecArgmaxCellSpec extends SparkSpec {
  import spark.implicits._

  private def mat(cs: Seq[Seq[Double]]) =
    array(cs.map(c => array(c.map(lit): _*)): _*)

  private def run(vecs: Seq[Seq[Float]], cs: Seq[Seq[Double]],
      codegen: Boolean): Seq[Option[Int]] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      vecs.zipWithIndex.toDF("v", "i").orderBy("i")
        .select(call_function("vec_argmax_cell", col("v"), mat(cs)).as("c"))
        .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("argmax picks the max-cosine centroid; exact ties take the " +
    "smallest index; NaN (zero vector) ranks greatest -> index 0") {
    val cs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val vecs = Seq(
      Seq(0.9f, 0.1f),  // cell 0
      Seq(0.1f, 0.9f),  // cell 1
      Seq(2.0f, 0.0f),  // exact tie between centroids 0 and 2 -> 0
      Seq(0.0f, 0.0f))  // zero norm -> NaN cosine everywhere -> first
    Seq(true, false).foreach { cg =>
      assert(run(vecs, cs, cg) === Seq(Some(0), Some(1), Some(0), Some(0)),
        s"codegen=$cg")
    }
  }

  test("rounding boundary: cosines equal at 9 decimals tie to the " +
    "smaller index even when they differ beyond it") {
    // centroid 1's cosine to v exceeds centroid 0's by ~1e-12 — under
    // round(cos, 9) they are EQUAL, so the contract keeps index 0 (the
    // unrounded argmax would flip to 1; this pins the round9 contract)
    val base = Seq(1.0, 1.0e-12)
    val cs = Seq(Seq(1.0, 0.0), base.map(_ / math.sqrt(base.map(x => x * x).sum)))
    val v = Seq(Seq(1.0f, 0.0f))
    Seq(true, false).foreach { cg =>
      assert(run(v, cs, cg) === Seq(Some(0)), s"codegen=$cg")
    }
  }

  test("null vector and dimension mismatch yield NULL; double vectors " +
    "accepted") {
    val cs = Seq(Seq(1.0, 0.0))
    val out = Seq((Seq(1.0, 0.5), 0), (null, 1), (Seq(1.0, 0.0, 0.0), 2))
      .toDF("v", "i").orderBy("i")
      .select(call_function("vec_argmax_cell",
        col("v").cast("array<double>"), mat(cs)).as("c"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out === Seq(Some(0), None, None))
  }

  test("a null ELEMENT inside a centroid row fails at analysis — " +
    "toDoubleArray would silently unbox it to 0.0") {
    val df = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_argmax_cell", col("v"),
        expr("array(array(1.0D, CAST(NULL AS DOUBLE)))"))).collect()
    }
    assert(e.getMessage.contains("null element"))
  }

  test("non-foldable matrix is rejected at analysis") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(Seq(1.0, 0.0))))
      .toDF("v", "m")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_argmax_cell",
        col("v"), col("m").cast("array<array<double>>"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}
