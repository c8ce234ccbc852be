package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract pins for the native argmin-L2 expression (the PQ subvector
  * quantizer, [[VecArgmaxCell]]'s documented mirror): tie-breaks, the
  * round(d², 9) boundary, NaN-loses (inverted from the argmax's
  * NaN-greatest because this is a MIN), all-NaN fallback, the large-d²
  * raw-compare path, null/length propagation, and codegen/interpreted
  * agreement.
  */
class VecArgminL2Spec extends SparkSpec {
  import spark.implicits._

  private def mat(cs: Seq[Seq[Double]]) =
    array(cs.map(c => array(c.map(lit): _*)): _*)

  private def run(vecs: Seq[Seq[Float]], cs: Seq[Seq[Double]],
      codegen: Boolean): Seq[Option[Int]] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      vecs.zipWithIndex.toDF("v", "i").orderBy("i")
        .select(call_function("vec_argmin_l2", col("v"), mat(cs)).as("c"))
        .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("argmin picks the min-d² codeword; exact ties take the smallest " +
    "index; both execution modes agree") {
    val cs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val vecs = Seq(
      Seq(0.9f, 0.1f), // code 0
      Seq(0.1f, 0.9f), // code 1
      Seq(1.0f, 0.0f)) // exact tie between codewords 0 and 2 -> 0
    Seq(true, false).foreach { cg =>
      assert(run(vecs, cs, cg) === Seq(Some(0), Some(1), Some(0)),
        s"codegen=$cg")
    }
  }

  test("rounding boundary: distances equal at 9 decimals tie to the " +
    "smaller index even when they differ beyond it") {
    // codeword 1 sits ~1e-11 CLOSER to v than codeword 0 — under
    // round(d², 9) the distances are EQUAL, so the contract keeps index
    // 0 (the unrounded argmin would flip to 1; this pins the round9
    // contract the DuckDB twins mirror as round(d2, 9) ASC, index ASC)
    val cs = Seq(Seq(1.0, 0.0), Seq(1.0, 1.0e-11))
    val v = Seq(Seq(1.0f, 0.0f))
    Seq(true, false).foreach { cg =>
      assert(run(v, cs, cg) === Seq(Some(0)), s"codegen=$cg")
    }
  }

  test("a NaN distance loses to every real one (argMIN inverts the " +
    "argmax's NaN-greatest); an all-NaN scan falls back to index 0") {
    // codeword 0 contains NaN -> its d² is NaN for every vector; the
    // real codeword 1 must win even though it is far away
    val cs = Seq(Seq(Double.NaN, 0.0), Seq(5.0, 5.0))
    val vecs = Seq(Seq(0.0f, 0.0f))
    Seq(true, false).foreach { cg =>
      assert(run(vecs, cs, cg) === Seq(Some(1)), s"codegen=$cg")
    }
    // a NaN VECTOR element poisons every distance -> smallest index,
    // the documented struct-ordering fallback (and round9 — which would
    // throw on NaN — must never be reached on this path)
    val allNaN = Seq(Seq(Float.NaN, 0.0f))
    Seq(true, false).foreach { cg =>
      assert(run(allNaN, cs, cg) === Seq(Some(0)), s"codegen=$cg")
    }
  }

  test("large distances (> 1e9, beyond the 1e-9 Long rounding range) " +
    "take the raw-compare path instead of overflowing mid-row") {
    // d² ≈ 4e18 — round9's movePointRight(9).longValueExact() would
    // throw; the raw path must return the true argmin
    val cs = Seq(Seq(2.0e9, 0.0), Seq(1.9e9, 0.0))
    val v = Seq(Seq(0.0f, 0.0f))
    Seq(true, false).foreach { cg =>
      assert(run(v, cs, cg) === Seq(Some(1)), s"codegen=$cg")
    }
  }

  test("null vector, null element, and length mismatch yield NULL; " +
    "double vectors accepted") {
    val cs = Seq(Seq(1.0, 0.0))
    val out = Seq(
      (Seq[java.lang.Double](1.0, 0.5), 0),
      (null, 1),
      (Seq[java.lang.Double](1.0, null), 2),
      (Seq[java.lang.Double](1.0, 0.0, 0.0), 3))
      .toDF("v", "i").orderBy("i")
      .select(call_function("vec_argmin_l2",
        col("v").cast("array<double>"), mat(cs)).as("c"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out === Seq(Some(0), None, None, None))
  }

  test("a null ELEMENT inside a codebook row fails at analysis — " +
    "toDoubleArray would silently unbox it to 0.0") {
    val df = Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_argmin_l2", col("v"),
        expr("array(array(1.0D, CAST(NULL AS DOUBLE)))"))).collect()
    }
    assert(e.getMessage.contains("null element"))
  }

  test("non-foldable codebook is rejected at analysis") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(Seq(1.0, 0.0)))).toDF("v", "m")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("vec_argmin_l2",
        col("v"), col("m").cast("array<array<double>>"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}
