package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract pins for the native top-p cell expression: ordering, ties,
  * NaN-greatest, null propagation, head ≡ vec_argmax_cell (the
  * multi-probe compatibility contract), codegen/interpreted agreement.
  */
class VecTopCellsSpec extends SparkSpec {
  import spark.implicits._

  private def mat(cs: Seq[Seq[Double]]) =
    array(cs.map(c => array(c.map(lit): _*)): _*)

  private def run(vecs: Seq[Seq[Float]], cs: Seq[Seq[Double]], p: Int,
      codegen: Boolean): Seq[Option[Seq[Int]]] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      vecs.zipWithIndex.toDF("v", "i").orderBy("i")
        .select(call_function("vec_top_cells", col("v"), mat(cs), lit(p)).as("c"))
        .collect().toSeq
        .map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Int](0).toSeq))
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("top-p orders cells by cosine desc, ties to the smaller index, " +
    "NaN greatest; p > k truncates to k") {
    val cs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0), Seq(1.0, 1.0))
    val vecs = Seq(
      Seq(0.9f, 0.1f),  // order: 0 (tie 0/2 -> 0 first), 2, 3, 1
      Seq(0.0f, 0.0f))  // zero norm: NaN everywhere -> index order
    Seq(true, false).foreach { cg =>
      assert(run(vecs, cs, 3, cg) ===
        Seq(Some(Seq(0, 2, 3)), Some(Seq(0, 1, 2))), s"codegen=$cg p=3")
      assert(run(vecs, cs, 9, cg) ===
        Seq(Some(Seq(0, 2, 3, 1)), Some(Seq(0, 1, 2, 3))), s"codegen=$cg p>k")
    }
  }

  test("mixed NaN and real cosines: NaN cells lead in index order, real " +
    "cells follow by score") {
    // zero-norm CENTROID 1 -> NaN cosine for every vector; must outrank
    // even a perfect real match
    val cs = Seq(Seq(1.0, 0.0), Seq(0.0, 0.0), Seq(0.0, 1.0))
    Seq(true, false).foreach { cg =>
      assert(run(Seq(Seq(1.0f, 0.2f)), cs, 3, cg) ===
        Seq(Some(Seq(1, 0, 2))), s"codegen=$cg")
    }
  }

  test("head of vec_top_cells(v, m, p) equals vec_argmax_cell(v, m) on " +
    "real embeddings, both execution modes") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cs = graft.ops.Similarity.seedCentroidsFor(emb, "vec_id", "embedding", 7)
      .map(_._2)
    Seq("CODEGEN_ONLY", "NO_CODEGEN").foreach { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val mismatches = emb.select(
          call_function("vec_argmax_cell", col("embedding"), mat(cs)).as("a"),
          element_at(call_function(
            "vec_top_cells", col("embedding"), mat(cs), lit(3)), 1).as("t"))
          .where(!(col("a") <=> col("t"))).count()
        assert(mismatches === 0, s"head != argmax under $mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null vector and dimension mismatch yield NULL; p < 1 rejected " +
    "at analysis") {
    val cs = Seq(Seq(1.0, 0.0))
    val out = Seq((Seq(1.0, 0.5), 0), (null, 1), (Seq(1.0, 0.0, 0.0), 2))
      .toDF("v", "i").orderBy("i")
      .select(call_function("vec_top_cells",
        col("v").cast("array<double>"), mat(cs), lit(1)).as("c"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getSeq[Int](0)))
    assert(out === Seq(Some(Seq(0)), None, None))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Seq(1.0f, 0.0f)).toDF("v")
        .select(call_function("vec_top_cells", col("v"), mat(cs), lit(0)))
        .collect()
    }
    assert(e.getMessage.contains("p >= 1"))
    // null ELEMENT in a centroid row: plan-time failure via the parse
    // shared with vec_argmax_cell, never a silent 0.0 coercion
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq(1.0f, 0.0f))).toDF("v")
        .select(call_function("vec_top_cells", col("v"),
          expr("array(array(1.0D, CAST(NULL AS DOUBLE)))"), lit(1)))
        .collect()
    }
    assert(e2.getMessage.contains("null element"))
  }

  test("rounding boundary: cosines equal at 9 decimals order by index " +
    "(the shared round9 contract)") {
    // centroid 1 beats centroid 0 by ~1e-12 raw — equal under round9,
    // so index 0 leads (same fixture as the argmax boundary pin)
    val base = Seq(1.0, 1.0e-12)
    val cs = Seq(Seq(1.0, 0.0), base.map(_ / math.sqrt(base.map(x => x * x).sum)))
    Seq(true, false).foreach { cg =>
      assert(run(Seq(Seq(1.0f, 0.0f)), cs, 2, cg) === Seq(Some(Seq(0, 1))),
        s"codegen=$cg")
    }
  }
}
