package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract pins for the native SRP bucket expression: bit-identity with
  * the composed builtin form it replaced, null-collapse semantics, band
  * ranges, and codegen/interpreted agreement.
  */
class VecSrpBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The composed form srpBucketRange shipped before round 8 — kept here
    * verbatim as the reference implementation the native expression must
    * match bit-for-bit (same md5 sign source, VecSrpBucket.sign).
    */
  private def composed(vec: org.apache.spark.sql.Column,
      firstPlane: Int, numPlanes: Int): org.apache.spark.sql.Column = {
    val bits = (0 until numPlanes).map { h =>
      val signs = lit((0 until VecSrpBucket.maxDim)
        .map(i => VecSrpBucket.sign(firstPlane + h, i)).toArray)
      val proj = call_function("vec_dot", vec, slice(signs, lit(1), size(vec)))
      when(proj > 0, lit(1 << h)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  test("native srp_bucket is bit-identical to the composed builtin form " +
    "on the corpus, across plane counts and band offsets") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    Seq((0, 4), (0, 7), (14, 7), (3, 1)).foreach { case (fp, np) =>
      val both = emb.select(
        call_function("srp_bucket", col("embedding"), lit(fp), lit(np)).as("n"),
        composed(col("embedding"), fp, np).as("c"))
      val diff = both.where(col("n") =!= col("c")).count()
      assert(diff === 0, s"firstPlane=$fp numPlanes=$np: $diff rows differ")
    }
    emb.unpersist(); ()
  }

  test("null vector, null element, and over-length vectors collapse to " +
    "bucket 0 (the composed form's null semantics), non-null result") {
    val rows = Seq(
      (0, Seq[java.lang.Float](1.0f, -2.0f)),
      (1, null),
      (2, Seq.fill[java.lang.Float](VecSrpBucket.maxDim + 1)(1.0f)),
      (3, Seq[java.lang.Float](1.0f, null, 3.0f))).toDF("i", "v")
    val out = rows.orderBy("i")
      .select(call_function("srp_bucket", col("v"), lit(0), lit(4)).as("b"))
      .collect().map(r => (r.isNullAt(0), if (r.isNullAt(0)) -1 else r.getInt(0)))
    assert(out(0)._1 === false)
    assert(out(1) === ((false, 0)))
    assert(out(2) === ((false, 0)))
    assert(out(3) === ((false, 0)))
  }

  test("codegen and interpreted evaluation agree") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(64).cache()
    def run(mode: String): Seq[Int] = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try emb.orderBy("vec_id")
        .select(call_function("srp_bucket", col("embedding"), lit(7), lit(7)))
        .collect().map(_.getInt(0)).toSeq
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
    emb.unpersist(); ()
  }
}
