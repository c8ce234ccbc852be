package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior pins for the binary (1-bit sign) quantization family
  * (binQuantize / hammingTopK): packing round-trips against a plain-Scala
  * sign-bit reference, the malformed-row poisoning contract (wrong length
  * BOTH directions, NULL element, NaN element), the Hamming rank/tie
  * contract against a driver-side popcount oracle, the malformed-query
  * drop discipline, k > corpus, and the dim validation.
  */
class BinSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val rnd = new scala.util.Random(42)

  /** 12 deterministic vectors with mixed signs (and exact zeros — a zero
    * must pack as bit 0: the contract is strictly `> 0`).
    */
  private val vecs: Seq[(Long, Seq[Float])] = (0L until 12L).map { i =>
    i -> Seq.fill(dim) {
      val r = rnd.nextInt(5) // 0..4: two negative, one zero, two positive
      (r - 2) * (rnd.nextFloat() + 0.1f)
    }
  }

  private def fixture = vecs.toDF("vec_id", "embedding")

  /** The packing contract in plain Scala: word w bit j = vec(32w+j) > 0. */
  private def refWords(v: Seq[Float]): Seq[Long] =
    v.grouped(32).map(_.zipWithIndex.map { case (x, j) =>
      if (x > 0) 1L << j else 0L
    }.sum).toSeq

  test("binQuantize packs sign bits exactly as the plain-Scala reference " +
    "(32 dims per word, bits 0..31, zero packs as 0)") {
    val got = Similarity.binQuantize(fixture, "vec_id", "embedding", dim)
      .select("vec_id", "bin_words", "bin_code")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2)))
      .sortBy(_._1)
    assert(got.length == 12)
    got.foreach { case (id, words, code) =>
      val want = refWords(vecs(id.toInt)._2)
      assert(words == want, s"vec $id words")
      assert(code == want.mkString(","), s"vec $id code string")
      // bits 0..31 only: no packed word may touch the BIGINT sign bit
      words.foreach(w => assert(w >= 0L && w < (1L << 32), s"vec $id range"))
    }
  }

  test("binQuantize poisons malformed rows to NULL: short vector, LONG " +
    "vector, NULL element, NaN element, NULL vector") {
    val bad = Seq(
      (100L, Seq.fill(dim - 1)(1.0f)),             // short
      (101L, Seq.fill(dim + 1)(1.0f)),             // long — must NOT
      // silently encode from its first dim elements
      (102L, (Seq.fill(dim - 1)(1.0f) :+ Float.NaN)), // NaN poisons: an
      // unguarded NaN > 0 is false and would quietly encode bit 0
      (103L, Seq.fill(dim)(1.0f))                  // control: valid
    ).toDF("vec_id", "embedding")
      .union(Seq(104L).toDF("vec_id")
        .withColumn("embedding",
          concat(array((0 until dim - 1).map(_ => lit(1.0f)): _*),
            array(lit(null).cast("float")))))
      // a NULL VECTOR must poison too: with the negative-gate
      // formulation (when(malformed, null).otherwise(array)) size(NULL)
      // and exists(NULL) are NULL — not true — so the otherwise branch
      // encoded NULL as the all-zeros code (measured in review)
      .union(Seq(105L).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
    val got = Similarity.binQuantize(bad, "vec_id", "embedding", dim)
      .collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(got(100L) == (true, true))
    assert(got(101L) == (true, true))
    assert(got(102L) == (true, true))
    assert(got(104L) == (true, true))
    assert(got(105L) == (true, true))
    assert(got(103L) == (false, false))
  }

  test("binQuantize rejects a dim that is not a positive multiple of 32") {
    intercept[IllegalArgumentException] {
      Similarity.binQuantize(fixture, "vec_id", "embedding", 48)
    }
    intercept[IllegalArgumentException] {
      Similarity.binQuantize(fixture, "vec_id", "embedding", 0)
    }
  }

  test("hammingTopK matches a driver-side popcount oracle: hamming ASC, " +
    "ties to the smaller neighbor_id, self excluded") {
    val codes = Similarity.binQuantize(fixture, "vec_id", "embedding", dim)
    val k = 4
    val got = Similarity.hammingTopK(
      fixture.where(col("vec_id") < 3), codes, "vec_id", "embedding", k, dim)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    val packed = vecs.map { case (id, v) => id -> refWords(v) }.toMap
    for (q <- 0L until 3L) {
      val want = packed.keys.filter(_ != q).toSeq
        .map { n =>
          val hd = packed(q).zip(packed(n))
            .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
          (n, hd)
        }
        .sortBy { case (n, hd) => (hd, n) }
        .take(k)
      want.zipWithIndex.foreach { case ((n, hd), i) =>
        assert(got((q, i + 1)) == ((n, hd)), s"query $q rank ${i + 1}")
      }
    }
  }

  test("ivfBinTopK with nprobe = cells ≡ hammingTopK — the full-probe " +
    "identity (every cell probed restores the full scan bit-for-bit)") {
    val queries = fixture.where(col("vec_id") < 3)
    val codes = Similarity.binQuantize(fixture, "vec_id", "embedding", dim)
    val full = Similarity.hammingTopK(
      queries, codes, "vec_id", "embedding", 4, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val kc = 3
    val ivf = Similarity.ivfBinTopK(
      queries, fixture, "vec_id", "embedding", 4, kc, dim, nprobe = kc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == full)
  }

  test("ivfBinTopK at nprobe = 1 returns exactly the full-scan ranking " +
    "restricted to the query's own cell") {
    val queries = fixture.where(col("vec_id") < 3)
    val kc = 3
    val cents = Similarity.seedCentroidsFor(fixture, "vec_id", "embedding", kc)
    val cells = Similarity.withCells(fixture, "vec_id", "embedding", cents, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("_cell")))
      .toMap
    val got = Similarity.ivfBinTopK(
      queries, fixture, "vec_id", "embedding", 4, kc, dim)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val packed = vecs.map { case (id, v) => id -> refWords(v) }.toMap
    for (q <- 0L until 3L) {
      val want = packed.keys
        .filter(n => n != q && cells(n) == cells(q)).toSeq
        .map { n =>
          val hd = packed(q).zip(packed(n))
            .map { case (a, b) => java.lang.Long.bitCount(a ^ b).toLong }.sum
          (n, hd)
        }
        .sortBy { case (n, hd) => (hd, n) }
        .take(4)
      want.zipWithIndex.foreach { case ((n, hd), i) =>
        assert(got((q, i + 1)) == ((n, hd)), s"query $q rank ${i + 1}")
      }
      // and nothing beyond the cell-mates ranks
      assert(got.keys.count(_._1 == q) == want.size)
    }
  }

  test("ivfBinProbe of the persisted artifact is bit-identical to the " +
    "inline path, stores no raw vectors, and the _params stamp fails " +
    "loudly on either drift axis (cells or dim)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfbin").toString
    val queries = fixture.where(col("vec_id") < 3)
    val kc = 3
    val cents = Similarity.ivfBinBuild(
      fixture, "vec_id", "embedding", kc, dim, 4, wh, "bin")
    val assigned = Similarity.ivfAssigned(spark, wh, "bin", "ivfbin")
    assert(!assigned.columns.contains("embedding"),
      "artifact must not store raw vectors")
    val probe = Similarity.ivfBinProbe(
      queries, assigned, "vec_id", "embedding", 4, cents, dim)
    val inline = Similarity.ivfBinTopKFrom(
      queries, fixture, "vec_id", "embedding", 4, cents, dim)
    assert(probe.exceptAll(inline).isEmpty && inline.exceptAll(probe).isEmpty,
      "probe ≠ inline")
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"corpus side must not shuffle on the probe path:\n$plan")
    // drift, axis 1: different coarse cells
    val otherCents = Similarity.seedCentroidsFor(
      fixture, "vec_id", "embedding", 5)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfBinProbe(
        queries, assigned, "vec_id", "embedding", 4, otherCents, dim)
    }
    assert(e1.getMessage.contains("IVF-binary"))
    // drift, axis 2: different packing dim
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfBinProbe(
        queries, assigned, "vec_id", "embedding", 4, cents, dim + 32)
    }
    assert(e2.getMessage.contains("IVF-binary"))
  }

  test("hammingTopK drops a malformed query instead of returning an " +
    "arbitrary top-k, and k > corpus ranks every corpus row") {
    val codes = Similarity.binQuantize(fixture, "vec_id", "embedding", dim)
    val queries = Seq(
      (0L, vecs(0)._2),
      (200L, Seq.fill(dim - 1)(1.0f)) // malformed: wrong length
    ).toDF("vec_id", "embedding")
    val got = Similarity.hammingTopK(
      queries, codes, "vec_id", "embedding", 100, dim)
    assert(got.where(col("query_id") === 200L).count() == 0)
    // query 0 ranks all 11 non-self corpus rows (k capped by corpus)
    assert(got.where(col("query_id") === 0L).count() == 11)
  }

  test("hammingTopK refuses a dim-drifted codes frame at plan time (the " +
    "bin_words metadata stamp); unstamped frames are tolerated") {
    // a 64-dim fixture packed at dim=64, probed at dim=32: without the
    // stamp every distance would be NULL and every pair would silently
    // drop — the guard turns that into a loud plan-time failure
    val codes = Similarity.binQuantize(fixture, "vec_id", "embedding", dim)
    val queries32 = Seq((0L, Seq.fill(32)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.hammingTopK(queries32, codes, "vec_id", "embedding", 5, 32)
    }
    assert(e.getMessage.contains(s"dim=$dim") &&
      e.getMessage.contains("dim=32"))
    // metadata survives a projection AND a parquet round trip
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bin_stamp").toString
    codes.select("vec_id", "bin_words").write
      .mode("overwrite").parquet(tmp)
    val reread = spark.read.parquet(tmp)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hammingTopK(queries32, reread, "vec_id", "embedding", 5, 32)
    }
    assert(e2.getMessage.contains(s"dim=$dim"))
    // an unstamped frame (hand-built) still runs — pre-stamp tolerance
    val bare = codes.select(col("vec_id"),
      col("bin_words").as("bin_words")) // fresh alias drops no metadata…
    val stripped = spark.createDataFrame(
      bare.rdd, org.apache.spark.sql.types.StructType(
        bare.schema.fields.map(_.copy(
          metadata = org.apache.spark.sql.types.Metadata.empty))))
    val ok = Similarity.hammingTopK(
      fixture.where(col("vec_id") === 0L), stripped,
      "vec_id", "embedding", 5, dim)
    assert(ok.count() == 5)
  }
}
