package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVFADC composition pins (Jégou et al. 2011 §V): the inline path is
  * pqTopK restricted to probed cells, probing EVERY cell recovers the
  * full ADC scan exactly, the persisted artifact is bit-identical to the
  * inline path with zero corpus-side shuffle, the artifact stores codes
  * (not vectors — where the 64× cut is realized at rest), and the
  * two-model drift guard fails loudly on either quantizer.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def model(df: org.apache.spark.sql.DataFrame) =
    Similarity.pqTrain(df, "vec_id", "embedding", m = 8, ks = 16, iters = 1)

  test("ivfPqTopK equals pqTopK restricted to pairs sharing the query's " +
    "probed cell; probing EVERY cell recovers the full ADC scan exactly") {
    val e = emb.cache()
    val m = model(e)
    val queries = e.where(col("vec_id") < 8)
    val kc = 4
    val composed = Similarity.ivfPqTopK(
      queries, e, "vec_id", "embedding", 5, kc, m)
    // reference: the full ADC scan joined to cell assignments, filtered
    // to same-cell pairs, re-ranked — built from the operator's own
    // parts but composed the slow way (score everything, filter after)
    val cents = Similarity.seedCentroidsFor(e, "vec_id", "embedding", kc)
    val cells = Similarity.withCell(e, "vec_id", "embedding", cents)
      .select(col("vec_id"), col("_cell"))
    val enc = Similarity.pqEncode(e, "vec_id", "embedding", m)
    // k = n: rank EVERY same-cell pair, then cut to 5 after the filter
    val full = Similarity.pqTopK(queries, enc, "vec_id", "embedding",
      e.count().toInt, m)
      .join(cells.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("_cell", "_qc"), Seq("query_id"))
      .join(cells.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("_cell", "_nc"), Seq("neighbor_id"))
      .where(col("_qc") === col("_nc"))
    val reranked = full
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("adc"), col("neighbor_id"))))
      .where(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank")
    val got = composed.select("query_id", "neighbor_id", "rank")
    assert(got.exceptAll(reranked).isEmpty && reranked.exceptAll(got).isEmpty,
      "composed ≠ restricted full scan")
    // the caller-cents seam: ivfPqTopK ≡ ivfPqTopKFrom(seedCentroids)
    val viaFrom = Similarity.ivfPqTopKFrom(
      queries, e, "vec_id", "embedding", 5, cents, m)
      .select("query_id", "neighbor_id", "rank")
    assert(viaFrom.exceptAll(got).isEmpty && got.exceptAll(viaFrom).isEmpty,
      "ivfPqTopKFrom(first-k seeds) ≠ ivfPqTopK")
    // nprobe = cells probes everything: bit-identical to the full scan
    val all = Similarity.ivfPqTopK(
      queries, e, "vec_id", "embedding", 5, kc, m, nprobe = kc)
    val brute = Similarity.pqTopK(queries, enc, "vec_id", "embedding", 5, m)
    assert(all.exceptAll(brute).isEmpty && brute.exceptAll(all).isEmpty,
      "nprobe = cells must equal the full ADC scan exactly")
    e.unpersist(); ()
  }

  test("ivfPqProbe of the persisted artifact is bit-identical to the " +
    "inline path, reaches the join with zero corpus-side shuffle, and " +
    "stores codes without raw vectors") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val e = emb.cache()
    val m = model(e)
    val queries = e.where(col("vec_id") < 8)
    val cents = Similarity.ivfPqBuild(
      e, "vec_id", "embedding", 4, m, 8, wh, "ivfpq")
    try {
      val assigned = Similarity.ivfAssigned(spark, wh, "ivfpq", "ivfpq")
      // the serving artifact is (id, cell, codes) — no embedding column:
      // ADC needs only the 4-bit codes, which is where the 64× storage
      // cut lands at rest
      assert(!assigned.columns.contains("embedding"),
        "artifact must not store raw vectors")
      val probe = Similarity.ivfPqProbe(
        queries, assigned, "vec_id", "embedding", 5, cents, m)
      val inline = Similarity.ivfPqTopK(
        queries, e, "vec_id", "embedding", 5, 4, m)
      assert(probe.exceptAll(inline).isEmpty && inline.exceptAll(probe).isEmpty,
        "probe ≠ inline")
      val plan = probe.queryExecution.executedPlan.toString
      // bucketed corpus + broadcast queries + partial top-k: the only
      // shuffle is the |queries|-keyed agg exchange (no window, no
      // corpus exchange)
      assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
        s"corpus side must not shuffle on the ADC probe path:\n$plan")
      assert(!plan.contains("Window"), s"no window on the ADC path:\n$plan")
      // drift guard, both halves: a different coarse quantizer...
      val otherCents =
        Similarity.seedCentroidsFor(e, "vec_id", "embedding", 6)
      val e1 = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbe(
          queries, assigned, "vec_id", "embedding", 5, otherCents, m)
      }
      assert(e1.getMessage.contains("IVFADC"))
      // ...and a different codebook both fail loudly
      val otherModel = Similarity.pqTrain(
        e, "vec_id", "embedding", m = 8, ks = 8, iters = 1)
      val e2 = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbe(
          queries, assigned, "vec_id", "embedding", 5, cents, otherModel)
      }
      assert(e2.getMessage.contains("IVFADC"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS " + graft.sources
        .BucketedSink(8, Seq("_cell"), Nil, "ivfpq").catalogName(wh, "ivfpq"))
      e.unpersist(); ()
    }
  }

  test("residual arm: _rv is exactly vec − centroid(cell); the persisted " +
    "res+ artifact probes bit-identically to the inline residual path " +
    "with the same shuffle-free plan; and arm mismatch (raw probe of a " +
    "residual artifact, or the reverse) fails loudly as model drift") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_res").toString
    val e = emb.cache()
    val kc = 4
    val cents = Similarity.seedCentroidsFor(e, "vec_id", "embedding", kc)
    // the residual frame really subtracts the assigned cell's centroid
    val row = Similarity.ivfPqResiduals(e, "vec_id", "embedding", cents)
      .where(col("vec_id") === 100)
      .select(col("embedding"), col("_cell"), col("_rv")).head
    val cent = cents.toMap.apply(row.getLong(1))
    assert(row.getSeq[Double](2) ==
      row.getSeq[Float](0).zip(cent).map { case (a, b) => a.toDouble - b }.toSeq,
      "_rv must be vec − centroid(cell), exact double subtraction")
    val mRes = Similarity.pqTrainRes(e, "vec_id", "embedding", cents,
      m = 8, ks = 16, iters = 1)
    // regression pin for the zero-seed degeneration: first-k-by-id seeds
    // over residuals are all-zero (centroid rows), which collapsed every
    // subspace to ONE surviving codeword — pqTrainRes must seed past the
    // centroid prefix and keep a real codebook
    assert(mRes.books.forall(_.size > 1),
      s"residual codebooks degenerated: ${mRes.books.map(_.size)}")
    val queries = e.where(col("vec_id") < 8)
    try {
      val cents2 = Similarity.ivfPqBuild(
        e, "vec_id", "embedding", kc, mRes, 8, wh, "res", residual = true)
      assert(cents2 === cents, "build must re-derive the same coarse seeds")
      val assigned = Similarity.ivfAssigned(spark, wh, "res", "ivfpq")
      val probe = Similarity.ivfPqProbe(
        queries, assigned, "vec_id", "embedding", 5, cents, mRes,
        residual = true)
      val inline = Similarity.ivfPqTopK(
        queries, e, "vec_id", "embedding", 5, kc, mRes, residual = true)
      assert(probe.exceptAll(inline).isEmpty && inline.exceptAll(probe).isEmpty,
        "residual probe ≠ residual inline")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
        s"residual probe must keep the shuffle-free corpus path:\n$plan")
      // raw-arm probe of the residual artifact reads cell-relative codes
      // as absolute ones — recall collapses silently without the stamp
      val eArm = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbe(
          queries, assigned, "vec_id", "embedding", 5, cents, mRes)
      }
      assert(eArm.getMessage.contains("IVFADC"))
      // ...and the reverse: residual probe of a raw artifact
      val mRaw = model(e)
      val centsRaw = Similarity.ivfPqBuild(
        e, "vec_id", "embedding", kc, mRaw, 8, wh, "raw")
      val eArm2 = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbe(
          queries, Similarity.ivfAssigned(spark, wh, "raw", "ivfpq"),
          "vec_id", "embedding", 5, centsRaw, mRaw, residual = true)
      }
      assert(eArm2.getMessage.contains("IVFADC"))
    } finally {
      Seq("res", "raw").foreach { t =>
        spark.sql("DROP TABLE IF EXISTS " + graft.sources
          .BucketedSink(8, Seq("_cell"), Nil, "ivfpq").catalogName(wh, t))
      }
      e.unpersist(); ()
    }
  }

  test("ivfPqIngest: streamed micro-batches probe bit-identically to a " +
    "batch rebuild; a committed batch replays as a no-op; a TORN batch " +
    "(inflight marker, no commit) deduplicates on replay instead of " +
    "doubling its rows in the artifact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_st").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ivfpq_ck").toString
    val e = emb.cache()
    val m = model(e)
    val cents = Similarity.seedCentroidsFor(e, "vec_id", "embedding", 4)
    val queries = e.where(col("vec_id") < 8)
    val rows = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b0, b1) = rows.partition(_._1 < 400)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.EventStream.ivfPqIngest(
      input.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, m, 8, wh, "st", ckpt)
    try {
      input.addData(b0.toSeq)
      q.processAllAvailable()
      input.addData(b1.toSeq)
      q.processAllAvailable()
      q.stop()
      val streamed = Similarity.ivfAssigned(spark, wh, "st", "ivfpq")
      assert(streamed.count() === e.count(), "both micro-batches must land")
      val probe = Similarity.ivfPqProbe(
        queries, streamed, "vec_id", "embedding", 5, cents, m)
      Similarity.ivfPqBuild(e, "vec_id", "embedding", 4, m, 8, wh, "full")
      val rebuilt = Similarity.ivfPqProbe(
        queries, Similarity.ivfAssigned(spark, wh, "full", "ivfpq"),
        "vec_id", "embedding", 5, cents, m)
      assert(probe.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(probe).isEmpty,
        "streamed artifact must probe identically to a batch rebuild")
      // a COMMITTED batch replays as a no-op (restart redelivery)
      val b1df = b1.toSeq.toDF("vec_id", "embedding")
      val markers = s"$ckpt/_ingest"
      graft.streaming.EventStream.ivfPqIngestBatch(
        b1df, 1L, "vec_id", "embedding", cents, m, 8, wh, "st",
        markers, "ivfpq", residual = false)
      assert(Similarity.ivfAssigned(spark, wh, "st", "ivfpq").count()
        === e.count(), "replay of a committed batch must not duplicate")
      // a TORN batch: its rows landed but the commit marker did not —
      // replay must anti-join them out, not double them
      val fs = new org.apache.hadoop.fs.Path(wh)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$markers/commit_1"), false)
      fs.create(new org.apache.hadoop.fs.Path(s"$markers/inflight_1"),
        true).close()
      graft.streaming.EventStream.ivfPqIngestBatch(
        b1df, 1L, "vec_id", "embedding", cents, m, 8, wh, "st",
        markers, "ivfpq", residual = false)
      assert(Similarity.ivfAssigned(spark, wh, "st", "ivfpq").count()
        === e.count(), "torn-batch replay must deduplicate, not double")
      assert(fs.exists(new org.apache.hadoop.fs.Path(s"$markers/commit_1")),
        "replay must re-commit the torn batch")
      // markers are CHECKPOINT-scoped: a fresh checkpoint restarts batch
      // ids at 0, and its batch 0 must LAND (artifact-scoped markers
      // would skip it as already-committed - silent data loss)
      val fresh = e.where(col("vec_id") < 8)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
      val preFresh = Similarity.ivfAssigned(spark, wh, "st", "ivfpq").count()
      graft.streaming.EventStream.ivfPqIngestBatch(
        fresh, 0L, "vec_id", "embedding", cents, m, 8, wh, "st",
        s"$ckpt/_ingest2", "ivfpq", residual = false)
      assert(Similarity.ivfAssigned(spark, wh, "st", "ivfpq").count()
        === preFresh + 8,
        "a new checkpoint's batch 0 must land despite old commit_0")
      // drift guard holds on the streaming path too
      val otherModel = Similarity.pqTrain(
        e, "vec_id", "embedding", m = 8, ks = 8, iters = 1)
      val eDrift = intercept[IllegalArgumentException] {
        graft.streaming.EventStream.ivfPqIngestBatch(
          b1df, 9L, "vec_id", "embedding", cents, otherModel, 8, wh, "st",
          markers, "ivfpq", residual = false)
      }
      assert(eDrift.getMessage.contains("IVFADC"))
      // compaction: every ingested batch leaves its own file set, so the
      // artifact accumulates O(batches) files; one bucketed rewrite to a
      // NEW table caps it back at numBuckets, probes bit-identically,
      // and keeps the drift stamp working
      def parquetFiles(dir: String): Int =
        new java.io.File(dir).listFiles()
          .count(_.getName.endsWith(".parquet"))
      (2 to 5).foreach { i =>
        val extra = b1df.select(
          (col("vec_id") + i * 100000L).as("vec_id"), col("embedding"))
        graft.streaming.EventStream.ivfPqIngestBatch(
          extra, i.toLong, "vec_id", "embedding", cents, m, 8, wh, "st",
          markers, "ivfpq", residual = false)
      }
      // marker housekeeping: commit files older than bid−1 are pruned
      // each batch, so a long-running ingest keeps O(1) markers, not one
      // per batch
      val markerFiles = fs.listStatus(
        new org.apache.hadoop.fs.Path(markers)).length
      assert(markerFiles <= 3,
        s"marker dir must stay bounded, found $markerFiles files")
      val probeFull = Similarity.ivfPqProbe(
        queries, Similarity.ivfAssigned(spark, wh, "st", "ivfpq"),
        "vec_id", "embedding", 5, cents, m)
      val before = parquetFiles(s"$wh/st")
      Similarity.ivfPqCompact(spark, wh, "st", "st_c", 8)
      val after = parquetFiles(s"$wh/st_c")
      // O(numBuckets) after, O(batches × buckets) before — the cap is
      // the claim (a task can straddle a bucket boundary, so allow a
      // small constant over numBuckets, never a per-batch term)
      assert(after < before && after <= 2 * 8,
        s"compact must cap files at O(numBuckets): $before -> $after")
      val probeC = Similarity.ivfPqProbe(
        queries, Similarity.ivfAssigned(spark, wh, "st_c", "ivfpq"),
        "vec_id", "embedding", 5, cents, m)
      assert(probeC.exceptAll(probeFull).isEmpty &&
        probeFull.exceptAll(probeC).isEmpty,
        "compacted artifact must probe identically")
      val eCompactDrift = intercept[IllegalArgumentException] {
        Similarity.ivfPqProbe(
          queries, Similarity.ivfAssigned(spark, wh, "st_c", "ivfpq"),
          "vec_id", "embedding", 5, cents, otherModel)
      }
      assert(eCompactDrift.getMessage.contains("IVFADC"))
    } finally {
      if (q.isActive) q.stop()
      Seq("st", "st_c", "full").foreach { t =>
        spark.sql("DROP TABLE IF EXISTS " + graft.sources
          .BucketedSink(8, Seq("_cell"), Nil, "ivfpq").catalogName(wh, t))
      }
      e.unpersist(); ()
    }
  }

  test("ivfPqAppend: O(batch) ingest — probe(build(base) + append(batch)) " +
    "is bit-identical to probe(rebuild(base ∪ batch)) under the same " +
    "models, the probe plan stays shuffle-free, and model drift on the " +
    "append path fails loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    val e = emb.cache()
    // split so the first-k-by-id seeds (both quantizers) live in BASE:
    // then rebuild-over-union derives the same cents the base build did
    val base = e.where(col("vec_id") < 400)
    val batch = e.where(col("vec_id") >= 400)
    val m = model(e) // one model for every arm
    val queries = e.where(col("vec_id") < 8)
    try {
      val cents = Similarity.ivfPqBuild(
        base, "vec_id", "embedding", 4, m, 8, wh, "inc")
      Similarity.ivfPqAppend(
        batch, Similarity.ivfAssigned(spark, wh, "inc", "ivfpq"),
        "vec_id", "embedding", cents, m, 8, wh, "inc")
      val appended = Similarity.ivfAssigned(spark, wh, "inc", "ivfpq")
      assert(appended.count() === e.count(), "append must add batch rows")
      val probe = Similarity.ivfPqProbe(
        queries, appended, "vec_id", "embedding", 5, cents, m)
      val cents2 = Similarity.ivfPqBuild(
        e, "vec_id", "embedding", 4, m, 8, wh, "full")
      assert(cents2 === cents, "seed-in-base split must re-derive cents")
      val rebuilt = Similarity.ivfPqProbe(
        queries, Similarity.ivfAssigned(spark, wh, "full", "ivfpq"),
        "vec_id", "embedding", 5, cents2, m)
      assert(probe.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(probe).isEmpty,
        "appended artifact must probe identically to a rebuild")
      // appended files keep the bucket spec: still no corpus Exchange
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
        s"append must not cost the probe its bucketed join:\n$plan")
      // drift guard on the APPEND path too: a refreshed codebook must
      // not encode its rows into an old-codebook artifact
      val otherModel = Similarity.pqTrain(
        e, "vec_id", "embedding", m = 8, ks = 8, iters = 1)
      val eDrift = intercept[IllegalArgumentException] {
        Similarity.ivfPqAppend(
          batch, Similarity.ivfAssigned(spark, wh, "inc", "ivfpq"),
          "vec_id", "embedding", cents, otherModel, 8, wh, "inc")
      }
      assert(eDrift.getMessage.contains("IVFADC"))
    } finally {
      Seq("inc", "full").foreach { t =>
        spark.sql("DROP TABLE IF EXISTS " + graft.sources
          .BucketedSink(8, Seq("_cell"), Nil, "ivfpq").catalogName(wh, t))
      }
      e.unpersist(); ()
    }
  }
}
