package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scale evidence for the streaming cluster-maintenance path (SCALE.md:
  * the one operator family whose at-scale behavior was spec-sized only
  * through round 7). Measures, per micro-batch of REAL near-dup edges
  * (minhash candidate pairs over the given corpus), the wall time of the
  * full `foreachBatch` fold — recovery check, store read, incremental CC
  * merge, `._next` write, recoverable swap — and the store size after
  * each batch. Two legs:
  *
  *  - **empty-start**: store bootstraps empty and grows with the edges
  *    seen, the spec-sized shape at corpus scale;
  *  - **bootstrapped**: the store starts at CORPUS size (every doc id
  *    labeled, from `Dedup.exactGroups` components) and the same edge
  *    batches fold into it — the production regime, where the design
  *    claim (O(batch + touched components) merge work; the store is
  *    relabeled in ONE map-side pass and rewritten, never re-clustered)
  *    predicts per-batch time = flat merge term + O(|store|) write term,
  *    NOT growth in batch count or accumulated edges.
  *
  * Usage: sbt "runMain graft.StreamScaleBench [sfDir] [numBatches]"
  */
object StreamScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val numBatches = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // section = cc (default, the cluster-maintenance legs) | ivfpq (the
    // streaming IVFADC ingest + compact leg over the embeddings table) |
    // curate (the curateStream label-store regimes, flat vs sharded)
    val section = if (args.length > 2) args(2) else "cc"
    if (section == "ivfpq") {
      ivfPqLeg(spark, sfDir, numBatches, cpus.toInt)
      spark.stop(); return
    }
    if (section == "curate") {
      curateLeg(spark, sfDir, math.max(4, numBatches))
      spark.stop(); return
    }

    val docs = Tables(spark, sfDir, "documents")
    val nDocs = docs.count()
    // the real edge feed: the same pairs the batch dedup operator emits
    val edges = ops.Dedup
      .minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect()
    println(s"STREAMSCALE corpus=$nDocs docs, edges=${edges.length} " +
      s"minhash candidate pairs, batches=$numBatches")
    // deterministic round-robin split — every batch carries both fresh
    // components and bridges into earlier ones
    val batches = (0 until numBatches).map(b =>
      edges.zipWithIndex.collect { case (e, i) if i % numBatches == b => e })

    /** Corpus-sized bootstrap labeling: every doc id labeled with its
      * exact-dup component (min doc_id per text digest). ONE definition
      * for the flat and sharded legs — the two must measure the same
      * store or the comparison is meaningless. */
    def bootstrapLabels() = {
      val d = docs.select(col("doc_id"),
        md5(col("text").cast("binary")).as("digest"))
      d.join(d.groupBy("digest").agg(min("doc_id").as("component")),
          Seq("digest"))
        .select(col("doc_id").as("id"), col("component"))
    }

    def leg(name: String, bootstrap: Boolean): Unit = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_streamscale_$name").toString
      val store = s"$base/labels"
      if (bootstrap) bootstrapLabels().write.parquet(store)
      val input = MemoryStream[streaming.EventStream.CandPair]
      val q = streaming.EventStream.clusterMaintenance(
        input.toDF(), store, s"$base/ckpt")
      try {
        batches.zipWithIndex.foreach { case (b, i) =>
          input.addData(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(b.map(e =>
              streaming.EventStream.CandPair(e._1, e._2))): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          val storeRows = spark.read.parquet(store).count()
          println(f"STREAMSCALE $name batch=$i edges=${b.length} " +
            f"fold=$sec%.2f s store_rows=$storeRows")
        }
      } finally q.stop()
    }

    /** The round-9 leg: the SHARDED store (component-keyed shards,
      * two-phase swap) under the same corpus-sized bootstrap and the
      * same edge feed. The design claim is that per-batch cost drops
      * the O(|store|) rewrite term: only shards whose components the
      * batch touches are rewritten (reported per batch via shard-dir
      * modification times), the rest stay byte-identical.
      */
    def shardedLeg(name: String, numShards: Int,
        legBatches: Seq[Array[(Long, Long)]]): Unit = {
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_streamscale_$name").toString
      val store = s"$base/labels"
      streaming.EventStream.shardLabelStore(bootstrapLabels(), store, numShards)
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // (mtime, bytes) per shard: mtime flips when the swap replaces the
      // dir; bytes rewritten vs total is the SCALE-TRANSFERABLE number —
      // at a fixed target shard size the rewrite cost is
      // touched × shard_size ≈ batch component footprint, independent of
      // how large the store grows
      def stat(): Map[Int, (Long, Long)] = (0 until numShards).map { k =>
        val p = new org.apache.hadoop.fs.Path(
          streaming.EventStream.shardDir(store, k))
        k -> (if (fs.exists(p))
          (fs.getFileStatus(p).getModificationTime,
            fs.getContentSummary(p).getLength)
        else (-1L, 0L))
      }.toMap
      val input = MemoryStream[streaming.EventStream.CandPair]
      val q = streaming.EventStream.clusterMaintenanceSharded(
        input.toDF(), store, s"$base/ckpt", numShards)
      try {
        legBatches.zipWithIndex.foreach { case (b, i) =>
          val before = stat()
          input.addData(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(b.map(e =>
              streaming.EventStream.CandPair(e._1, e._2))): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          val after = stat()
          val rewritten = after.count { case (k, s) => before(k)._1 != s._1 }
          val rewrittenBytes = after.collect {
            case (k, s) if before(k)._1 != s._1 => s._2 }.sum
          val totalBytes = after.values.map(_._2).sum
          val rows = streaming.EventStream
            .readShardedStore(spark, store).count()
          println(f"STREAMSCALE $name batch=$i " +
            f"edges=${b.length} fold=$sec%.2f s store_rows=$rows " +
            f"rewritten_shards=$rewritten/$numShards " +
            f"rewritten_bytes=${100.0 * rewrittenBytes / totalBytes}%.0f%%")
        }
      } finally q.stop()
    }

    leg("empty-start", bootstrap = false)
    leg("bootstrapped", bootstrap = true)
    // same feed as the flat legs: at ~925 edges/batch the component
    // footprint covers every shard, so sharding can only TIE on bytes —
    // this leg pins that the overhead vs the flat store stays small
    shardedLeg("sharded-bootstrapped", 16, batches)
    // the regime sharding exists for: a TRICKLE of edges into the
    // corpus-sized store (the steady state of cluster maintenance once
    // the backlog is drained) — batch footprint ≪ shard count, so most
    // of the store is never rewritten
    // ~20 edges/batch against 256 shards: footprint ≈ 30 components →
    // most shards untouched, rewrite bytes ∝ batch, not store. The
    // stride self-calibrates to the corpus's edge count (a fixed stride
    // would silently produce empty batches past it, or off-target batch
    // sizes on other SFs).
    val trickleStride = math.max(numBatches, edges.length / 20)
    val trickleBatches = (0 until numBatches).map(b =>
      edges.zipWithIndex.collect {
        case (e, i) if i % trickleStride == b => e })
    shardedLeg("sharded-trickle", 256, trickleBatches)
    // the SELECTOR-CHOSEN second operating point on the same trickle
    // feed. Two legs, one per constraint:
    //  - size-only (batchComponents = 0): a fixture-scaled 64 KiB target
    //    picks ~7 shards — the MEASURED failure mode the footprint term
    //    exists for (a ~35-component batch touches every one of 7
    //    shards → 100% bytes/batch, worse than 256 shards' 14-17%);
    //  - footprint-aware: C ≈ 2× edges/batch at the default 0.15
    //    rewrite fraction picks the couple-hundred-shard regime and the
    //    rewrite percentage should land at ≤ ~15%.
    val probeDir = java.nio.file.Files
      .createTempDirectory("graft_streamscale_probe").toString
    bootstrapLabels().write.parquet(s"$probeDir/labels")
    val storeBytes = new org.apache.hadoop.fs.Path(s"$probeDir/labels")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(s"$probeDir/labels"))
      .getLength
    val sizeOnly = streaming.EventStream.shardsFor(
      storeBytes, targetShardBytes = 64L << 10)
    println(s"STREAMSCALE shardsFor(storeBytes=$storeBytes, target=64KiB, " +
      s"C=0) = $sizeOnly shards (size-only: the measured failure mode)")
    shardedLeg(s"sharded-trickle-sizeonly$sizeOnly", sizeOnly, trickleBatches)
    val batchC = 2L * trickleBatches.headOption.map(_.length.toLong).getOrElse(20L)
    val selShards = streaming.EventStream.shardsFor(
      storeBytes, targetShardBytes = 64L << 10, batchComponents = batchC)
    println(s"STREAMSCALE shardsFor(storeBytes=$storeBytes, target=64KiB, " +
      s"C=$batchC) = $selShards shards (footprint-aware)")
    shardedLeg(s"sharded-trickle-sel$selShards", selShards, trickleBatches)
    spark.stop()
  }

  /** The curateStream label-store regimes: the FULL streaming curation
    * fold (exact/minhash/CC dedup, winnow decontamination, ppl banding,
    * caps) over the corpus — one bootstrap batch, then `numBatches`
    * trickle batches of ~20 docs, the steady state of a daily ingest
    * once the backlog is drained. Measures per batch the fold wall time
    * and the LABEL-STORE bytes written:
    *
    *  - **flat** (`shardedLabels = None`): the documented
    *    O(store)-per-batch soft spot — every fold rewrites the whole
    *    `labels/v=<n>` dir whatever the batch size;
    *  - **sharded** (`shardedLabels = Some(256)`): the batch's label
    *    edges land as an O(batch) `edges/b=<n>` log inside the commit
    *    and the post-commit catch-up rewrites only the shards whose
    *    components the batch touched — rewrite bytes ∝ batch footprint,
    *    not store size (the [[graft.streaming.EventStream.shardLabelStore]]
    *    trade, here measured on the COMPOSITE rather than the
    *    cluster-maintenance operator).
    */
  private def curateLeg(
      spark: SparkSession, sfDir: String, trickleBatches: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables(spark, sfDir, "documents")
    val ws = graft.ops.Text.winnowStore(
      docs.where(col("doc_id") < 50), "doc_id", "text")
    val corpus = docs.where(col("doc_id") >= 50)
      .select("doc_id", "text", "source")
      .as[(Long, String, String)].collect()
    val trickleSize = 20
    val bootstrap = corpus.dropRight(trickleBatches * trickleSize)
    val trickles = (0 until trickleBatches).map { b =>
      corpus.takeRight(trickleBatches * trickleSize)
        .slice(b * trickleSize, (b + 1) * trickleSize)
    }
    println(s"STREAMSCALE curate corpus=${corpus.length} docs " +
      s"bootstrap=${bootstrap.length} + $trickleBatches × $trickleSize trickle")

    def leg(name: String, sharded: Option[Int]): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_curstream_$name").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_curstream_ck_$name").toString
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def bytesOf(d: String): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$root/$d")
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }
      // (mtime, bytes) per shard — a flipped mtime marks a swap rewrite
      def shardStat(): Map[Int, (Long, Long)] = sharded match {
        case None => Map.empty
        case Some(n) => (0 until n).map { k =>
          val p = new org.apache.hadoop.fs.Path(graft.streaming.EventStream
            .shardDir(s"$root/labels_sharded", k))
          k -> (if (fs.exists(p))
            (fs.getFileStatus(p).getModificationTime,
              fs.getContentSummary(p).getLength)
          else (-1L, 0L))
        }.toMap
      }
      val input = MemoryStream[(Long, String, String)]
      val q = graft.streaming.EventStream.curateStream(
        input.toDS().toDF("doc_id", "text", "source"), ws, root, ckpt,
        shardedLabels = sharded)
      try {
        (bootstrap +: trickles).zipWithIndex.foreach { case (b, i) =>
          val before = shardStat()
          input.addData(scala.collection.immutable.ArraySeq
            .unsafeWrapArray(b): _*)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val sec = (System.nanoTime() - t0) / 1e9
          val (written, total) = sharded match {
            case None =>
              // versioned arm: the whole labels/v=<n> dir is this
              // batch's write (prior versions are pruned at commit)
              val lb = bytesOf("labels"); (lb, lb)
            case Some(_) =>
              val after = shardStat()
              (after.collect {
                case (k, s) if before(k)._1 != s._1 => s._2 }.sum,
                after.values.map(_._2).sum)
          }
          val pct = if (total == 0) 0.0 else 100.0 * written / total
          println(f"STREAMSCALE curate-$name batch=$i docs=${b.length} " +
            f"fold=$sec%.2f s label_bytes_written=$written " +
            f"($pct%.0f%% of store)")
        }
      } finally q.stop()
    }

    leg("labels-flat", None)
    leg("labels-sharded256", Some(256))
  }

  /** Streaming IVFADC ingest leg: the embeddings corpus streams in
    * `numBatches` micro-batches through `EventStream.ivfPqIngest`
    * (models pre-trained on the full corpus — the ingest contract),
    * measuring per batch the fold wall time, artifact rows, file count,
    * and artifact bytes. Then: probe latency on the appended artifact,
    * one `ivfPqCompact`, file count and probe latency after — the
    * numbers behind SCALE.md's "append-forever costs files, not bytes;
    * compaction caps them at O(numBuckets)".
    */
  private def ivfPqLeg(
      spark: SparkSession, sfDir: String, numBatches: Int,
      cpus: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables(spark, sfDir, "embeddings").repartition(cpus).cache()
    val n = emb.count()
    val kc = math.max(4, math.sqrt(n.toDouble).toInt)
    val cents = ops.Similarity.seedCentroidsFor(emb, "vec_id", "embedding", kc)
    val model = ops.Similarity.pqTrain(emb, "vec_id", "embedding", 8, 16, 1)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    println(s"STREAMSCALE ivfpq corpus=$n vecs cells=$kc " +
      s"buckets=32 batches=$numBatches")
    val base = java.nio.file.Files
      .createTempDirectory("graft_streamscale_ivfpq").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(t: String): Int = {
      val d = new java.io.File(s"$base/$t")
      if (d.exists()) d.listFiles().count(_.getName.endsWith(".parquet"))
      else 0
    }
    def bytes(t: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$base/$t")
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    val input = MemoryStream[(Long, Seq[Float])]
    val q = streaming.EventStream.ivfPqIngest(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, model, 32, base, "ing", s"$base/ckpt")
    try {
      (0 until numBatches).foreach { b =>
        val batch = rows.zipWithIndex.collect {
          case (r, i) if i % numBatches == b => r }
        input.addData(batch.toSeq)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"STREAMSCALE ivfpq batch=$b vecs=${batch.length} " +
          f"fold=$sec%.2f s files=${files("ing")} " +
          f"artifact_bytes=${bytes("ing")}")
      }
    } finally q.stop()
    val queries = emb.where(col("vec_id") < 64)
    def timeProbe(table: String): Double = {
      val t0 = System.nanoTime()
      ops.Similarity.ivfPqProbe(
        queries, ops.Similarity.ivfAssigned(spark, base, table, "ivfpq"),
        "vec_id", "embedding", 10, cents, model)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"STREAMSCALE ivfpq probe(appended): ${timeProbe("ing")}%.2f s " +
      f"files=${files("ing")}")
    val t0 = System.nanoTime()
    ops.Similarity.ivfPqCompact(spark, base, "ing", "ing_c", 32)
    println(f"STREAMSCALE ivfpq compact: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"files ${files("ing")} -> ${files("ing_c")} " +
      f"bytes ${bytes("ing")} -> ${bytes("ing_c")}")
    println(f"STREAMSCALE ivfpq probe(compacted): ${timeProbe("ing_c")}%.2f s")
    ()
  }
}
