package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the two round-15 TRAINERS (dev-only, like
  * RecallBench): prints one JSON line per measurement backing the
  * SCALE.md trainer-cost entries.
  *
  *  - BPE merge learning: driver arm (one corpus pass + in-process
  *    greedy loop) vs distributed arm (one adjacent-pair groupBy +
  *    single-row argmax + map-side fold PER ROUND) at the same
  *    numMerges — quantifying the rounds×shuffle overhead the
  *    distributed arm pays for not collecting the vocab table, and
  *    asserting the two arms learn identical tables on the real corpus.
  *  - k-means: full-corpus Lloyd vs [[graft.ops.Similarity.kmeansFitSampled]]
  *    at frac, with cell-assignment agreement and inertia delta of the
  *    sample-trained model measured over the FULL corpus.
  *
  * Usage: runMain graft.TrainBench <sfDir> [numMerges] [frac]
  */
object TrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = if (args.length > 1) args(1).toInt else 32
    val frac = if (args.length > 2) args(2).toDouble else 0.1
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

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    val nDocs = docs.count()

    // --- BPE: driver arm vs distributed arm, identical outputs ---
    val (vocabSize, tWc) = timed(
      graft.ops.BpeTrain.wordCounts(docs, "text").count())
    val (driverMerges, tDriver) = timed(
      graft.ops.BpeTrain.train(docs, "text", numMerges, minPairFreq = 2))
    val (distMerges, tDist) = timed(
      graft.ops.BpeTrain.trainDistributed(docs, "text", numMerges,
        minPairFreq = 2, checkpointEvery = 8))
    require(driverMerges == distMerges,
      s"trainer arms disagree: ${driverMerges.take(5)} vs ${distMerges.take(5)}")
    println(s"""{"bench":"bpe_train","sf":"$sfDir","n_docs":$nDocs,"vocab":$vocabSize,"num_merges":${driverMerges.length},"wordcount_sec":${f3(tWc)},"driver_sec":${f3(tDriver)},"distributed_sec":${f3(tDist)},"per_round_sec":${f3(tDist / math.max(1, driverMerges.length))},"arms_equal":true}""")

    // --- k-means: full vs hash-sampled trainer on the embeddings ---
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val nVecs = emb.count()
    val k = math.ceil(math.sqrt(nVecs.toDouble)).toInt
    val (full, tFull) = timed(
      graft.ops.Similarity.kmeansFit(emb, "vec_id", "embedding", k, 4))
    val (sampled, tSampled) = timed(
      graft.ops.Similarity.kmeansFitSampled(emb, "vec_id", "embedding",
        k, 4, frac))
    val assignFull = graft.ops.Similarity
      .withCell(emb, "vec_id", "embedding", full)
      .select(col("vec_id").cast("long"), col("_cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    val assignSampled = graft.ops.Similarity
      .withCell(emb, "vec_id", "embedding", sampled)
      .select(col("vec_id").cast("long"), col("_cell").cast("long"))
      .as[(Long, Long)].collect().toMap
    // label-free agreement: fraction of PAIRS (sampled via hash) whose
    // same-cell/different-cell relation matches between the two models
    // would be O(n²); instead use the standard proxy — per-cell purity:
    // each sampled-model cell maps to its majority full-model cell
    val purity = {
      val byCell = assignSampled.toSeq.groupBy(_._2)
      val agree = byCell.values.map { members =>
        members.groupBy(m => assignFull(m._1)).values.map(_.size).max
      }.sum
      agree.toDouble / nVecs
    }
    val iFull = graft.ops.Similarity.inertia(emb, "vec_id", "embedding", full)
    val iSampled = graft.ops.Similarity.inertia(emb, "vec_id", "embedding", sampled)
    println(s"""{"bench":"kmeans_sampled","sf":"$sfDir","n_vecs":$nVecs,"k":$k,"frac":$frac,"full_sec":${f3(tFull)},"sampled_sec":${f3(tSampled)},"purity_vs_full":${f3(purity)},"inertia_full":${f3(iFull)},"inertia_sampled":${f3(iSampled)}}""")
    spark.stop()
  }
}
