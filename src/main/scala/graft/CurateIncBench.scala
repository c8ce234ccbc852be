package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Text}

/** Measures the daily-ingest fold's defining scale claim: per-batch cost
  * must track the BATCH, not the accumulated store — every store probe
  * streams one scan against a broadcast batch-side, so batch k of K
  * costs ~the same as batch 1 even though the digest/band/label stores
  * have grown k×. A fold whose batches get monotonically slower is
  * paying a store shuffle somewhere.
  *
  * Protocol: corpus = documents with doc_id >= 50 split into K equal
  * hash batches, benchmark = doc_id < 50 (the graded row's convention);
  * each batch is folded through [[Curation.curateIncremental]] and its
  * output forced through the noop sink; per-batch wall seconds and
  * admitted counts print per fold. Run across the suffix_stop scale
  * corpora (sf0.1 → sf1s → sf10s — the stopword-preserving mutation,
  * SCALE.md round 13) for the cross-decade slope.
  *
  * Usage: sbt "runMain graft.CurateIncBench <sfDir> [K] [mode]"
  *   mode = session (default — in-session stores, the graded row's
  *   shape) | persisted (parquet stores via curateFoldBatch — the
  *   production path) | persisted:<n> (same with the n-shard label
  *   store — the at-scale label arm)
  */
object CurateIncBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 4
    val mode = if (args.length > 2) args(2) else "session"
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

    val docs = Tables(spark, sfDir, "documents")
    val corpus = docs.where(col("doc_id") >= 50)
    val n = corpus.count()
    val ws = Text.winnowStore(docs.where(col("doc_id") < 50), "doc_id", "text")
    println(s"CURINC corpus=$n docs, K=$k batches, dir=$sfDir")

    var total = 0.0
    if (mode == "session") {
      var stores = Curation.CurationStores.empty(spark, "source")
      (0 until k).foreach { i =>
        val batch = corpus.where(pmod(col("doc_id"), lit(k)) === i)
        val t0 = System.nanoTime()
        val (out, st2) = Curation.curateIncremental(
          batch, ws, "doc_id", "text", "source", stores,
          metricsTag = s"curincb_$i")
        out.write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        val admitted = out.count()
        stores = st2
        println(f"CURINC batch $i: $sec%.2f s admitted=$admitted " +
          f"(store now ~${(i + 1).toDouble / k * 100}%.0f%% of corpus)")
      }
    } else {
      // persisted[:shards] — the production fold: parquet stores under a
      // temp root, every store round-trips disk per batch
      val shards = mode.split(":").lift(1).map(_.toInt)
      val root = java.nio.file.Files
        .createTempDirectory("graft_curincb").toString
      println(s"CURINC persisted mode, root=$root shardedLabels=$shards")
      (0 until k).foreach { i =>
        val batch = corpus.where(pmod(col("doc_id"), lit(k)) === i)
        val t0 = System.nanoTime()
        graft.streaming.EventStream.curateFoldBatch(
          batch, ws, root, "doc_id", "text", "source",
          shardedLabels = shards)
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"CURINC batch $i: $sec%.2f s " +
          f"(store now ~${(i + 1).toDouble / k * 100}%.0f%% of corpus)")
      }
      val admitted = spark.read.parquet(s"$root/out").count()
      println(s"CURINC persisted admitted total: $admitted")
    }
    println(f"CURINC total: $total%.2f s over $k batches, $n docs " +
      f"(${total * 1e3 / n}%.2f ms/doc)")
    spark.stop()
  }
}
