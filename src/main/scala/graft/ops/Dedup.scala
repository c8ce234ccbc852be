package graft.ops

import graft.Materialize
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline.
  *
  * Hash choice: md5 hex strings (not Spark's murmur `hash()`), because md5 is
  * engine-portable — the DuckDB oracle computes bit-identical values, and on
  * a real cluster md5 stays stable across Spark versions/JVMs. Minhash over a
  * shingle set = lexicographic MIN of seeded md5s, which every engine agrees
  * on.
  *
  * Scale notes: exact dedup is one hash-shuffle on the digest (map-side
  * partial agg applies). MinHash-LSH materializes (doc × bands) rows — bands
  * is a small constant — then self-joins on the band key; the join input is
  * pre-bucketed by the band hash so the shuffle is one pass over the corpus,
  * never O(n²). Candidate pairs only; verification (exact Jaccard) runs on
  * the candidate set.
  */
object Dedup {

  /** Exact duplicate groups by content digest: one row per distinct digest
    * with the group size and the deterministic keeper (min id).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(md5(col(textCol).cast("binary")).as("digest"), col(idCol).as("_id"))
      .groupBy("digest")
      .agg(count(lit(1)).as("n_docs"), min(col("_id")).as("keeper_id"))

  /** Portable minhash signature: for each seed, min over shingles of
    * md5(seed || ':' || shingle). Returns ArrayType(String) of length
    * `numHashes`. Delegates to the native one-pass `minhash_sig` codegen
    * expression (graft.functions.MinHashSig, registered by
    * GraftExtensions) — bit-identical to [[minhashSignatureBuiltin]]
    * (equivalence property-checked in MinHashSigSpec) but without the
    * numHashes × |shingles| digest/hex/array allocations.
    * Sessions built WITHOUT GraftExtensions fail analysis here with
    * UNRESOLVED_ROUTINE — retrofit with `GraftExtensions.register(spark)`,
    * or use [[minhashSignatureBuiltin]] (same bits, slower).
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    call_function("minhash_sig", shingleArr, lit(numHashes))

  /** The pure-builtin composition of [[minhashSignature]] — the reference
    * rendering of the signature definition (and the shape the DuckDB
    * oracles replicate). Kept as the equivalence-check twin for the native
    * expression.
    */
  def minhashSignatureBuiltin(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleArr,
        s => md5(concat(lit(s"$seed:"), s).cast("binary"))))
    }: _*)

  /** Rows-per-band pick for a target Jaccard threshold given a signature
    * budget: the LSH S-curve puts the collision knee at
    * t ≈ (1/b)^(1/r) with b = numHashes/r bands — choose the divisor r of
    * numHashes whose knee lands closest to the requested threshold. The
    * shipped defaults (numHashes=8, r=2 → b=4, knee (1/4)^(1/2) = 0.5)
    * are exactly this pick for the 0.5 default threshold; at corpus scale
    * raise numHashes (e.g. 128) and re-derive r so candidate volume
    * tracks the threshold instead of the testdata setting — the minhash
    * twin of [[graft.ops.Similarity.numPlanesFor]].
    */
  def rowsPerBandFor(threshold: Double, numHashes: Int = 8): Int = {
    require(threshold > 0 && threshold < 1, "threshold in (0,1)")
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    divisors.minBy { r =>
      val knee = math.pow(1.0 / (numHashes / r), 1.0 / r)
      math.abs(knee - threshold)
    }
  }

  /** MinHash + LSH banding: candidate near-duplicate pairs.
    *
    * numHashes minhashes split into bands of `rowsPerBand`; docs sharing any
    * full band collide. Output: distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashCandidatePairsFromShingles(
      shingleFrame(docs, idCol, textCol, shingleSize),
      numHashes, rowsPerBand)

  /** The `(_id, _sh)` shingle frame every minhash-family operator builds
    * from raw text — ONE definition so every path carries the same two
    * disciplines:
    *  - the EMPTY-DOC guard: a token-less doc (empty/whitespace/NULL
    *    text) shingles to [""], ONE shared value — so at corpus scale
    *    every such doc lands in the same band bucket and the pair
    *    self-join fans out O(k²) rows from that bucket alone (1M empty
    *    docs ⇒ ~5·10¹¹ candidate pairs, all "verified" at Jaccard 1.0).
    *    An empty doc is never a meaningful near-dup; it is dropped
    *    before banding, the same guard the simhash path applies.
    *  - no array_distinct: min-over-shingles is unaffected by
    *    duplicates, and Spark's array_distinct on string arrays is
    *    O(n²) per row.
    *  - spread: the signature compute is per-row-dense — never let it
    *    inherit a byte-starved scan split count (Text.spread doc).
    */
  private def shingleFrame(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    Text.spread(docs)
      .select(col(idCol).as("_id"), Text.tokens(col(textCol)).as("_ts"))
      .where(size(col("_ts")) > 0)
      .select(col("_id"),
        Text.shinglesOfTokens(col("_ts"), shingleSize).as("_sh"))

  /** Candidate pairs from a pre-shingled `(_id, _sh: array<string>)` frame —
    * lets pipelines that also need the shingles (exact-Jaccard verify)
    * compute the tokenize+shingle pass exactly once.
    */
  def minhashCandidatePairsFromShingles(
      shingled: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val banded = bandTable(shingled, numHashes, rowsPerBand)
    // Pair generation is a distributed band self-join, NOT a per-bucket
    // collect_set+explode: a collect concentrates a degenerate bucket's
    // whole membership array and its O(k²) pair fan-out in ONE task — the
    // exact hot-bucket failure a boilerplate-heavy band key hits at 100 TB.
    // The join spreads each bucket's pair space across the cluster
    // (same shape as simhashNearDupPairs / cosineNearDupPairs, where the
    // collect variant measured 10× data → ~20× time).
    val a = banded.select(col("_bno"), col("_bkey"), col("_id").as("id_a"))
    val b = banded.select(col("_bno"), col("_bkey"), col("_id").as("id_b"))
    a.join(b, Seq("_bno", "_bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** One (band, key) struct per band from a minhash signature — the ONE
    * definition of the LSH band key, shared by [[bandTable]] and the
    * streaming `minhashCandidateStream`: the streaming state-store keys
    * and the persisted batch band table must be the same expression or
    * incremental candidates silently miss pairs.
    */
  private[graft] def bandExplode(
      sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    // integer division would silently DISCARD the trailing hashes (8/3 →
    // 2 bands over positions 1..6), shifting the S-curve knee away from
    // what rowsPerBandFor predicts for the passed parameters — the
    // simhash blocked variant guards the same invariant
    require(numHashes % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide numHashes=$numHashes — " +
        "trailing hashes would be silently discarded and the banding " +
        "S-curve would not match rowsPerBandFor's prediction")
    val numBands = numHashes / rowsPerBand
    explode(array((0 until numBands).map { b =>
      struct(lit(b).as("bno"),
        concat_ws("|", slice(sig, b * rowsPerBand + 1, rowsPerBand))
          .as("bkey"))
    }: _*))
  }

  /** The LSH band table of a pre-shingled frame: `(_id, _bno, _bkey)`, one
    * row per (doc, band), eagerly materialized. This is both the internal
    * input to pair generation and the PERSISTENT artifact of incremental
    * dedup: store it (parquet, partitioned by `_bno`) and each new ingest
    * batch joins its own bands against the store instead of re-banding the
    * corpus.
    */
  def bandTable(
      shingled: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 2,
      shingleSize: Int = 0): DataFrame = {
    // Staged projections so each expensive array is computed exactly once
    // per row (CollapseProject keeps multiply-referenced non-cheap aliases
    // in their own stage); a single inline expression would re-derive the
    // tokenization once per seed.
    shingled
      .select(col("_id"), minhashSignature(col("_sh"), numHashes).as("_sig"))
      .select(col("_id"), bandExplode(col("_sig"), numHashes, rowsPerBand).as("_band"))
      .select(col("_id"), col("_band.bno").as("_bno"), col("_band.bkey").as("_bkey"))
      // Materialized once so consumers (self-join sides, store writes)
      // don't recompute the signatures (the dominant cost).
      .transform(Materialize.checkpoint)
      // self-describing store: a persisted band table carries the
      // parameters that shaped its key space, so an incremental probe
      // built with different parameters fails loudly (see
      // [[requireStoreParams]]) instead of silently joining into a
      // foreign keyspace and reporting zero duplicates. Stamped AFTER
      // the checkpoint: the materialized in-session frame stays lean
      // (a per-row string on numBands × |docs| rows is real memory at
      // corpus scale), the column is a constant projection that only
      // costs anything when a caller writes the store to parquet —
      // where dictionary encoding makes it free. shingleSize extends
      // the params hierarchically when the caller provides it (the
      // shingle width shapes the key space just as much as h/r).
      .withColumn("_params", lit(bandParams(numHashes, rowsPerBand, shingleSize)))
  }

  private[ops] def bandParams(
      numHashes: Int, rowsPerBand: Int, shingleSize: Int): String =
    s"mh:h$numHashes:r$rowsPerBand" +
      (if (shingleSize > 0) s":sh$shingleSize" else "")

  /** Persisted-artifact parameter guard — the [[bandTable]]/
    * [[Similarity.srpTable]] analog of the sharded store's `_layout`
    * marker: if the store carries a `_params` column, its value must be
    * COMPATIBLE with what THIS probe derives, else the key spaces
    * cannot match and every candidate silently vanishes (the worst
    * dedup failure: "no duplicates found" on a store that answers a
    * different question). Compatibility is hierarchical: params are
    * ':'-separated from coarse to fine, and a value that extends the
    * other at a boundary matches it (a store stamped "mh:h8:r2" before
    * shingle tagging accepts a probe deriving "mh:h8:r2:sh3" — the
    * recorded axes agree; the unrecorded one stays the caller's
    * contract). Pre-column stores and null-params rows (mergeSchema
    * legacy mixes) are tolerated. The check samples ONE non-null row —
    * sound under the documented single-writer lifecycle where every
    * appended ingest was itself probe-guarded before the append; a
    * store corrupted by unguarded mixed-parameter appends is beyond a
    * sample's reach. Verdicts are memoized so a per-micro-batch probe
    * pays the sampling job once per run, not per batch — but the memo
    * key must be CONTENT-derived, not plan-derived: a store REBUILT at
    * the same path with different parameters yields the same logical
    * plan (same path, same schema), and a plan-keyed PASS would
    * suppress exactly the loud drift error this guard exists for. The
    * key is therefore the store's input-file listing (a rebuild writes
    * new part files, so the listing changes even at a fixed path); a
    * frame with no file inputs (in-memory test frames, exotic sources)
    * skips memoization and re-samples each call — those are never the
    * per-micro-batch path the memo exists for. The memo is cleared when
    * it exceeds [[MemoCap]] entries: a long-lived driver probing many
    * store generations must not grow it without bound (re-priming after
    * a clear costs one limit(1) job per live store).
    */
  private val MemoCap = 1024
  private val storeParamsChecked =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Unit]

  /** Content-derived memo key: hash of the frame's input files, or None
    * when the frame has no file inputs (→ caller must not memoize).
    * `inputFiles` is a driver-side listing already resolved by the
    * relation — no Spark job.
    */
  private def storeContentKey(store: DataFrame): Option[Int] = {
    val files = store.inputFiles
    if (files.isEmpty) None
    else Some(java.util.Arrays.hashCode(files.asInstanceOf[Array[AnyRef]]))
  }

  private def paramsCompatible(got: String, want: String): Boolean =
    got == want || got.startsWith(want + ":") || want.startsWith(got + ":")

  private[ops] def requireStoreParams(
      store: DataFrame, want: String, what: String): Unit =
    if (store.columns.contains("_params")) {
      val key = storeContentKey(store).map((_, want))
      if (key.forall(k => !storeParamsChecked.contains(k))) {
        store.select(col("_params")).where(col("_params").isNotNull)
          .limit(1).collect().headOption
          .map(_.getString(0)).filterNot(paramsCompatible(_, want))
          .foreach { got =>
            throw new IllegalArgumentException(
              s"$what store was built with '$got' but this probe derives " +
                s"'$want' — the key spaces cannot match (silent candidate " +
                "loss); rebuild the store or pass its parameters")
          }
        key.foreach { k =>
          if (storeParamsChecked.size >= MemoCap) storeParamsChecked.clear()
          storeParamsChecked.put(k, ())
        }
      }
    }

  // ------------------------------------------------------ incremental dedup

  /** Incremental exact dedup: the survivors of a NEW ingest batch against
    * an already-deduplicated corpus represented by its digest store (a
    * `digest` column). In-batch duplicate groups resolve to the min id;
    * groups whose digest the corpus has already seen are dropped. Output:
    * `(keeper_id, digest)` — union the digests back into the store to
    * complete the ingest.
    *
    * Scale shape: one digest shuffle over the BATCH, then the store is
    * probed by a BROADCAST semi-join of the batch's digest set — the
    * store STREAMS one pruned scan (digest column only) with ZERO
    * shuffle, and only its batch-matching rows (≤ |batch|) reach the
    * anti-join, which then broadcasts too. The previous one-join shape
    * planned a sort-merge anti-join that re-shuffled the WHOLE store on
    * every ingest batch — at a 10¹⁰-digest store that exchange (300+ GB)
    * was the entire cost of a daily ingest. Size-dispatched via
    * [[graft.ops.Joins.broadcastIfSmall]]: an over-broadcast-sized
    * backfill batch degrades to the old shuffle join instead of OOMing
    * the executors.
    */
  def exactIncremental(
      newDocs: DataFrame, idCol: String, textCol: String,
      seenDigests: DataFrame): DataFrame = {
    // materialized: the group frame feeds the probe side AND the final
    // anti-join (uncached, the batch digest shuffle would run twice)
    // counted checkpoint: the count IS the forcing action (one job, not
    // an eager checkpoint plus a second count job per ingest batch)
    val (groups, nGroups) =
      Materialize.checkpointCounted(exactGroups(newDocs, idCol, textCol))
    // null-SAFE joins throughout: md5(NULL text) is a null digest, and
    // plain equality never matches null against null — the null-text
    // group would re-enter the corpus once per ingest batch forever
    // (while collapsing correctly WITHIN each batch)
    // digest probe dispatch is fully static (fixed-width rows, count
    // from the counted checkpoint) — no sampling job on the batch path
    val digestRowBytes = 120L // 32-hex UTF8String + row overhead
    val digestProbe = groups.select(col("digest"))
    val hits = seenDigests.select(col("digest").as("_seen"))
      .join(
        if (graft.ops.Joins.fitsBroadcast(
            newDocs.sparkSession, nGroups, digestRowBytes))
          broadcast(digestProbe)
        else digestProbe,
        col("_seen") <=> col("digest"), "left_semi")
    // `hits` is ≤ |batch groups| by construction (semi-join of the store
    // against the batch digest set), so it must carry a broadcast hint
    // too: unhinted, the anti-join planned sort-merge and re-shuffled
    // the batch. Dispatch WITHOUT sampling on the normal path (digest
    // rows are fixed-width, so the gates need no job — sampling the live
    // `hits` would re-run the store scan a second time, and checkpointing
    // it would hide the store probe from the final plan); the DEGRADED
    // path (an over-broadcast backfill batch) materializes `hits` once
    // and samples its TRUE size — store∩batch is usually tiny even when
    // the batch is huge, so the backfill stays at one store shuffle
    // instead of adding a second batch-sized exchange.
    val hinted =
      if (graft.ops.Joins.fitsBroadcast(
          newDocs.sparkSession, nGroups, digestRowBytes))
        broadcast(hits)
      else graft.ops.Joins.broadcastIfSmall(
        Materialize.checkpoint(hits), Some(nGroups))
    groups
      .join(hinted, col("digest") <=> col("_seen"), "left_anti")
      .select(col("keeper_id"), col("digest"))
  }

  /** Incremental minhash-LSH: candidate near-dup pairs INVOLVING a new
    * ingest batch — new×new plus new×stored — given the band table of the
    * existing corpus (as produced by [[bandTable]] and persisted). The
    * corpus is never re-banded; each pair is normalized (id_a < id_b).
    * Equivalence: on (corpus ∪ batch), these are exactly the full run's
    * candidate pairs that touch the batch (property-checked in specs).
    */
  def minhashIncrementalCandidates(
      newDocs: DataFrame, idCol: String, textCol: String,
      storedBands: DataFrame, shingleSize: Int = 3,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashIncrementalCandidatesFromBands(
      bandTableOf(newDocs, idCol, textCol, shingleSize, numHashes, rowsPerBand),
      storedBands, shingleSize, numHashes, rowsPerBand)

  /** The band table of a raw document frame — [[bandTable]] with the
    * tokenize+shingle pass folded in. This is the PERSISTED-ARTIFACT
    * builder for incremental dedup: band the ingest batch once, probe
    * the store with it ([[minhashIncrementalCandidatesFromBands]]), then
    * append the same frame to the store — the batch is never re-banded.
    */
  def bandTableOf(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 8,
      rowsPerBand: Int = 2): DataFrame =
    bandTable(shingleFrame(docs, idCol, textCol, shingleSize),
      numHashes, rowsPerBand, shingleSize)

  /** [[minhashIncrementalCandidates]] over a PREBUILT batch band table
    * (as produced by [[bandTableOf]]) — the shape a composed ingest uses
    * when the same frame both probes the store and is appended to it.
    * Both frames are parameter-guarded against the probe's axes.
    */
  def minhashIncrementalCandidatesFromBands(
      newBands: DataFrame, storedBands: DataFrame, shingleSize: Int = 3,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    // drift guard: every axis this probe knows (h, r, shingle width) is
    // checked against BOTH sides' self-description; a store stamped
    // before shingle tagging matches on its recorded axes
    requireStoreParams(storedBands,
      bandParams(numHashes, rowsPerBand, shingleSize), "band")
    requireStoreParams(newBands,
      bandParams(numHashes, rowsPerBand, shingleSize), "batch band")
    val nb = newBands
    val nBatch = nb.count() // cheap: bandTable is checkpointed
    val a = nb.select(col("_bno"), col("_bkey"), col("_id").as("id_a"))
    val b = nb.select(col("_bno"), col("_bkey"), col("_id").as("id_b"))
    val newNew = a.join(b, Seq("_bno", "_bkey"))
      .where(col("id_a") < col("id_b"))
    val stored = storedBands
      .select(col("_bno"), col("_bkey"), col("_id").as("_sid"))
    // the BATCH side carries the broadcast hint (size-dispatched): the
    // store then STREAMS through this join with zero shuffle — an
    // unhinted equi-join plans sort-merge and re-shuffles the whole
    // persisted band table on every ingest batch, which at corpus scale
    // is the entire cost of the ingest (the exactIncremental finding;
    // an over-broadcast-sized backfill degrades to the shuffle join)
    val newStored = Joins.broadcastIfSmall(a, Some(nBatch))
      .join(stored, Seq("_bno", "_bkey"))
      .where(col("id_a") =!= col("_sid"))
      .select(least(col("id_a"), col("_sid")).as("id_a"),
        greatest(col("id_a"), col("_sid")).as("id_b"))
    newNew.select(col("id_a"), col("id_b"))
      .unionByName(newStored)
      .distinct()
  }

  /** Fuzzy decontamination: drop corpus docs NEAR-duplicate (banded
    * minhash candidates, then exact-Jaccard verified ≥ `threshold`) to
    * any benchmark doc — the fuzzy upgrade of the exact-shingle
    * semi-join (`q_decontaminate`): n-gram equality misses paraphrased
    * or lightly-edited benchmark leakage, which is exactly what
    * evaluation-contamination audits flag (Brown et al. 2020 App. C
    * use 13-gram overlap; near-dup subsumes it at threshold→0).
    * Benchmark docs themselves are dropped too (same contract as the
    * exact variant, where they trivially self-match).
    *
    * Scale shape — deliberately NOT the dedup pipeline's corpus×corpus
    * pair space: a benchmark is small (eval suites: 1e3–1e5 docs), so
    * its band table and shingle sets ride BROADCAST joins; the corpus
    * pays one shingle+banding pass, is semi-join-restricted to candidate
    * docs before the verify explode, and is never self-joined.
    */
  def decontaminateFuzzy(
      docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, shingleSize: Int = 3,
      threshold: Double = 0.5, benchmarkInCorpus: Boolean = true): DataFrame = {
    // banding derived from the caller's threshold: a fixed 8/2 banding
    // pins the S-curve knee at 0.5 regardless of what the caller asked —
    // at threshold 0.2 a true Jaccard-0.3 leak would collide in any band
    // with only ~31% probability, silently passing ~2/3 of the docs the
    // call asked to remove. rowsPerBandFor(0.5) = 2, so the graded
    // default point is unchanged.
    val rpb = rowsPerBandFor(threshold)
    val bSh = shingleFrame(benchmark, idCol, textCol, shingleSize)
      .withColumnRenamed("_id", "_bid")
      .transform(Materialize.checkpoint)
    val bBands = bandTable(bSh.select(col("_bid").as("_id"), col("_sh")),
        rowsPerBand = rpb)
      .select(col("_bno"), col("_bkey"), col("_id").as("_bid"))
    val bSets = bSh
      .select(col("_bid"),
        array_distinct(transform(col("_sh"), s => xxhash64(s))).as("_arr"))
      .select(col("_bid"), size(col("_arr")).as("_szb"),
        explode(col("_arr")).as("_h"))
    val cSh = shingleFrame(docs, idCol, textCol, shingleSize)
      .withColumnRenamed("_id", "_cid")
      .transform(Materialize.checkpoint)
    val cBands = bandTable(cSh.select(col("_cid").as("_id"), col("_sh")),
        rowsPerBand = rpb)
      .select(col("_bno"), col("_bkey"), col("_id").as("_cid"))
    val cands = cBands.join(broadcast(bBands), Seq("_bno", "_bkey"))
      .where(col("_cid") =!= col("_bid"))
      .select("_cid", "_bid").distinct()
      .transform(Materialize.checkpoint)
    val cSets = cSh
      .join(cands.select("_cid"), Seq("_cid"), "left_semi")
      .select(col("_cid"),
        array_distinct(transform(col("_sh"), s => xxhash64(s))).as("_arr"))
      .select(col("_cid"), size(col("_arr")).as("_szc"),
        explode(col("_arr")).as("_h"))
    val bad = cands.join(cSets, Seq("_cid"))
      .join(broadcast(bSets), Seq("_bid", "_h"))
      .groupBy("_cid", "_bid", "_szc", "_szb")
      .agg(count(lit(1)).as("_i"))
      .where(col("_i").cast("double") /
        (col("_szc") + col("_szb") - col("_i")).cast("double") >= threshold)
      .select(col("_cid").as(idCol)).distinct()
    // PRECONDITION: benchmark ids live in the corpus id space (the
    // "benchmark rows are present in / keyed like the corpus" contract
    // this shares with the exact variant, whose benchmark copies
    // self-match by content). With an INDEPENDENT benchmark id space
    // this anti-join would delete unrelated corpus docs on id
    // collision — pass benchmarkInCorpus = false there and drop
    // benchmark leakage by content alone (a verbatim benchmark copy in
    // the corpus self-verifies at Jaccard 1.0 ≥ any threshold).
    val base =
      if (benchmarkInCorpus)
        docs.join(benchmark.select(col(idCol)), Seq(idCol), "left_anti")
      else docs
    base.join(bad, Seq(idCol), "left_anti")
  }

  /** Portable SimHash (16-bit variant): for hex digit position j of
    * md5(token), the digit's value >= 8 votes +1 on plane j, else -1; bit j
    * set iff the vote sum is positive. Engine-portable (md5 + substring),
    * mirrored exactly by the DuckDB oracle. Delegates to the native
    * one-pass `simhash16` codegen expression (graft.functions.SimHash16,
    * equivalence spec-checked against [[simhash16Builtin]]) — the builtin
    * aggregate allocates a 16-field struct per token under interpreted
    * HOF evaluation (measured 10.1s → native ~1s at sf1).
    */
  def simhash16(text: Column): Column =
    call_function("simhash16", Text.tokens(lower(text)))

  /** The pure-builtin composition of [[simhash16]] — the reference
    * rendering of the definition (and the shape the DuckDB oracle
    * replicates). Kept as the equivalence-check twin.
    */
  def simhash16Builtin(text: Column): Column = {
    val ts = Text.tokens(lower(text))
    val digests = transform(ts, t => md5(t.cast("binary")))
    // ONE aggregate pass carrying all 16 votes in a struct accumulator:
    // higher-order functions are interpreted (no codegen, no
    // common-subexpression elimination), so 16 separate aggregate
    // expressions each re-evaluated the tokenize+md5 input — 16
    // tokenizations and 16×|tokens| md5s per row (measured 3.1s → ~0.6s
    // at sf0.1 under materialized timing). The aggregate's INPUT
    // expression evaluates once per row; the merge touches only cheap
    // substrings of the element.
    aggregate(
      digests,
      struct((0 until 16).map(j => lit(0).as(s"v$j")): _*),
      (acc, d) => struct((0 until 16).map { j =>
        // hex digit >= '8': chars 8,9,a..f sort after '7'
        (acc.getField(s"v$j") + when(
          substring(d, j + 1, 1) >= "8", lit(1)).otherwise(lit(-1))).as(s"v$j")
      }: _*),
      // bit assembly in the FINISH lambda: referencing the aggregate
      // result from outside would re-evaluate the whole aggregate per
      // reference (16×); the finish body references only the bound
      // accumulator variable.
      acc => (0 until 16).map { j =>
        when(acc.getField(s"v$j") > 0, lit(1L << (15 - j))).otherwise(lit(0L))
      }.reduce(_ + _))
  }

  /** SimHash near-duplicate pairs: hamming(simhash64_a, simhash64_b) <=
    * maxHamming. Pigeonhole blocking makes it scale: the 64-bit hash
    * splits into 4 16-bit bands, and any pair within hamming 3 must agree
    * exactly on at least one band — candidates are pairs sharing a
    * (band-position, band-value) bucket, exact hamming checked only on
    * those. One pass to hash, one shuffle to bucket, pairs in-bucket.
    * (A 16-bit simhash is too coarse for blocking: on a 5k-doc corpus its
    * nibble buckets collapse to a handful of values and candidate
    * generation degenerates toward all-pairs.)
    */
  /** 64-bit simhash per document via explode + 64 partial-aggregable vote
    * SUMs. Every expression here is whole-stage-codegen'd (plain substring/
    * ascii/CASE arithmetic — no higher-order array lambdas, which Spark
    * interprets per element); the shuffle carries one 64-long partial
    * vector per (doc × partition), so the exchanged volume is O(|docs|)
    * regardless of token count. Bit j = bit (j%4) of hex digit (j/4 + 1)
    * of md5(token), matching `simhash64Votes` and the DuckDB oracle
    * exactly. Documents with zero tokens produce no rows (same as the
    * oracle's unnest).
    */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // Native one-pass expression: simhash votes are per-DOCUMENT, so the
    // hash is a pure map — no explode (|tokens|× row blowup) and no
    // 64-column vote shuffle. Bit-identical to [[simhash64Builtin]]
    // (equivalence spec-checked); spread for the per-row-dense compute.
    // Token-less (or null-text) docs are dropped exactly like the
    // builtin's explode does — otherwise every empty doc would carry
    // hash 0 and spuriously pair with every other empty doc.
    Text.spread(docs)
      .select(col(idCol).as("_id"),
        Text.tokens(lower(col(textCol))).as("_ts"))
      .where(size(col("_ts")) > 0)
      .select(col("_id"), call_function("simhash64", col("_ts")).as("_h"))

  /** The explode → 64-vote-SUM groupBy composition of [[simhash64]] — the
    * distributed-aggregate rendering the DuckDB oracle replicates, kept as
    * the equivalence-check twin for the native expression.
    */
  def simhash64Builtin(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread: per-token md5 + 16 hex-digit extractions run PRE-shuffle in
    // the scan's partitions — see Text.spread
    val digests = Text.spread(docs)
      .select(col(idCol).as("_id"),
        explode(Text.tokens(lower(col(textCol)))).as("_t"))
      .select(col("_id"), md5(col("_t").cast("binary")).as("_d"))
    // hex digit values materialized once per token (16 tiny codegen'd
    // exprs), then 64 CASE sums over them
    val withIdx = digests.select(col("_id") +: (1 to 16).map { pos =>
      val a = ascii(substring(col("_d"), pos, 1))
      when(a <= 57, a - 48).otherwise(a - 87).as(s"_x$pos")
    }: _*)
    val votes = withIdx.groupBy("_id").agg(
      sum(when(col("_x1").bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as("_v0"),
      (1 until 64).map { j =>
        val pos = j / 4 + 1
        val bit = j % 4
        sum(when(shiftright(col(s"_x$pos"), bit).bitwiseAND(lit(1)) === 1, 1)
          .otherwise(-1)).as(s"_v$j")
      }: _*)
    votes.select(col("_id"),
      (0 until 64).map { j =>
        when(col(s"_v$j") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_)).as("_h"))
  }

  def simhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers hamming <= 3")
    // Hashes materialized once (16 bytes/row) — a self-join that
    // recomputed the vote aggregate per side would double the dominant
    // cost; pair generation is a distributed band self-join rather than a
    // per-bucket collect (see cosineNearDupPairs for the rationale).
    val hashed = simhash64(docs, idCol, textCol)
      .transform(Materialize.checkpoint)
    val banded = hashed.select(col("_id"), col("_h"),
      explode(array((0 until 4).map { band =>
        struct(lit(band).as("pos"),
          shiftright(col("_h"), band * 16).bitwiseAND(lit(65535L)).as("v"))
      }: _*)).as("_b"))
      .select(col("_id"), col("_h"), col("_b.pos").as("_pos"), col("_b.v").as("_v"))
    val a = banded.select(col("_pos"), col("_v"),
      col("_id").as("id_a"), col("_h").as("_ha"))
    val b = banded.select(col("_pos"), col("_v"),
      col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_pos", "_v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Corpus-scale variant of [[simhashNearDupPairs]]: block-permuted
    * banding (Manku, Jain & Das Sarma 2007, "Detecting Near-Duplicates for
    * Web Crawling"). The 4×16-bit pigeonhole's spurious-collision term is
    * C(n,2)/2^16 per band — fine to ~1M docs, quadratic death beyond (at
    * 100M docs it is ~10^11 hamming checks per band). Splitting the 64-bit
    * hash into `blocks` blocks and banding on every (blocks − maxHamming)-
    * block combination widens the band key: with the default 8 blocks /
    * hamming ≤ 3, each of the C(8,5)=56 bands keys on 40 bits, cutting
    * spurious collisions by 2^24 at the cost of 14× more band rows — the
    * published trade for web-scale corpora. Same exact-cover guarantee
    * (≤ maxHamming differing bits touch ≤ maxHamming blocks, so some
    * (blocks − maxHamming)-subset is untouched and collides), therefore
    * IDENTICAL output to the pigeonhole variant — spec-checked, and the
    * band construction is data-independent so the choice is a pure
    * corpus-size switch.
    */
  def simhashNearDupPairsBlocked(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blocks: Int = 8): DataFrame =
    hash64NearDupPairsBlocked(
      simhash64(docs, idCol, textCol), maxHamming, blocks)

  /** The Manku block-banding over ANY 64-bit signature frame
    * `(_id, _h)` — the [[simhashNearDupPairsBlocked]] machinery with the
    * hash supplier factored out, so other 64-bit perceptual signatures
    * (image dHash — [[graft.sources.Multimodal.nearDupImagePairs]]) ride
    * the identical exact-cover banding instead of growing a fork.
    */
  def hash64NearDupPairsBlocked(
      hashes: DataFrame, maxHamming: Int, blocks: Int): DataFrame = {
    require(blocks > maxHamming && 64 % blocks == 0,
      s"need 64 % blocks == 0 and blocks > maxHamming, got $blocks/$maxHamming")
    val width = 64 / blocks
    val keep = blocks - maxHamming
    val mask = if (width == 64) -1L else (1L << width) - 1
    val hashed = hashes.transform(Materialize.checkpoint)
    // one band per keep-sized block combination. The band key PACKS the
    // band id and the chosen blocks' bits into ONE LONG whenever they
    // fit 63 bits (the default 8-block/hamming-3 geometry: 6 id bits +
    // 5×8 block bits = 46) — packing is injective, so the candidate set
    // (and therefore the output) is IDENTICAL to the retired
    // concat_ws("|") string key, while the band self-join shuffles 8
    // bytes per row instead of a ~40-byte string and compares longs
    // instead of strings (guide §2.3 narrower types — this join is the
    // operator's one big exchange). Geometries past 63 bits (keep×width
    // + id bits) keep the string key.
    val combos = (0 until blocks).combinations(keep).toSeq
    val bandIdBits =
      32 - Integer.numberOfLeadingZeros(math.max(1, combos.size - 1))
    val packable = bandIdBits + keep * width <= 63
    def packedKey(combo: Seq[Int], bandId: Int): Column =
      combo.foldLeft(lit(bandId.toLong)) { (acc, b) =>
        shiftleft(acc, width).bitwiseOR(
          shiftright(col("_h"), b * width).bitwiseAND(lit(mask)))
      }
    def stringKey(combo: Seq[Int], bandId: Int): Column =
      concat_ws("|", lit(bandId.toString) +: combo.map(b =>
        shiftright(col("_h"), b * width).bitwiseAND(lit(mask))): _*)
    val banded = hashed.select(col("_id"), col("_h"),
      explode(array(combos.zipWithIndex.map { case (combo, bandId) =>
        if (packable) packedKey(combo, bandId) else stringKey(combo, bandId)
      }: _*)).as("_v"))
    val a = banded.select(col("_v"),
      col("_id").as("id_a"), col("_h").as("_ha"))
    val b = banded.select(col("_v"),
      col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("_ha").bitwiseXOR(col("_hb"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact-Jaccard verification of minhash candidate pairs: recomputes the
    * true shingle-set Jaccard for every LSH candidate and keeps pairs at or
    * above `threshold`. The intersection join is RESTRICTED to candidate
    * pairs — cost is |candidates| × shingles-per-doc, never the all-pairs
    * product; this is the standard verify step after probabilistic blocking.
    */
  /** Salt count for the verify join's replicated hop, derived from the
    * candidate-pair volume the way [[rowsPerBandFor]]/`numPlanesFor`
    * derive their knobs. Worst-case skew is every candidate pair sharing
    * one boilerplate doc as `id_a` — keyed on bare id_a those pairs land
    * in ONE task, so pick salts such that even then no reducer sees more
    * than ~`targetPerSalt` pairs: ceil(pairs / target), clamped to
    * [1, 1024] (the cap bounds the ×salts replication of the semi-join-
    * restricted shingle side). Small candidate sets derive salt 1 and pay
    * zero replication.
    */
  def verifySaltsFor(candidatePairs: Long, targetPerSalt: Long = 4096L): Int = {
    require(targetPerSalt > 0, "targetPerSalt must be positive")
    math.min(1024L,
      math.max(1L, math.ceil(candidatePairs.toDouble / targetPerSalt).toLong)).toInt
  }

  def verifiedJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.5,
      targetPairsPerSalt: Long = 4096L): DataFrame = {
    // One tokenize+shingle pass feeds BOTH the minhash candidates and the
    // exact-verify side, and each derived frame is materialized once (the
    // candidate set and shingle rows both appear twice in the join tree).
    val shingled = shingleFrame(docs, idCol, textCol, shingleSize)
      .transform(Materialize.checkpoint)
    // banding follows the verify threshold (rowsPerBandFor(0.5) = 2 — the
    // graded default point is unchanged); a fixed banding would hold the
    // candidate knee at 0.5 no matter what the caller verifies at
    val cands = minhashCandidatePairsFromShingles(shingled,
        rowsPerBand = rowsPerBandFor(threshold))
      .transform(Materialize.checkpoint)
    val sh = shingled
      .select(col("_id"),
        array_distinct(transform(col("_sh"), s => xxhash64(s))).as("_sharr"))
      .select(col("_id"), size(col("_sharr")).as("_sz"),
        explode(col("_sharr")).as("_sh"))
      .transform(Materialize.checkpoint)
    // Both intersection hops must avoid a single hot doc key. Hop 2 is
    // naturally spread over (id_b, shingle); hop 1 expands each candidate
    // pair by id_a's shingle set, and keyed on bare `id_a` a
    // boilerplate-heavy doc in k pairs with s shingles lands k×s rows in
    // ONE task (k~1e4, s~1e3 at 100 TB ⇒ 1e7-row task). Fix: salt hop 1.
    // The salt is derived from the OTHER pair member (deterministic, so a
    // hot id_a's pairs spread over `salts` reducers), and the replicated
    // shingle side is first semi-join-restricted to docs that actually
    // appear in candidates — the corpus-sized shingle frame never pays the
    // ×salts shuffle, only the (small) near-dup subset does. Hop 2's b side
    // gets the same semi-join restriction to cut its shuffle volume.
    // The salt count is DERIVED from the candidate volume (cands is already
    // materialized, so the count is a cheap scan): a fixed constant either
    // under-salts a 10⁵-pair boilerplate doc at corpus scale or replicates
    // a tiny corpus's shingles for nothing.
    val salts = verifySaltsFor(cands.count(), targetPairsPerSalt)
    val a = sh.select(col("_id").as("id_a"), col("_sz").as("_sza"), col("_sh"))
      .join(cands.select("id_a").distinct(), Seq("id_a"), "left_semi")
      .withColumn("_salt", explode(array((0 until salts).map(lit(_)): _*)))
    val b = sh.select(col("_id").as("id_b"), col("_sz").as("_szb"), col("_sh"))
      .join(cands.select("id_b").distinct(), Seq("id_b"), "left_semi")
    cands.withColumn("_salt", pmod(xxhash64(col("id_b")), lit(salts)).cast("int"))
      .join(a, Seq("id_a", "_salt")).drop("_salt")
      .join(b, Seq("id_b", "_sh"))
      .groupBy("id_a", "id_b", "_sza", "_szb")
      .agg(count(lit(1)).as("_inter"))
      .withColumn("jaccard",
        col("_inter").cast("double") /
          (col("_sza") + col("_szb") - col("_inter")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash estimator audit for candidate pairs: for every LSH candidate,
    * the signature-agreement Jaccard estimate (matching positions /
    * numHashes — the textbook unbiased MinHash estimator) NEXT TO the true
    * shingle-set Jaccard. Everything is deterministic (md5-seeded
    * minhashes), so an oracle reproduces both columns bit-for-bit; the
    * row set doubles as the empirical S-curve evidence behind
    * [[rowsPerBandFor]]'s banding law. Cost shape: the pair table is
    * blocking-bounded, and each join below keys it against the
    * dimension-per-doc signature/shingle frame — per-row work is
    * O(numHashes + shingles-per-doc), never corpus × corpus.
    */
  def minhashEstimatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    // raw shingles for the signature (min is duplicate-insensitive; the
    // distinct is only needed on the exact-Jaccard side, where it runs
    // over xxhash64-hashed values — string array_distinct is O(n²) per
    // row, the pattern ngramJaccardPairs documents and this file bans)
    val shingled = shingleFrame(docs, idCol, textCol, shingleSize)
      .transform(Materialize.checkpoint)
    val cands = minhashCandidatePairsFromShingles(shingled, numHashes, rowsPerBand)
    val sigs = shingled.select(col("_id"),
      minhashSignature(col("_sh"), numHashes).as("_sig"),
      array_distinct(transform(col("_sh"), s => xxhash64(s))).as("_sh"))
    val est = cands
      .join(sigs.select(col("_id").as("id_a"), col("_sig").as("_siga"),
        col("_sh").as("_sha")), Seq("id_a"))
      .join(sigs.select(col("_id").as("id_b"), col("_sig").as("_sigb"),
        col("_sh").as("_shb")), Seq("id_b"))
    val inter = size(array_intersect(col("_sha"), col("_shb"))).cast("double")
    est.select(col("id_a"), col("id_b"),
      round(size(filter(zip_with(col("_siga"), col("_sigb"),
        (a, b) => a === b), m => m)).cast("double") / numHashes, 6)
        .as("est_jaccard"),
      round(inter / (size(col("_sha")) + size(col("_shb")) - inter), 6)
        .as("jaccard"))
  }

  /** Cluster-representative selection: given per-doc near-dup components
    * (from [[connectedComponents]] over any candidate generator), keep the
    * highest-quality member of each cluster — the step that turns "these
    * docs are near-dups" into "this is the copy the training set keeps".
    * Docs in no cluster are their own singleton and keep themselves.
    * Keeper choice is a partial-aggregable struct-min (max quality, ties →
    * min id) — no window over the corpus, and the keeper join is one row
    * per cluster against cluster-keyed members, so a degenerate
    * boilerplate cluster spreads across tasks instead of funneling one.
    */
  def keepBestPerCluster(docs: DataFrame, idCol: String, quality: Column,
      clusters: DataFrame): DataFrame = {
    val clustered = docs
      .select(col(idCol).as("doc_id"), quality.as("quality"))
      .join(clusters.withColumnRenamed("id", "_cid"),
        col("doc_id") === col("_cid"), "left")
      .select(col("doc_id"), col("quality"),
        coalesce(col("component"), col("doc_id")).as("cluster"))
    // NULL quality sorts to a -Inf sentinel, not first: Spark's struct-min
    // orders a NULL field BEFORE every value, so a null-quality doc would
    // otherwise always win its cluster — the opposite of the quality-DESC-
    // nulls-last contract (and of the DuckDB twin's row_number ordering).
    // With the sentinel, null-quality docs win only all-null clusters,
    // where the doc_id tie-break decides in both engines.
    val keepers = clustered.groupBy("cluster")
      .agg(min(struct(
        (-coalesce(col("quality").cast("double"), lit(Double.NegativeInfinity)))
          .as("_nq"),
        col("doc_id").as("kid"))).as("_k"))
      .select(col("cluster"), col("_k.kid").as("_keeper"))
    clustered.join(keepers, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("quality"),
        (col("doc_id") === col("_keeper")).as("keep"))
  }

  /** End-to-end dedup resolution: minhash-LSH candidates → exact-Jaccard
    * verify → connected components → canonical keeper. Every document maps
    * to its cluster's minimum id (itself when it has no verified near-dup).
    * This is the full shape a 100 TB corpus dedup runs: probabilistic
    * blocking bounds the pair space, verification removes LSH false
    * positives, components make "A~B, B~C ⇒ one cluster" transitive, and
    * the keeper choice is deterministic.
    */
  def dedupPipeline(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val verified = verifiedJaccardPairs(docs, idCol, textCol, threshold = threshold)
    val comp = connectedComponents(verified.select("id_a", "id_b"))
      .withColumnRenamed("id", "_cid")
    docs.select(col(idCol).as("doc_id"))
      .join(comp, col("doc_id") === col("_cid"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("keeper_id"))
  }

  /** Connected components over an undirected candidate-pair graph
    * (`(id_a, id_b)` rows): assigns every node the minimum id reachable
    * from it — the canonical "dedup cluster" resolution step after any
    * candidate generator (minhash/simhash/embedding pairs).
    *
    * Hybrid strategy: min-label propagation first (2 jobs/round, and
    * near-dup components are near-star shaped, so it converges in a few
    * rounds — A/B-measured ~2× cheaper than the star algorithm at sf0.1),
    * BUT its round count is O(component diameter), so if it has NOT
    * converged within `propagationRounds` the result would be silently
    * wrong — in that case the partial labels (always SAFE merges) CONTRACT
    * the graph and the diameter-independent large-star/small-star pass
    * ([[connectedComponentsStar]]) finishes on the contracted remainder,
    * composing the two mappings. Normal corpora converge in ≤5 rounds and
    * never pay the rescue; pathological chain topologies get a correct
    * answer at star cost on a graph that propagation already shrank (the
    * cap defaults low — 8 — precisely because capping early is now cheap:
    * unspent rounds were the dominant cost of the old discard-and-restart
    * fallback, measured 18.7→~6s on the sf1 multi-signal chain graph).
    */
  def connectedComponents(
      pairs: DataFrame, propagationRounds: Int = 8): DataFrame = {
    // labelPropagation materializes the pair set once internally and hands
    // it back, so the rescue path below reuses the SAME checkpoint — no
    // second materialization, and the upstream derivation (minhash/simhash
    // chains) executes exactly once.
    val (labels, converged, p) = labelPropagation(pairs, propagationRounds)
    if (converged) labels
    else {
      // Unconverged labels are still SAFE merges (propagation only ever
      // adopts a label from a connected neighbor), so instead of
      // discarding them and re-running on the raw graph, CONTRACT each
      // edge through its endpoints' partial labels and run the
      // diameter-independent star pass on the contracted graph — typically
      // orders of magnitude fewer nodes (every ≤`propagationRounds`-radius
      // neighborhood has already collapsed to one label) — then compose
      // the two mappings. Measured on the sf1 multi-signal chain topology:
      // 18.7s (discard + star from scratch) → star over a few hundred
      // contracted nodes.
      val la = labels.select(col("id").as("id_a"), col("component").as("_ca"))
      val lb = labels.select(col("id").as("id_b"), col("component").as("_cb"))
      val contracted = p.join(la, "id_a").join(lb, "id_b")
        .select(col("_ca").as("id_a"), col("_cb").as("id_b"))
        .where(col("id_a") =!= col("id_b"))
        .distinct()
      val star = connectedComponentsStar(contracted)
        .select(col("id").as("_pl"), col("component").as("_cf"))
      // partial labels with no surviving inter-cluster edge are final
      labels.select(col("id"), col("component").as("_pl"))
        .join(star, Seq("_pl"), "left")
        .select(col("id"), coalesce(col("_cf"), col("_pl")).as("component"))
    }
  }

  /** Fold a batch of newly-discovered near-dup edges into an existing
    * component labeling WITHOUT re-clustering the corpus — the missing
    * piece between the incremental candidate generators
    * ([[minhashIncrementalCandidates]], the SRP/cosine twin) and a
    * persisted cluster store: candidates touching the new batch arrive as
    * edges; this merges them into yesterday's labels.
    *
    * @param labels   stored `(id, component)` map as produced by any
    *                 [[connectedComponents]]* variant (labels are
    *                 canonical min-ids — the merge preserves that, so
    *                 the output EQUALS a from-scratch re-cluster over
    *                 the union of old and new edges, which is what the
    *                 oracle twin checks)
    * @param newEdges `(id_a, id_b)` edges; endpoints may be brand-new ids
    *                 or already-labeled ids in any combination
    *
    * Cost shape at 100 TB: every join is BATCH-sized except the one pass
    * over the store — and that pass is a map-side left join against the
    * broadcast quotient mapping (batch-sized via
    * [[graft.ops.Joins.broadcastIfSmall]]), so the corpus-scale store is
    * scanned once and NEVER shuffled. The actual clustering runs on the
    * QUOTIENT graph (nodes = current labels of batch endpoints, edges =
    * the batch), which is diameter-independent via the star pass and
    * orders of magnitude smaller than the corpus.
    */
  def connectedComponentsIncremental(
      labels: DataFrame, newEdges: DataFrame): DataFrame =
    connectedComponentsIncrementalParts(labels, newEdges)._1

  /** [[connectedComponentsIncremental]] with the batch-sized fold pieces
    * exposed beside the updated store — `(updatedStore, bcMerged,
    * newRows, storeComps)` — for composed ingests
    * ([[graft.ops.Curation.curateIncremental]]) that also need the
    * admission facts the fold already computed: which merged components
    * EXISTED in the store before this batch (`storeComps`, relabel
    * through `bcMerged` — those clusters already shipped a keeper) and
    * the batch endpoints' final labels (`newRows`). Re-deriving either
    * from the updated store would cost a second corpus-scale scan.
    */
  private[graft] def connectedComponentsIncrementalParts(
      labels: DataFrame, newEdges: DataFrame)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val (bcMerged, newRows, storeComps) = incrementalMergeParts(labels, newEdges)
    // ONE map-side pass over the store: touched components relabel,
    // untouched rows stream through
    val storeUpdated = labels
      .join(bcMerged, labels("component") === col("_old"), "left")
      .select(labels("id"),
        coalesce(col("_new"), labels("component")).as("component"))
    (storeUpdated.unionByName(newRows), bcMerged, newRows, storeComps)
  }

  /** The two batch-sized pieces of the incremental fold, shared by the
    * whole-store path above and the SHARDED store fold
    * ([[graft.streaming.EventStream.foldShardedBatch]]), which needs them
    * separately: the merge map tells it WHICH component-keyed shards the
    * batch touches, so it can rewrite only those.
    *
    * Returns `(mergeMap, newRows)`: `mergeMap` is the broadcast-hinted
    * `(_old, _new)` component relabeling from clustering the QUOTIENT
    * graph (nodes = current labels of batch endpoints, edges = the
    * batch — checkpointed, batch-bounded); `newRows` are `(id,
    * component)` rows for ids not yet in the store.
    */
  private[graft] def incrementalMergeParts(
      labels: DataFrame, newEdges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // The shared CC null contract ([[rawPairFrame]] and friends): a
    // NULL endpoint is not an id and carries no merge information — but
    // left in, it flows into newRows as a (null, null) row whose null
    // shard key NPEs the sharded fold's touched-shard collect, turning
    // one producer-glitch edge into a poison pill the stream retries
    // forever (the whole-store path writes the garbage row instead).
    // Edges for the quotient keep only fully-non-null pairs; the
    // OBSERVED id set keeps every non-null endpoint, so a half-null
    // edge's good endpoint still enters the labeling (self-labeled),
    // exactly as the batch formulations keep it.
    val eRaw = rawPairFrame(newEdges)
    val e = nonNullPairs(eRaw)
    // NOT materialized: single consumer (the endpointRaw store join) over
    // the already-checkpointed eRaw — an eager checkpoint here was one
    // extra job per ingest batch.
    val ids = nonNullEndpoints(eRaw)
    // batch endpoint → its store row if any. Materialized: this join is
    // the fold's ONE store scan, and both the label coalesce and the
    // store-component set below derive from it — recomputing it would
    // scan the store twice per batch. Counted: the count (batch endpoint
    // cardinality) sizes the broadcast dispatch of the la/lb sides below
    // at zero extra jobs.
    val (endpointRaw, nEndpoints) = Materialize.checkpointCounted(
      ids.join(labels, Seq("id"), "left")
        .select(col("id"), col("component")))
    // batch endpoint → its current label (own id when not yet labeled)
    val endpointLbl = endpointRaw
      .select(col("id"), coalesce(col("component"), col("id")).as("_lbl"))
    // batch-sized → broadcast when they fit the gates, so the quotient
    // build streams the edge side with zero label-side Exchange (above
    // the gates the shuffle joins return). FIXED-WIDTH schemas only: a
    // forced hint overrides Spark's own size checks, and staticRowBytes'
    // flat per-string constant can underestimate multi-KB string ids
    // (URL/path doc ids) — the driver-OOM direction. String-id frames
    // skip the hint; AQE still auto-broadcasts off runtime stats.
    def bcl(df: DataFrame): DataFrame =
      if (Joins.fixedWidth(df) &&
          Joins.fitsBroadcast(newEdges.sparkSession, nEndpoints,
          Joins.staticRowBytes(df))) broadcast(df)
      else df
    val la = endpointLbl.select(col("id").as("id_a"), col("_lbl").as("_la"))
    val lb = endpointLbl.select(col("id").as("id_b"), col("_lbl").as("_lb"))
    // contract each new edge through the endpoints' labels; edges inside
    // one existing component collapse to dropped self-loops
    val quotient = e.join(bcl(la), Seq("id_a")).join(bcl(lb), Seq("id_b"))
      .select(col("_la").as("id_a"), col("_lb").as("id_b"))
      .where(col("id_a") =!= col("id_b"))
      .distinct()
    // The quotient graph is BATCH-bounded by construction (nodes = the
    // current labels of batch endpoints), and its merge map must fit the
    // broadcast gates anyway — the whole fold contract hinges on
    // bcMerged broadcasting. Below those same gates (and for integral
    // ids, where local ordering provably equals Spark's), the clustering
    // therefore runs as a driver-side min-union-find over the collected
    // edges: identical labels (min reachable id), TWO jobs total where
    // the distributed star pass paid ~25 small stage-jobs per ingest
    // batch on a graph of a few hundred rows. Above the gates — or for
    // non-integral id types — the distributed star pass runs unchanged;
    // the collected edges are already checkpointed blocks, so the
    // fallback never recomputes the quotient derivation.
    val integralIds = quotient.schema.fields.forall(_.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    val (qck, nQ) = Materialize.checkpointCounted(quotient)
    val bcMerged =
      if (integralIds && fitsLocalSolve(
          newEdges.sparkSession, nQ, Joins.staticRowBytes(quotient))) {
        val comp = localMinComponents(qck.collect().map(r =>
          (r.get(0).asInstanceOf[Number].longValue(),
            r.get(1).asInstanceOf[Number].longValue())))
        val spark = newEdges.sparkSession
        val idType = quotient.schema("id_a").dataType
        import spark.implicits._
        broadcast(comp.toSeq.toDF("_old", "_new")
          .select(col("_old").cast(idType).as("_old"),
            col("_new").cast(idType).as("_new")))
      } else {
        // counted checkpoint: the count IS the forcing action (one job,
        // not an eager checkpoint plus a count job per ingest batch)
        val (merged, nMerged) = Materialize.checkpointCounted(
          connectedComponentsStar(qck)
            .select(col("id").as("_old"), col("component").as("_new")))
        Joins.broadcastIfSmall(merged, Some(nMerged))
      }
    // brand-new ids enter with their own id as label unless the quotient
    // merged them into something
    val newRows = endpointRaw.where(col("component").isNull).select(col("id"))
      .join(bcMerged, col("id") === col("_old"), "left")
      .select(col("id"), coalesce(col("_new"), col("id")).as("component"))
    // distinct components the batch's endpoints ALREADY HAVE in the
    // store — batch-sized, and exactly the set a sharded fold needs to
    // know which shards LOSE rows (an _old that is a brand-new id's
    // self-label has no store rows and must not count)
    val storeComps = endpointRaw.where(col("component").isNotNull)
      .select(col("component").as("c")).distinct()
    (bcMerged, newRows, storeComps)
  }

  /** Runtime conf key: max estimated BYTES the driver-side union-find
    * fast paths will still collect (default 64 MB — a quarter of the
    * broadcast byte gate). The broadcast gate models Tungsten broadcast
    * cost; collect() materializes boxed GenericRows plus a mutable
    * HashMap of up to 2M Long entries, several times the estimate on the
    * driver heap, so the collect path carries its own tighter cap.
    */
  val LocalSolveMaxBytesKey = "spark.graft.cc.localMaxBytes"

  /** The driver-side union-find dispatch gate: the broadcast gates (the
    * same data would be collected for a broadcast anyway) AND the
    * dedicated local-solve byte cap above.
    */
  private def fitsLocalSolve(
      spark: SparkSession, rows: Long, rowBytes: Long): Boolean =
    Joins.fitsBroadcast(spark, rows, rowBytes) &&
      rows * rowBytes <= spark.conf
        .get(LocalSolveMaxBytesKey, (64L * 1024 * 1024).toString).toLong

  /** Driver-side connected components over an edge list with MIN-id
    * representatives — the local twin of [[connectedComponentsStar]] for
    * quotient graphs under the broadcast size gates. Path-compressed
    * union-find, union by smaller root, so every node resolves to its
    * component's minimum id — exactly the distributed pass's labeling.
    * Deterministic (pure function of the edge SET; iteration order
    * cannot change a min).
    */
  private[ops] def localMinComponents(
      edges: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) {
        val next = parent.getOrElse(c, c); parent(c) = r; c = next
      }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  /** THE shared CC null contract, in one place for every formulation
    * (label-prop, star, incremental): a NULL id never appears in a
    * labeling (null is not an id), a NON-NULL id always does —
    * self-labeled when its only pair had a corrupt partner. Callers
    * first materialize the raw pair frame ONCE ([[rawPairFrame]]), then
    * derive both the merge-edge set ([[nonNullPairs]]) and the
    * observed-id set ([[nonNullEndpoints]]) from that checkpoint, so
    * the (often expensive — minhash/verify chains) upstream pair
    * derivation executes exactly once however many views a formulation
    * needs.
    */
  private def rawPairFrame(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a"), col("id_b")).transform(Materialize.checkpoint)

  private def nonNullPairs(raw: DataFrame): DataFrame =
    raw.where(col("id_a").isNotNull && col("id_b").isNotNull)

  private def nonNullEndpoints(raw: DataFrame): DataFrame =
    raw.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .where(col("id").isNotNull).distinct()

  /** Alternating large-star / small-star CC (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): each phase is one groupBy-min
    * plus one join on the EDGE set, and the edge set contracts toward
    * per-component stars in O(log²) phases REGARDLESS of component
    * diameter. Nothing larger than |edges| is ever materialized;
    * an eager [[graft.Materialize.checkpoint]] truncates lineage per phase. Costs ~3 shuffles per
    * phase (vs 1 for label propagation), which is why it is the fallback
    * for unbounded-diameter graphs rather than the default.
    */
  def connectedComponentsStar(
      pairs: DataFrame, maxRounds: Int = 30): DataFrame = {
    // One materialization of the upstream pair derivation; both the
    // canonical edge set and the node set read it (previously `nodes`
    // re-ran the caller's pair lineage after `edges` had already
    // materialized — twice the dominant cost for a direct caller with
    // an expensive candidate chain).
    val raw = rawPairFrame(pairs)
    // Node set remembered up front: star contraction erases isolated
    // structure, but every NON-NULL input node must appear in the
    // output (the shared CC null contract: null is not an id — without
    // the filter a half-null pair leaks a (null, null) row).
    // NOT materialized: single consumer (the final labeling join), and
    // its lineage is one explode+distinct over the already-checkpointed
    // `raw` — an eager checkpoint here was one extra job per CC call
    // for a frame nothing reads twice.
    val nodes = nonNullEndpoints(raw)

    // Per-round broadcast dispatch for the node-sized `mins` side of each
    // star join: node count ≤ 2×edge count, and the live edge count is
    // free from the previous round's signature — when it fits the gates
    // the join runs map-side against streaming edges (zero mins-side
    // Exchange; each exchange is its own AQE stage-job). Above the gates
    // the shuffle join returns — the standard size law.
    var edgeBound = 0L
    // fixed-width gate: see incrementalMergeParts' bcl — a forced hint
    // must never ride staticRowBytes' per-string constant for
    // variable-width id schemas (driver-OOM direction)
    def bcMins(mins: DataFrame): DataFrame =
      if (Joins.fixedWidth(mins) &&
          Joins.fitsBroadcast(pairs.sparkSession, 2L * edgeBound,
          Joins.staticRowBytes(mins))) broadcast(mins)
      else mins
    // large-star: every node u connects its STRICTLY LARGER neighbors to
    // m(u) = min(Γ(u) ∪ {u}); keeps (hi > lo) orientation by construction.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("_mv"))
        .select(col("u"), least(col("u"), col("_mv")).as("m"))
      sym.join(bcMins(mins), "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
    }
    // small-star: every node u connects its smaller neighbors (and itself)
    // to the minimum smaller neighbor.
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("hi").agg(min(col("lo")).as("m"))
      val viaNeighbors = e.join(bcMins(mins), "hi")
        .where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
      val self = mins.select(col("hi"), col("m").as("lo"))
      viaNeighbors.unionByName(self).distinct()
    }

    // Fixpoint = edge multiset unchanged across a full round, detected by
    // a (count, Σhash(hi), Σhash(lo), Σhash(hi,lo)) signature in ONE
    // aggregate over the just-checkpointed set (an exact except-based
    // check would cost two more shuffles per round; a 4-field signature
    // collision is vanishing and any miss would surface in the oracle
    // gate). Type-agnostic through xxhash64 like labelPropagation's
    // checksum: the earlier Σ(hi cast to decimal) THREW under ANSI on
    // STRING ids — the star pass is the fallback labelProp hands long
    // chains to, so string-keyed corpora lost exactly the path that
    // exists to save them.
    def signature(e: DataFrame): Seq[Any] =
      e.agg(count(lit(1)),
        sum(xxhash64(col("hi")).cast("decimal(38,0)")),
        sum(xxhash64(col("lo")).cast("decimal(38,0)")),
        sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")))
        .head().toSeq
    // The signature aggregate IS each round's forcing action
    // (checkpointIterativeForced): the retired eager-checkpoint-then-
    // signature shape paid two jobs per round plus a second scan of the
    // fresh blocks. The emptiness check rides the signature's count
    // field instead of a separate isEmpty job.
    val (edges0, sig0) = Materialize.checkpointIterativeForced(
      // Canonical (hi > lo) directed edges, self-loops dropped (a null
      // endpoint fails =!= and drops here — the shared CC null contract).
      raw.where(col("id_a") =!= col("id_b"))
        .select(greatest(col("id_a"), col("id_b")).as("hi"),
          least(col("id_a"), col("id_b")).as("lo"))
        .distinct())(signature)
    var edges = edges0
    var prev = sig0
    var round = 0
    var converged = prev.head == 0L
    while (!converged && round < maxRounds) {
      edgeBound = prev.head.asInstanceOf[Long]
      val (next, sig) = Materialize.checkpointIterativeForced(
        smallStar(largeStar(edges)))(signature)
      edges = next
      converged = sig == prev
      prev = sig
      round += 1
    }
    // Exiting without the fixpoint would emit one row per surviving
    // (hi, lo) edge for multi-edge nodes — duplicated, CONFLICTING
    // labels that a downstream incremental merge would fan out into the
    // persisted store with no diagnostic. Fail loudly instead; star
    // contraction needs O(log²) rounds, so hitting the cap means the
    // caller passed a tiny maxRounds, not a real graph.
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc-debug] star rounds=$round converged=$converged")
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not reach its fixpoint in " +
          s"$maxRounds rounds — raise maxRounds (star contraction " +
          "converges in O(log² n) rounds on any graph)")
    // At the fixpoint every edge is (member, componentMin); minima and
    // isolated nodes label themselves.
    nodes.join(edges.withColumnRenamed("hi", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("lo"), col("id")).as("component"))
  }

  /** Iterative min-label propagation CC: each round every node takes the
    * min of its own and its neighbors' labels; fixpoint in O(component
    * diameter) rounds — fine when components are known-short (near-dup
    * clusters), WRONG past `maxRounds` on longer ones. Exposed for specs
    * and A/B runs; [[connectedComponents]] uses it as the fast path and
    * falls back to the star pass when it reports non-convergence.
    */
  def connectedComponentsLabelProp(
      pairs: DataFrame, maxRounds: Int = 20): DataFrame =
    labelPropagation(pairs, maxRounds)._1

  /** Label-propagation core: returns (labels, converged, and the
    * internally checkpointed pair frame for callers that need a second
    * pass over the edges without re-materializing).
    */
  private[ops] def labelPropagation(
      pairs: DataFrame, maxRounds: Int): (DataFrame, Boolean, DataFrame) = {
    // One materialization of the (often expensive — minhash/verify
    // chains) pair derivation; the edge filter, the self-loop node set,
    // and the returned pair frame all read it. Null handling is the
    // shared CC contract ([[rawPairFrame]] and friends): without the
    // edge filter this path emits a spurious (null, label) row — the
    // null id forms its own group and adopts its non-null neighbor's
    // label — and without the separate node set a half-null pair's good
    // endpoint would vanish where the star pass keeps it.
    val raw = rawPairFrame(pairs)
    val p = nonNullPairs(raw)
    // Symmetrized edges PLUS a self-loop per node (from the UNFILTERED
    // non-null endpoint set, so degenerate-pair survivors stay): one
    // join+agg then gives min over {self} ∪ neighbors — no second join
    // against the previous labels. Materialized once; every round
    // reuses it.
    val sym = p.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(p.select(col("id_b").as("a"), col("id_a").as("b")))
    // counted checkpoint: the edge count sizes the local-solver dispatch
    // below at zero extra jobs
    val (edges, nEdges) = Materialize.checkpointCounted(sym
      .unionByName(nonNullEndpoints(raw)
        .select(col("id").as("a"), col("id").as("b")))
      .distinct())
    // Size-gated driver-side solve (the incrementalMergeParts precedent):
    // below the broadcast gates the LABEL table would ride a broadcast
    // join downstream anyway, and the edge set is within a factor ~2 of
    // it — so for integral ids the min-union-find runs once on the
    // collected (already-checkpointed) edges: identical labels (min
    // reachable id — pinned against the distributed passes in
    // ComponentsSpec), one collect job where the propagation loop paid
    // one join+agg+probe action per round. Above the gates, or for
    // non-integral ids (string ordering differs between JVM and
    // UTF8String for non-ASCII), the distributed loop runs unchanged.
    val integralIds = edges.schema.fields.forall(_.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    if (integralIds && fitsLocalSolve(
        pairs.sparkSession, nEdges, Joins.staticRowBytes(edges))) {
      val comp = localMinComponents(edges.collect().map(r =>
        (r.get(0).asInstanceOf[Number].longValue(),
          r.get(1).asInstanceOf[Number].longValue())))
      val idType = edges.schema("a").dataType
      def conv(v: Long): Any = idType match {
        case org.apache.spark.sql.types.LongType => v
        case org.apache.spark.sql.types.IntegerType => v.toInt
        case org.apache.spark.sql.types.ShortType => v.toShort
        case _ => v.toByte
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("component", idType)))
      val rows: java.util.List[org.apache.spark.sql.Row] =
        scala.jdk.CollectionConverters.SeqHasAsJava(
          comp.toSeq.sortBy(_._1).map { case (k, c) =>
            org.apache.spark.sql.Row(conv(k), conv(c)) }).asJava
      return (pairs.sparkSession.createDataFrame(rows, schema), true, p)
    }
    val labels0 = edges.select(col("a").as("id"))
      .distinct()
      .withColumn("component", col("id"))
    // Convergence = a round that changed NOTHING: the signature is
    // Σ xxhash64(id, component), equal across consecutive rounds iff the
    // label state is unchanged (w.h.p. — two different states colliding
    // on the sum is the ~2⁻⁶⁴ checksum trade). Type-agnostic on purpose:
    // the earlier Σ(component cast to decimal) silently returned null
    // for STRING ids (md5 digests, UUIDs — routine dedup keys), which
    // read as "converged before round one" and no-op'd the whole
    // clustering with every doc its own component. One cheap scan over
    // the just-materialized checkpoint, no extra shuffle.
    // The checksum aggregate IS each round's forcing action
    // (checkpointIterativeForced): eager-checkpoint-then-labelSum was
    // two jobs per round plus a second scan of the fresh blocks. The
    // init probe also returns the NODE COUNT (one extra agg field, no
    // extra job) — it sizes the per-round broadcast dispatch below.
    def labelProbe(df: DataFrame): (Long, Option[java.math.BigDecimal]) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("id"), col("component")).cast("decimal(38,0)")))
        .head()
      (r.getLong(0), Option(r.getDecimal(1)))
    }
    val (l0, (nNodes, s0)) =
      Materialize.checkpointIterativeForced(labels0)(labelProbe)
    var labels = l0
    var prevSum = s0
    var round = 0
    var converged = prevSum.isEmpty // empty edge set: trivially converged
    // The label frame is node-sized and fixed-width; when it fits the
    // broadcast gates the per-round join runs map-side against streaming
    // edges — zero label-side Exchange per round (each exchange is its
    // own AQE stage-job, so this halves the loop's job count). Above the
    // gates (web-scale graphs) the shuffle join returns — the dispatch
    // is the same size law as every other broadcast seam here.
    val bcLabels = Joins.fixedWidth(labels0) && Joins.fitsBroadcast(
      pairs.sparkSession, nNodes, Joins.staticRowBytes(labels0))
    while (!converged && round < maxRounds) {
      val lbl = labels.withColumnRenamed("id", "b")
        .withColumnRenamed("component", "_nl")
      val (next, (_, s)) = Materialize.checkpointIterativeForced(
        edges
          .join(if (bcLabels) broadcast(lbl) else lbl, Seq("b"))
          .groupBy(col("a").as("id"))
          .agg(min(col("_nl")).as("component")))(labelProbe)
      labels = next
      converged = s == prevSum
      prevSum = s
      round += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc-debug] labelProp rounds=$round converged=$converged")
    (labels, converged, p)
  }

  /** N-gram Jaccard near-dup pairs, bounded by a blocking key to avoid the
    * O(n²) cross product: only pairs sharing `blockCol` are compared.
    * Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingles.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int = 3, threshold: Double = 0.1): DataFrame = {
    // Set sizes ride along with each exploded shingle, so the whole
    // computation is: one (block, shingle) self-join emitting
    // co-occurrence rows, then one count per pair. Pair generation is a
    // distributed self-join, NOT a per-(block,shingle) collect_list —
    // a stop-word-like shingle inside one block would otherwise pull its
    // whole doc membership into a single task and fan out O(k²) pairs
    // there (hot-bucket failure at corpus scale); the join spreads that
    // pair space across the cluster.
    // Shingles are hashed to 64-bit before the distinct/shuffle: the
    // distinct then runs on a primitive array (Spark's string-array
    // array_distinct is O(n²) per row) and the shuffle key is 8 bytes
    // instead of an n-word string. A 64-bit collision inside one block
    // would off-by-one an intersection count; at ~10⁶ distinct shingles
    // per block that chance is ~10⁻⁸ — the standard shingle-hashing trade
    // (the exact-string variant is a one-line revert).
    val sh = Text.spread(docs)
      .select(col(idCol).as("_id"), col(blockCol).as("_blk"),
        array_distinct(transform(Text.shingles(col(textCol), n), s => xxhash64(s)))
          .as("_sharr"))
      .select(col("_id"), col("_blk"), size(col("_sharr")).as("_sz"),
        explode(col("_sharr")).as("_sh"))
      // Materialized once: the self-join would otherwise re-run the
      // tokenize+shingle+hash pass (the dominant cost) per join side.
      .transform(Materialize.checkpoint)
    val lhs = sh.select(col("_blk"), col("_sh"),
      col("_id").as("id_a"), col("_sz").as("_sza"))
    val rhs = sh.select(col("_blk"), col("_sh"),
      col("_id").as("id_b"), col("_sz").as("_szb"))
    val pairs = lhs.join(rhs, Seq("_blk", "_sh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("_sza"), col("id_b"), col("_szb"))
    pairs
      .groupBy("id_a", "id_b", "_sza", "_szb")
      .agg(count(lit(1)).as("_inter"))
      .withColumn("jaccard",
        round(col("_inter").cast("double") /
          (col("_sza") + col("_szb") - col("_inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Cross-document exact segment dedup — the ExactSubstr rule of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better") at fixed segment granularity; CCNet (Wenzek et al. 2019)
    * applies the same keep-first rule at paragraph granularity. Each
    * document is cut into consecutive non-overlapping `width`-token
    * segments (map-side: one `transform` over the token array — no
    * shuffle to segmentize); a segment INSTANCE survives iff it is the
    * corpus-first occurrence of its exact text (min (id, seg_id) —
    * deterministic, engine-portable); survivors are reassembled in
    * segment order. Documents whose every segment was shadowed — and
    * token-empty documents — come back with empty text and zero counts
    * via the final resurrection join, so the output is total over the
    * input corpus.
    *
    * Scale shape — two shuffles, both smaller than the corpus:
    * (1) segment instances groupBy (xxhash64(seg), seg) with a
    * map-side-partial `min` — duplicate instances combine BEFORE the
    * exchange, so the wire carries ~distinct classes, not all instances,
    * and a boilerplate segment duplicated a million times arrives at its
    * reducer as one pre-combined row per mapper instead of a million-row
    * hot key (a window formulation would shuffle every instance, could
    * not partial-agg, and concentrates exactly the most-duplicated —
    * i.e. most interesting — segments; the hash prefix makes the agg key
    * compare 8-byte integers first, and the full text stays in the key
    * so a collision cannot merge two classes); (2) the keepers — one row
    * per distinct segment, each knowing the (id, seg_id) where it
    * survives — regroup by doc for ordered reassembly (per-doc state
    * bounded by doc length). Totality costs no join: a map-side sentinel
    * row per doc (null seg, carrying the doc's segment count) unions
    * into shuffle 2, so fully-shadowed and token-empty docs still
    * produce output rows. No self-join, no candidate explosion: every
    * step is linear in corpus token count — the property that lets the
    * rule run on a 100 TB corpus where a suffix-array ExactSubstr pass
    * cannot.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      width: Int = 10): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val keepers = Text.spread(docs)
      .select(col(idCol), Text.tokens(col(textCol)).as("_ts"))
      .where(size(col("_ts")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), ((size(col("_ts")) - 1) / width).cast("int")),
          i => concat_ws(" ", slice(col("_ts"), i * width + 1, lit(width))))))
      .withColumnRenamed("pos", "seg_id")
      .withColumnRenamed("col", "seg")
      .groupBy(xxhash64(col("seg")).as("_h"), col("seg"))
      .agg(min(struct(col(idCol), col("seg_id"))).as("_k"))
      .select(col("_k")(idCol).as(idCol), col("_k")("seg_id").as("seg_id"),
        col("seg"), lit(0L).as("n_total"))
    val sentinels = docs
      .select(col(idCol), size(Text.tokens(col(textCol))).as("_n"))
      .select(col(idCol), lit(-1).as("seg_id"),
        lit(null).cast("string").as("seg"),
        when(col("_n") > 0, ((col("_n") - 1) / width).cast("long") + 1)
          .otherwise(0L).as("n_total"))
    keepers.union(sentinels)
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("seg").isNotNull,
              struct(col("seg_id"), col("seg"))))),
            s => s.getField("seg")),
          " ").as("text_dedup"),
        count(col("seg")).as("n_kept"),
        max(col("n_total")).as("n_total"))
  }
}
