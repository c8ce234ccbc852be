package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    * `numHashes`.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleArr,
        s => md5(concat(lit(s"$seed:"), s).cast("binary"))))
    }: _*)

  /** MinHash + LSH banding: candidate near-duplicate pairs.
    *
    * numHashes minhashes split into bands of `rowsPerBand`; docs sharing any
    * full band collide. Output: distinct (id_a, id_b) with id_a < id_b.
    */
  def minhashCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // Staged projections so each expensive array is computed exactly once
    // per row (CollapseProject keeps multiply-referenced non-cheap aliases
    // in their own stage); a single inline expression would re-derive the
    // tokenization once per seed.
    val banded = docs
      // no array_distinct: min-over-shingles is unaffected by duplicates,
      // and Spark's array_distinct on string arrays is O(n²) per row.
      .select(col(idCol).as("_id"),
        Text.shingles(col(textCol), shingleSize).as("_sh"))
      .select(col("_id"), minhashSignature(col("_sh"), numHashes).as("_sig"))
      .select(col("_id"), explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("|", slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand))
            .as("key"))
      }: _*)).as("_band"))
      .select(col("_id"), col("_band.band").as("_bno"), col("_band.key").as("_bkey"))
    // One shuffle: group bucket members, emit pairs in-bucket. The corpus is
    // hashed+banded in a single pass (no self-join that would recompute the
    // signatures, and no second shuffle of the full banded set).
    banded
      .groupBy("_bno", "_bkey")
      .agg(sort_array(collect_set(col("_id"))).as("_ids"))
      .where(size(col("_ids")) > 1)
      .select(explode(flatten(transform(col("_ids"), (a, i) =>
        transform(slice(col("_ids"), i + lit(2), size(col("_ids"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("_p"))
      .select(col("_p.id_a"), col("_p.id_b"))
      .distinct()
  }

  /** Portable SimHash (16-bit variant): for hex digit position j of
    * md5(token), the digit's value >= 8 votes +1 on plane j, else -1; bit j
    * set iff the vote sum is positive. Engine-portable (md5 + substring),
    * mirrored exactly by the DuckDB oracle.
    */
  def simhash16(text: Column): Column = {
    val ts = Text.tokens(lower(text))
    val digests = transform(ts, t => md5(t.cast("binary")))
    val bits = (0 until 16).map { j =>
      val votes = aggregate(
        digests,
        lit(0),
        (acc, d) => acc + when(
          // hex digit >= '8': chars 8,9,a..f sort after '7'
          substring(d, j + 1, 1) >= "8", lit(1)).otherwise(lit(-1)))
      when(votes > 0, lit(1L << (15 - j))).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Per-bit vote vector for a 64-bit simhash: votes(j) = Σ over tokens of
    * ±1, where the sign is bit (j%4) of hex digit (j/4 + 1) of md5(token).
    * Digests are computed once per token in their own transform pass (a
    * lambda that recomputed md5 per bit would cost 64× the digests); the
    * bit index is a plan-time constant, so each vote is a literal-position
    * substring + an 8-way IN. Callers must materialize this vector in its
    * own projection before fanning it out — `votesToSimhash64` references
    * it 64 times.
    */
  def simhash64Votes(text: Column): Column = {
    // Constant-folded 16×4 lookup: hex value v → its per-bit ±1 votes.
    // Indexing through it keeps the generated code small — a 64-way IN
    // cascade made whole-stage codegen compile a pathological method.
    val votesTable = array((0 until 16).map(v =>
      array((0 until 4).map(b =>
        lit(if (((v >> b) & 1) == 1) 1 else -1)): _*)): _*)
    // one md5 + one 16-char split per token
    val digests = transform(Text.tokens(lower(text)),
      t => slice(split(md5(t.cast("binary")), ""), 1, 16))
    aggregate(digests, array_repeat(lit(0), 64),
      (acc, d) => zip_with(acc,
        flatten(transform(d, c => {
          val a = ascii(c)
          val idx = when(a <= 57, a - 48).otherwise(a - 87) // '0'..'9', 'a'..'f'
          element_at(votesTable, (idx + 1).cast("int"))
        })),
        (a, b) => a + b))
  }

  /** Fold a materialized 64-vote vector into the simhash value (bit j set
    * iff votes(j) > 0; bit 63 lands in the sign bit — it's a bit pattern,
    * assembled with OR so no arithmetic overflow semantics apply).
    */
  def votesToSimhash64(votes: Column): Column =
    (0 until 64).map { j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

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
  def simhashNearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole covers hamming <= 3")
    // Hashes materialized once (16 bytes/row) — a self-join that
    // recomputed the vote aggregate per side would double the dominant
    // cost; pair generation is a distributed band self-join rather than a
    // per-bucket collect (see cosineNearDupPairs for the rationale).
    val hashed = docs
      .select(col(idCol).as("_id"), simhash64Votes(col(textCol)).as("_votes"))
      .select(col("_id"), votesToSimhash64(col("_votes")).as("_h"))
      .localCheckpoint(true)
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

  /** Connected components over an undirected candidate-pair graph
    * (`(id_a, id_b)` rows): assigns every node the minimum id reachable
    * from it — the canonical "dedup cluster" resolution step after any
    * candidate generator (minhash/simhash/embedding pairs).
    *
    * Iterative min-label propagation: each round every node takes the min
    * of its own label and its neighbors' labels; fixpoint in O(component
    * diameter) rounds. Near-dup components are short chains (diameter ≪
    * 20), so the round count stays small at any corpus size; each round is
    * one join + one aggregate on the EDGE set — never materializes
    * anything larger than |edges|. `localCheckpoint` truncates lineage per
    * round (same discipline as Closure.transitiveClosure). This is the
    * two-phase "large-star/small-star" algorithm's simpler cousin —
    * adequate while diameters stay small, and the oracle-comparable one.
    */
  def connectedComponents(
      pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionByName(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("a").as("id"))
      .distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = true
    var round = 0
    while (changed && round < maxRounds) {
      val next = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("component", "_nl"),
          Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("_nl")).as("_min_n"))
        .join(labels, Seq("id"))
        .select(col("id"), least(col("component"), col("_min_n")).as("component"))
        .localCheckpoint(true)
      changed = !next.join(labels, Seq("id", "component"), "left_anti").isEmpty
      labels = next
      round += 1
    }
    labels
  }

  /** N-gram Jaccard near-dup pairs, bounded by a blocking key to avoid the
    * O(n²) cross product: only pairs sharing `blockCol` are compared.
    * Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingles.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int = 3, threshold: Double = 0.1): DataFrame = {
    // Set sizes ride along with each exploded shingle, so the whole
    // computation is two shuffles: group docs per (block, shingle) and
    // emit co-occurrence pairs in-bucket, then count per pair. The
    // previous shape (shingle self-join + two size joins) read the
    // shingle projection twice and shuffled five times.
    // Shingles are hashed to 64-bit before the distinct/shuffle: the
    // distinct then runs on a primitive array (Spark's string-array
    // array_distinct is O(n²) per row) and the shuffle key is 8 bytes
    // instead of an n-word string. A 64-bit collision inside one block
    // would off-by-one an intersection count; at ~10⁶ distinct shingles
    // per block that chance is ~10⁻⁸ — the standard shingle-hashing trade
    // (the exact-string variant is a one-line revert).
    val sh = docs
      .select(col(idCol).as("_id"), col(blockCol).as("_blk"),
        array_distinct(transform(Text.shingles(col(textCol), n), s => xxhash64(s)))
          .as("_sharr"))
      .select(col("_id"), col("_blk"), size(col("_sharr")).as("_sz"),
        explode(col("_sharr")).as("_sh"))
    val pairs = sh
      .groupBy("_blk", "_sh")
      .agg(sort_array(collect_list(struct(col("_id"), col("_sz")))).as("_m"))
      .where(size(col("_m")) > 1)
      .select(explode(flatten(transform(col("_m"), (a, i) =>
        transform(slice(col("_m"), i + lit(2), size(col("_m"))),
          b => struct(
            a.getField("_id").as("id_a"), a.getField("_sz").as("_sza"),
            b.getField("_id").as("id_b"), b.getField("_sz").as("_szb"))))))
        .as("_p"))
      .select(col("_p.id_a"), col("_p._sza"), col("_p.id_b"), col("_p._szb"))
    pairs
      .groupBy("id_a", "id_b", "_sza", "_szb")
      .agg(count(lit(1)).as("_inter"))
      .withColumn("jaccard",
        round(col("_inter").cast("double") /
          (col("_sza") + col("_szb") - col("_inter")).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
