package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavior pins for the daily-ingest curation composite
  * ([[Curation.curateIncremental]]): the one-batch ≡ batch-curate
  * equivalence, each documented sequencing delta on a planted two-batch
  * fixture (stored keepers never re-resolved, cross-batch exact dups
  * blocked, singleton-then-paired completeness, rolling quota), and
  * store convergence under different batch splits.
  */
class CurationIncrementalSpec extends graft.SparkSpec {

  import spark.implicits._

  // the CurationSpec template: 10+ words, one stopword, alphabetic
  private def doc(i: Int): String =
    s"the alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i " +
      s"hotel$i india$i juliet$i"

  private def near(i: Int): String = doc(i) + s" kilo$i"

  private val benchSpan =
    "benchmark sentence copied verbatim into the corpus document"

  private def bench() = Seq((1L, s"the $benchSpan")).toDF("doc_id", "text")

  private def wstore() = Text.winnowStore(bench(), "doc_id", "text")

  private def empty() = Curation.CurationStores.empty(spark, "source")

  private def run(batch: DataFrame, st: Curation.CurationStores,
      cap: Int = 10): (DataFrame, Curation.CurationStores) =
    Curation.curateIncremental(batch, wstore(), "doc_id", "text", "source",
      st, pplBuckets = 2, dropTailBuckets = 0, capPerSource = cap,
      numShards = 2)

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  test("ONE batch against empty stores ≡ the batch curate, row for row " +
    "(every sequencing delta vanishes)") {
    val corpus = Seq(
      (100L, doc(0), "s1"), (101L, doc(0), "s1"), // exact dup pair
      (102L, doc(2), "s1"), (103L, "x y", "s1"),  // gopher drop
      (104L, s"the kilo4 lima4 mike4 november4 oscar4 papa4 quebec4 " +
        s"romeo4 sierra4 $benchSpan", "s2"),      // contaminated
      (105L, doc(5), "s2"), (106L, near(5), "s2") // near-dup pair
    ).toDF("doc_id", "text", "source")
    val batchOut = Curation.curate(corpus, bench(), "doc_id", "text",
      "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
      numShards = 2)
    val (incOut, st) = run(corpus, empty())
    val b = batchOut.select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    val i = incOut.select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(i === b, s"one-batch fold must equal batch curate: $i vs $b")
    // the near-dup pair resolved: only one of {105, 106} survived
    assert(ids(incOut).intersect(Set(105L, 106L)).size === 1)
    // stores carry the batch: all kept digests, all exact survivors
    // labeled (singletons included), cap counts = admitted per source
    assert(st.digests.count() === 5) // 6 gopher-kept, one duplicate digest
    assert(st.labels.select("id").as[Long].collect().toSet ===
      ids(incOut) ++ Set(104L) ++ // 104 passes dedup, drops at winnow
      Set(105L, 106L)) // both near-dups are labeled, one admitted
    // admitted per source: s1 {100, 102}; s2 {105-or-106} (104 dropped
    // at decontamination, before the cap)
    val counts = st.capCounts.select("source", "n_kept")
      .as[(String, Long)].collect().toMap
    assert(counts === Map("s1" -> 2L, "s2" -> 1L), s"got $counts")
  }

  test("two batches: cross-batch exact dup blocked; a BETTER near-dup of " +
    "a shipped keeper is dropped (stored keepers never re-resolved — the " +
    "pinned delta vs batch curate); singleton-then-paired completeness; " +
    "fresh in-batch cluster admits its best member") {
    val a = Seq(
      (100L, doc(0), "s1"),
      (101L, doc(1), "s1"),
      (102L, doc(2), "s2")
    ).toDF("doc_id", "text", "source")
    val b = Seq(
      (200L, doc(0), "s1"),  // exact dup of shipped 100 → blocked
      (201L, near(1), "s1"), // near-dup of shipped 101, LONGER (higher
                             // quality) → still blocked
      (205L, near(2), "s2"), // near-dup of 102, which was an UNPAIRED
                             // singleton in batch A → blocked only if the
                             // label store kept singletons
      (203L, doc(3), "s2"), (204L, near(3), "s2") // fresh cluster: best kept
    ).toDF("doc_id", "text", "source")

    // the planted near-dups really are banding candidates (else the
    // blocked-cluster assertions would pass vacuously)
    val pairSet = Dedup.minhashCandidatePairs(
        a.unionByName(b), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairSet.contains((101L, 201L)) && pairSet.contains((102L, 205L))
      && pairSet.contains((203L, 204L)), s"fixture pairs missing: $pairSet")
    // 201 outranks 101 on quality — the case batch curate resolves the
    // other way
    val q = a.unionByName(b)
      .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(201L) > q(101L), s"fixture must plant a better newcomer: $q")

    val (outA, stA) = run(a, empty())
    assert(ids(outA) === Set(100L, 101L, 102L))
    val (outB, stB) = run(b, stA)
    val freshKeeper = if (q(204L) > q(203L)) 204L else 203L
    assert(ids(outB) === Set(freshKeeper),
      s"only the fresh cluster's keeper is admitted: ${ids(outB)}")
    // the batch curate over A∪B re-resolves the keeper to the better 201
    // — the documented difference between the daily fold and the
    // periodic batch re-run
    val batchIds = ids(Curation.curate(a.unionByName(b), bench(), "doc_id",
      "text", "source", pplBuckets = 2, dropTailBuckets = 0,
      capPerSource = 10, numShards = 2))
    assert(batchIds.contains(201L) && !batchIds.contains(101L),
      s"batch re-run keeps the better newcomer: $batchIds")
    // store convergence: every dedup-PROCESSED doc (exact survivor) is
    // labeled exactly once, and components match the from-scratch CC
    // over the exact survivors' candidate pairs (200 never reaches
    // banding — its digest was blocked)
    val gotLabels = stB.labels.select("id", "component")
      .as[(Long, Long)].collect().groupBy(_._2).values
      .map(_.map(_._1).toSet).toSet
    val survivors = a.unionByName(b).where(col("doc_id") =!= 200L)
    val wantPaired = Dedup.connectedComponents(
        Dedup.minhashCandidatePairs(survivors, "doc_id", "text"))
      .select("id", "component").as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(gotLabels.filter(_.size > 1) === wantPaired.filter(_.size > 1),
      s"multi-doc components must match from-scratch CC: $gotLabels")
    assert(
      gotLabels.toSeq.flatten.sorted ===
        Seq(100L, 101L, 102L, 201L, 203L, 204L, 205L),
      s"every dedup-processed doc is labeled exactly once: $gotLabels")
    assert(gotLabels.contains(Set(100L)),
      "the untouched batch-A singleton keeps its self-label")
  }

  test("rolling per-source quota: earlier batches claim first; a full " +
    "source admits nothing later") {
    val a = Seq((100L, doc(0), "s1"), (101L, doc(1), "s1"))
      .toDF("doc_id", "text", "source")
    val b = Seq((200L, doc(8), "s1"), (201L, doc(9), "s2"))
      .toDF("doc_id", "text", "source")
    val (outA, stA) = run(a, empty(), cap = 2)
    assert(ids(outA) === Set(100L, 101L))
    val (outB, stB) = run(b, stA, cap = 2)
    assert(ids(outB) === Set(201L), s"s1 quota is spent: ${ids(outB)}")
    val counts = stB.capCounts.select("source", "n_kept")
      .as[(String, Long)].collect().toMap
    assert(counts === Map("s1" -> 2L, "s2" -> 1L))
  }

  test("store convergence property: ANY batch split converges the stores " +
    "— split-independent digest set, one label per exact survivor, one " +
    "admitted doc per content cluster, cap counts = total admitted") {
    val corpus = Seq(
      (1L, doc(0), "s1"), (2L, doc(0), "s1"),  // exact dup pair
      (3L, doc(1), "s1"), (4L, near(1), "s1"), // near-dup pair
      (5L, doc(2), "s2"), (6L, doc(3), "s2"),
      (7L, near(3), "s2"), (8L, doc(4), "s2"),
      (9L, "x", "s2"),                          // gopher drop
      (10L, doc(5), "s3"), (11L, doc(5), "s3"), // exact dup pair
      (12L, doc(6), "s3")
    ).toDF("doc_id", "text", "source")
    // content clusters among gopher-kept texts: {doc0}, {doc1,near1},
    // {doc2}, {doc3,near3}, {doc4}, {doc5}, {doc6} → 7 admitted docs,
    // and the 4 singleton-content docs {5, 8, 12, keeper-of-doc0/doc5}
    // have split-independent admitted CONTENT
    def fold(splits: Seq[DataFrame]): (Set[Long], Long, Set[String], Long) = {
      var st = empty()
      var admitted = Set.empty[Long]
      splits.foreach { b =>
        val (out, st2) = run(b, st)
        val newIds = ids(out)
        assert(newIds.intersect(admitted).isEmpty,
          "a doc is admitted at most once across batches")
        admitted ++= newIds; st = st2
      }
      val digests = st.digests.as[String].collect()
      assert(digests.length === digests.distinct.length,
        "a digest enters the store exactly once")
      val capTotal = st.capCounts.agg(sum("n_kept")).as[Long].head()
      (admitted, st.labels.count(), digests.toSet, capTotal)
    }
    val base = fold(Seq(corpus))
    val splits = Seq(
      Seq(pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1),
      (0 until 3).map(k => pmod(col("doc_id"), lit(3)) === k),
      Seq(col("doc_id") <= 6, col("doc_id") > 6))
    splits.foreach { preds =>
      val (adm, nLabels, digs, capTotal) = fold(preds.map(corpus.where))
      assert(digs === base._3, "digest store is split-independent")
      assert(nLabels === base._2,
        "one label per exact survivor (= per distinct digest)")
      assert(adm.size === base._1.size,
        s"one admitted doc per content cluster: $adm vs ${base._1}")
      assert(capTotal === adm.size.toLong)
      // singleton-content admissions are identical whatever the split
      val singletonContent = Set(5L, 8L, 12L)
      assert(adm.intersect(singletonContent) === singletonContent,
        s"split-independent singleton admissions: $adm")
    }
  }

  test("semantic arm rides the fold: per-batch screening against the " +
    "fixed benchmark embeddings drops the planted near-benchmark doc in " +
    "ITS batch; docs without embeddings pass; union ≡ batch-level screen") {
    val a = Seq((100L, doc(0), "s1"), (102L, doc(2), "s1"))
      .toDF("doc_id", "text", "source")
    val b = Seq((201L, doc(4), "s1"), (203L, doc(6), "s1"))
      .toDF("doc_id", "text", "source")
    val emb = Seq(
      (102L, Array(1.0f, 0.0f)), // batch A: near the benchmark → drop
      (201L, Array(0.9f, 0.1f)), // batch B: near → drop in ITS batch
      (100L, Array(0.0f, 1.0f))  // far → keep; 203 has no embedding
    ).toDF("doc_id", "embedding")
    val benchEmb = Seq((1L, Array(1.0f, 0.1f))).toDF("doc_id", "embedding")
    val sem = Some(Curation.Semantic(emb, benchEmb, threshold = 0.7))
    def runSem(batch: DataFrame, st: Curation.CurationStores) =
      Curation.curateIncremental(batch, wstore(), "doc_id", "text",
        "source", st, pplBuckets = 2, dropTailBuckets = 0,
        capPerSource = 10, numShards = 2, semantic = sem)
    val (outA, stA) = runSem(a, empty())
    assert(ids(outA) === Set(100L), s"batch A screens 102: ${ids(outA)}")
    val (outB, _) = runSem(b, stA)
    assert(ids(outB) === Set(203L), s"batch B screens 201: ${ids(outB)}")
    // union equals the batch chain's semantic screen over the union
    val batchIds = ids(Curation.curate(a.unionByName(b), bench(), "doc_id",
      "text", "source", pplBuckets = 2, dropTailBuckets = 0,
      capPerSource = 10, numShards = 2, semantic = sem))
    assert(ids(outA) ++ ids(outB) === batchIds)
  }

  test("fixed ppl model: batch 1 bootstraps LM + thresholds and batch 2 " +
    "bands against THEM (not its own quantiles); the model rides the " +
    "store unchanged") {
    val a = Seq((100L, doc(0), "s1"), (101L, doc(1), "s1"),
      (102L, doc(2), "s1")).toDF("doc_id", "text", "source")
    val b = Seq((200L, doc(7), "s1")).toDF("doc_id", "text", "source")
    val (_, stA) = run(a, empty())
    assert(stA.ppl.isDefined, "bootstrap must ship a model")
    val (_, stB) = run(b, stA)
    // the model is the SAME artifact, not retrained on batch 2
    assert(stB.ppl.get eq stA.ppl.get)
    // batch 2's doc is OOV vs batch 1's LM → floor-scored, strictly
    // below every batch-1 score
    val scored = Text.bigramLogProbAgainst(b, "doc_id", "text",
      stA.ppl.get.lm)
    val s200 = scored.select("logprob").as[Double].head()
    val minA = Text.bigramLogProb(a, "doc_id", "text")
      .agg(min("logprob")).as[Double].head()
    assert(s200 < minA, s"OOV text must floor below the corpus: $s200 >= $minA")
  }
}
