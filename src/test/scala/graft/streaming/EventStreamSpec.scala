package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, value: Double)

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, 1.5),
    Ev(2, ts("2024-01-01 10:55:00"), 1, 2.5),
    Ev(3, ts("2024-01-01 11:05:00"), 1, 4.0),
    Ev(4, ts("2024-01-01 10:30:00"), 2, 8.0))

  test("hourlyAgg on batch: tumbling hour windows per user") {
    val out = EventStream.hourlyAgg(batch.toDF())
      .orderBy("user_id", "hour_start").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Timestamp]("hour_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Long]("n_events") == 2)
    assert(first.getAs[Double]("sum_value") == 4.0)
  }

  test("funnel: greedy earliest-match chain per user, step windows " +
    "enforced, boundary semantics (> prev, <= prev + window) pinned") {
    def ev(id: Long, t: String, user: Long, tp: String) =
      (id, ts(t), user, tp)
    val events = Seq(
      // user 1: full chain inside the windows
      ev(1, "2024-01-01 10:00:00", 1, "signup"),
      ev(2, "2024-01-01 10:30:00", 1, "click"),
      ev(3, "2024-01-01 10:45:00", 1, "purchase"),
      // user 2: click exactly AT signup ts → excluded (strict >); the
      // later click opens the chain, purchase lands exactly at the
      // window bound → included (<=)
      ev(4, "2024-01-01 09:00:00", 2, "signup"),
      ev(5, "2024-01-01 09:00:00", 2, "click"),
      ev(6, "2024-01-01 10:00:00", 2, "click"),
      ev(7, "2024-01-01 11:00:00", 2, "purchase"),
      // user 3: the documented GREEDY undercount — the earliest click
      // (10:01) is matched, so the purchase 90m later misses ITS window,
      // even though chaining via the 11:00 click would have reached it
      ev(8, "2024-01-01 10:00:00", 3, "signup"),
      ev(9, "2024-01-01 10:01:00", 3, "click"),
      ev(10, "2024-01-01 11:00:00", 3, "click"),
      ev(11, "2024-01-01 11:45:00", 3, "purchase"),
      // user 4: purchase BEFORE any click → chain stops at signup+click
      ev(12, "2024-01-01 10:00:00", 4, "purchase"),
      ev(13, "2024-01-01 10:10:00", 4, "signup"),
      ev(14, "2024-01-01 10:20:00", 4, "click"),
      // user 5: never signs up → reaches nothing
      ev(15, "2024-01-01 10:00:00", 5, "click"),
      ev(16, "2024-01-01 10:05:00", 5, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStream.funnel(
      events, Seq("signup", "click", "purchase"), window = "1 hour")
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "signup", 4L),   // users 1–4 (user 5 never signs up)
      (2, "click", 4L),    // users 1–4 each click inside their window
      (3, "purchase", 2L))) // users 1, 2 — user 3 is the greedy
                            // undercount, user 4 purchased before clicking
  }

  test("funnel window modes: whole-funnel deadline is stricter than " +
    "per-step; malformed/non-positive windows fail loudly up front") {
    val events = Seq(
      // chain legal per-step but step 3 lands past first-match + 1h
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup"),
      (2L, ts("2024-01-01 10:50:00"), 1L, "click"),
      (3L, ts("2024-01-01 11:50:00"), 1L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val steps = Seq("signup", "click", "purchase")
    def reached(whole: Boolean): Seq[Long] =
      EventStream.funnel(events, steps, "1 hour",
        wholeFunnelWindow = whole)
        .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(reached(whole = false) === Seq(1L, 1L, 1L))
    assert(reached(whole = true) === Seq(1L, 1L, 0L),
      "whole-funnel mode must cut the chain at first-match + window")
    val bad = intercept[IllegalArgumentException] {
      EventStream.funnel(events, steps, "24h")
    }
    assert(bad.getMessage.contains("funnel"), bad.getMessage)
    val neg = intercept[IllegalArgumentException] {
      EventStream.funnel(events, steps, "-1 hours")
    }
    assert(neg.getMessage.contains("positive"), neg.getMessage)
    val cal = intercept[IllegalArgumentException] {
      EventStream.funnelStateful(
        spark.emptyDataset[EventStream.FunnelEvIn], steps, "1 month")
    }
    assert(cal.getMessage.contains("fixed-length"), cal.getMessage)
  }

  test("funnelStateful: MemoryStream micro-batches agree with the batch " +
    "funnel's per-step user counts, in both window modes") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("signup", "click", "purchase")
    def ev(t: String, user: Long, tp: String) =
      EventStream.FunnelEvIn(user, ts(t), tp)
    // the batch fixture's users (greedy undercount, boundary cases)
    // split across two micro-batches at a per-user-coherent cut
    val batch1 = Seq(
      ev("2024-01-01 10:00:00", 1, "signup"),
      ev("2024-01-01 10:30:00", 1, "click"),
      ev("2024-01-01 09:00:00", 2, "signup"),
      ev("2024-01-01 09:00:00", 2, "click"), // strict >: excluded
      ev("2024-01-01 10:00:00", 3, "signup"),
      ev("2024-01-01 10:01:00", 3, "click"))
    val batch2 = Seq(
      ev("2024-01-01 10:45:00", 1, "purchase"),
      ev("2024-01-01 10:00:00", 2, "click"),
      ev("2024-01-01 11:00:00", 2, "purchase"), // at window bound: kept
      ev("2024-01-01 11:00:00", 3, "click"),    // greedy: already matched
      ev("2024-01-01 11:45:00", 3, "purchase")) // misses earliest click's
    val all = (batch1 ++ batch2)
      .map(e => (0L, e.ts, e.user_id, e.event_type))
      .toDF("event_id", "ts", "user_id", "event_type")
    for (whole <- Seq(false, true)) {
      val input = MemoryStream[EventStream.FunnelEvIn]
      val name = s"funnel_twin_$whole"
      val q = EventStream.funnelStateful(input.toDS(), steps, "1 hour",
          wholeFunnelWindow = whole)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(batch1: _*); q.processAllAvailable()
        input.addData(batch2: _*); q.processAllAvailable()
        val streamed = spark.table(name).groupBy("step")
          .agg(countDistinct("user_id").as("n_users"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val batch = EventStream.funnel(all, steps, "1 hour",
            wholeFunnelWindow = whole)
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
          .filter(_._2 > 0)
        assert(streamed === batch,
          s"stateful twin (whole=$whole) must agree: $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("curateStream: micro-batches fold through the persisted stores " +
    "and reproduce the sequential curateIncremental folds; a replayed " +
    "batch is content-blocked (no duplication); torn-version residue " +
    "above the live token is discarded") {
    implicit val sqlCtx = spark.sqlContext
    def doc(i: Int): String =
      s"the alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i " +
        s"hotel$i india$i juliet$i"
    val bench = Seq((1L, "the benchmark sentence copied verbatim into " +
      "the corpus document")).toDF("doc_id", "text")
    val ws = graft.ops.Text.winnowStore(bench, "doc_id", "text")
    val b1 = Seq((100L, doc(0), "s1"), (101L, doc(0), "s1"),
      (102L, doc(2), "s1"))
    val b2 = Seq((200L, doc(0), "s1"), (201L, doc(4), "s2"))
    val root = java.nio.file.Files.createTempDirectory("graft_curst").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_curck").toString
    val input = MemoryStream[(Long, String, String)]
    val q = EventStream.curateStream(
      input.toDS().toDF("doc_id", "text", "source"), ws, root, ckpt,
      pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10, numShards = 2)
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$root/out")
    val got = out.select("doc_id", "batch")
      .as[(Long, Long)].collect().toMap
    // sequential twin: same two batches through in-session folds
    var st = graft.ops.Curation.CurationStores.empty(spark, "source")
    var want = Map.empty[Long, Long]
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      val (o, st2) = graft.ops.Curation.curateIncremental(
        b.toDF("doc_id", "text", "source"), ws, "doc_id", "text", "source",
        st, pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
        numShards = 2, metricsTag = s"curst_twin_$i")
      want ++= o.select("doc_id").as[Long].collect().map(_ -> i.toLong)
      st = st2
    }
    assert(got === want, s"stream ≡ sequential folds: $got vs $want")
    // cross-batch dedup really happened through the persisted stores
    assert(!got.contains(200L), "200 is an exact dup of shipped 100")
    val nDigests = spark.read.parquet(s"$root/digests").count()

    // torn residue: a crashed fold left version-3 dirs but no live token
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(1).selectExpr("'garbage' AS digest")
      .write.parquet(s"$root/digests/b=2")
    spark.range(1).selectExpr("id AS x").write.parquet(s"$root/labels/v=2")
    // replay of batch 2 (e.g. a restart re-feeding data): the residue is
    // cleaned, and every doc is content-blocked by its own absorbed
    // digest — nothing is admitted twice
    EventStream.curateFoldBatch(
      b2.toDF("doc_id", "text", "source"), ws, root, "doc_id", "text",
      "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
      numShards = 2)
    val replayed = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect()
    assert(replayed.sorted.toSeq === got.keys.toSeq.sorted,
      s"replay must admit nothing new: ${replayed.toSeq}")
    assert(spark.read.parquet(s"$root/digests").count() === nDigests,
      "replayed digests are blocked, garbage residue discarded")
    // the live version advanced and exactly one labels version remains
    val lives = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_live_"))
    assert(lives.contains("_live_2"), lives.mkString(","))
    val labelVersions = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/labels/v=*"))
      .map(_.getPath.getName).toSeq
    assert(labelVersions === Seq("v=2"), labelVersions.mkString(","))
    // the fixed ppl model was written once (its bootstrap version), not
    // rewritten per batch
    val pplVersions = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/ppl_lm/v=*"))
      .map(_.getPath.getName).toSeq
    assert(pplVersions === Seq("v=0"), pplVersions.mkString(","))

    // compaction folds the per-batch append dirs into one and the next
    // fold behaves identically on the compacted store
    EventStream.compactCurationStores(spark, root)
    val digestDirs = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/digests/b=*"))
      .map(_.getPath.getName).toSeq
    assert(digestDirs.length === 1, digestDirs.mkString(","))
    assert(spark.read.parquet(s"$root/digests").count() === nDigests,
      "compaction preserves the digest set")
    val b3 = Seq((300L, doc(0), "s3"), (301L, doc(8), "s3"))
    EventStream.curateFoldBatch(
      b3.toDF("doc_id", "text", "source"), ws, root, "doc_id", "text",
      "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
      numShards = 2)
    val after = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().toSet
    assert(after === got.keySet + 301L,
      s"fold on the compacted store: 300 exact-blocks, 301 admits: $after")
  }

  test("curateStream with SHARDED labels: O(touched-shard) label writes " +
    "reproduce the versioned-store admissions exactly — including " +
    "singleton-then-paired blocking through the store — and the " +
    "post-commit catch-up refolds idempotently after a lost token") {
    implicit val sqlCtx = spark.sqlContext
    def doc(i: Int): String =
      s"the alpha$i bravo$i charlie$i delta$i echo$i foxtrot$i golf$i " +
        s"hotel$i india$i juliet$i"
    val bench = Seq((1L, "the benchmark sentence copied verbatim into " +
      "the corpus document")).toDF("doc_id", "text")
    val ws = graft.ops.Text.winnowStore(bench, "doc_id", "text")
    val b1 = Seq((100L, doc(0), "s1"), (101L, doc(1), "s1"),
      (102L, doc(2), "s2"))
    // 201 near-dups the SINGLETON 101; 202 exact-dups 100; 203 fresh
    val b2 = Seq((201L, doc(1) + " kilo1", "s1"), (202L, doc(0), "s1"),
      (203L, doc(3), "s2"))
    def runBoth(sharded: Option[Int]): (Set[Long], String) = {
      val root = java.nio.file.Files
        .createTempDirectory("graft_cursh").toString
      Seq(b1, b2).foreach { b =>
        EventStream.curateFoldBatch(
          b.toDF("doc_id", "text", "source"), ws, root, "doc_id", "text",
          "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
          numShards = 2, shardedLabels = sharded)
      }
      (spark.read.parquet(s"$root/out").select("doc_id")
        .as[Long].collect().toSet, root)
    }
    val (plain, _) = runBoth(None)
    val (sharded, root) = runBoth(Some(4))
    assert(sharded === plain, s"label seams must agree: $sharded vs $plain")
    assert(!sharded.contains(201L) && !sharded.contains(202L),
      s"near-dup of a shipped singleton and the exact dup must block: $sharded")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the edges logs are retired once folded; the sharded store exists
    assert(fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$root/edges/b=*")).isEmpty,
      "folded edges logs must be retired")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/labels_sharded")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/labels")),
      "no versioned label dir in sharded mode")
    // crash-sim: lose the newest _folded_ token AND replant the edges
    // log (as if the crash hit between the fold and the token) — the
    // next fold's catch-up refolds idempotently and admissions stand
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath).filter(_.getName == "_folded_1")
      .foreach(p => fs.delete(p, false))
    val (_, _, delta) = graft.ops.Curation.curateIncrementalWithDelta(
      b2.toDF("doc_id", "text", "source"), ws, "doc_id", "text", "source",
      graft.ops.Curation.CurationStores.empty(spark, "source"),
      pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
      numShards = 2, metricsTag = "cursh_replant")
    delta.newEdges.write.mode("overwrite").parquet(s"$root/edges/b=1")
    val b3 = Seq((300L, doc(5), "s3"))
    EventStream.curateFoldBatch(
      b3.toDF("doc_id", "text", "source"), ws, root, "doc_id", "text",
      "source", pplBuckets = 2, dropTailBuckets = 0, capPerSource = 10,
      numShards = 2, shardedLabels = Some(4))
    val after = spark.read.parquet(s"$root/out").select("doc_id")
      .as[Long].collect().toSet
    assert(after === plain + 300L,
      s"refolded edges must not change admissions: $after")
  }

  test("hourlyAgg incrementalizes: same results via MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.hourlyAgg(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .orderBy("user_id", "hour_start").collect()
      val batched = EventStream.hourlyAgg(batch.toDF())
        .orderBy("user_id", "hour_start").collect()
      assert(streamed.toSeq == batched.toSeq)
    } finally q.stop()
  }

  test("binQuantize streams unchanged: per-micro-batch codes are " +
    "bit-identical to one batch encode (no codebook, no state — the " +
    "trivially-exact-incremental claim pinned)") {
    implicit val sqlCtx = spark.sqlContext
    val dim = 32
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 9L).map(i =>
      (i, Seq.fill(dim)((rnd.nextInt(5) - 2) * (rnd.nextFloat() + 0.1f))))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.ops.Similarity.binQuantize(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", dim)
      .writeStream.format("memory").queryName("bincodes")
      .outputMode("append").start()
    try {
      // three micro-batches — the encode is a pure per-row projection,
      // so the streamed artifact must equal the one-shot batch encode
      vecs.grouped(3).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val streamed = spark.table("bincodes")
        .select("vec_id", "bin_code").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batched = graft.ops.Similarity.binQuantize(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", dim)
        .select("vec_id", "bin_code").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batched)
    } finally q.stop()
  }

  test("runningCount: cumulative per-user ordered by event time") {
    val out = EventStream.runningCount(batch.toDF())
      .orderBy("event_id").select("running_n").as[Long].collect()
    assert(out.toSeq == Seq(1, 2, 3, 1))
  }

  test("sessionize: events within the gap merge, session end = last + gap") {
    // user 1: 10:05 and 10:55 merge (50min < 60min gap); 12:30 is separate
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, 0),
      Ev(2, ts("2024-01-01 10:55:00"), 1, 0),
      Ev(3, ts("2024-01-01 12:30:00"), 1, 0),
      Ev(4, ts("2024-01-01 10:30:00"), 2, 0))
    val out = EventStream.sessionize(evs.toDF(), gap = "60 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Timestamp]("session_start") == ts("2024-01-01 10:05:00"))
    assert(out(0).getAs[Timestamp]("session_end") == ts("2024-01-01 11:55:00"))
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("runningCountStateful: per-user state numbers events across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventStream.EvIn]
    val q = EventStream.runningCountStateful(input.toDS())
      .writeStream.format("memory").queryName("counted")
      .outputMode("append").start()
    try {
      input.addData(
        EventStream.EvIn(1, ts("2024-01-01 10:05:00"), 1),
        EventStream.EvIn(2, ts("2024-01-01 10:06:00"), 1))
      q.processAllAvailable()
      input.addData(EventStream.EvIn(3, ts("2024-01-01 10:07:00"), 1),
        EventStream.EvIn(4, ts("2024-01-01 09:00:00"), 2))
      q.processAllAvailable()
      val out = spark.table("counted")
        .orderBy("event_id").select("running_n").as[Long].collect()
      assert(out.toSeq == Seq(1, 2, 3, 1)) // state carried across batches
    } finally q.stop()
  }

  test("purchaseAttribution: interval join pairs clicks with later purchases in-window") {
    val clicks = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, 0),
      Ev(2, ts("2024-01-01 12:00:00"), 1, 0),
      Ev(3, ts("2024-01-01 10:00:00"), 2, 0)).toDF()
    val purchases = Seq(
      Ev(100, ts("2024-01-01 10:30:00"), 1, 9.99), // within 1h of click 1
      Ev(101, ts("2024-01-01 11:30:00"), 1, 5.00), // within no click window
      Ev(102, ts("2024-01-01 09:00:00"), 2, 1.00)).toDF() // before click 3
    val out = EventStream.purchaseAttribution(clicks, purchases)
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 100L)))
  }

  test("purchaseAttribution incrementalizes as a stream-stream join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = EventStream.purchaseAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, 0))
      purchases.addData(Ev(100, ts("2024-01-01 10:30:00"), 1, 9.99))
      q.processAllAvailable()
      val out = spark.table("attributed")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(out === Set((1L, 100L)))
    } finally q.stop()
  }

  test("dedupEvents drops retransmitted ids, streaming state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0), // in-batch dup
        Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts("2024-01-01 10:01:00"), 1, 2.0)) // cross-batch dup
      q.processAllAvailable()
      val out = spark.table("deduped").select("event_id").as[Long].collect().sorted
      assert(out.toSeq === Seq(1L, 2L))
      // batch twin
      val b = EventStream.dedupEvents(Seq(
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0),
        Ev(1, ts("2024-01-01 10:00:00"), 1, 1.0)).toDF())
      assert(b.count() === 1)
    } finally q.stop()
  }

  test("dedupDocStream: first digest wins across micro-batches, min-id in-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.DocIn]
    val q = EventStream.dedupDocStream(input.toDS())
      .writeStream.format("memory").queryName("docdedup")
      .outputMode("append").start()
    try {
      // batch 1: in-batch dup (7/5 same text → min id 5 wins) + unique
      input.addData(
        EventStream.DocIn(7, "alpha text"),
        EventStream.DocIn(5, "alpha text"),
        EventStream.DocIn(6, "beta text"))
      q.processAllAvailable()
      // batch 2: retransmission of alpha (dropped), one new doc
      input.addData(
        EventStream.DocIn(9, "alpha text"),
        EventStream.DocIn(10, "gamma text"))
      q.processAllAvailable()
      val kept = spark.table("docdedup")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept === Seq(5L, 6L, 10L))
      // exact batch-twin agreement: exactIncremental over the same two
      // batches with the first batch's survivors as the digest store
      val b1 = Seq((7L, "alpha text"), (5L, "alpha text"), (6L, "beta text"))
        .toDF("doc_id", "text")
      val store = graft.ops.Dedup.exactGroups(b1, "doc_id", "text")
        .select("digest")
      val b2 = Seq((9L, "alpha text"), (10L, "gamma text")).toDF("doc_id", "text")
      val b2Kept = graft.ops.Dedup.exactIncremental(b2, "doc_id", "text", store)
        .select("keeper_id").as[Long].collect().toSeq
      assert(b2Kept === Seq(10L))
    } finally q.stop()
  }

  test("capAdmissionStream: per-source quota persists across " +
    "micro-batches and admits exactly what the batch incremental admits") {
    implicit val sqlCtx = spark.sqlContext
    val cap = 3
    val input = MemoryStream[EventStream.CapDocIn]
    val q = EventStream.capAdmissionStream(input.toDS(), cap)
      .writeStream.format("memory").queryName("cap_admit")
      .outputMode("append").start()
    try {
      val b1 = (1L to 10L).map(EventStream.CapDocIn(_, "hot")) :+
        EventStream.CapDocIn(100L, "cold")
      input.addData(b1: _*)
      q.processAllAvailable()
      val a1 = spark.table("cap_admit")
        .select("source", "doc_id").as[(String, Long)].collect().toSet
      // batch twin: same batch against an empty store
      val a1Batch = graft.ops.Text.capPerGroupIncremental(
        b1.toDF("doc_id", "source"), "source", "doc_id", cap,
        graft.ops.Text.capCounts(
          Seq.empty[(Long, String)].toDF("doc_id", "source"), "source", cap))
        .as[(String, Long)].collect().toSet
      assert(a1 === a1Batch)
      assert(a1.count(_._1 == "hot") == cap && a1.contains(("cold", 100L)))
      // batch 2: hot is FULL, cold has quota 2, fresh is new
      val b2 = (11L to 20L).map(EventStream.CapDocIn(_, "hot")) ++
        (101L to 110L).map(EventStream.CapDocIn(_, "cold")) :+
        EventStream.CapDocIn(200L, "fresh")
      input.addData(b2: _*)
      q.processAllAvailable()
      val all = spark.table("cap_admit")
        .select("source", "doc_id").as[(String, Long)].collect().toSet
      val a2 = all -- a1
      val a2Batch = graft.ops.Text.capPerGroupIncremental(
        b2.toDF("doc_id", "source"), "source", "doc_id", cap,
        graft.ops.Text.capCountsUpdate(
          graft.ops.Text.capCounts(
            Seq.empty[(Long, String)].toDF("doc_id", "source"), "source", cap),
          a1.toSeq.toDF("source", "doc_id"), "source", cap))
        .as[(String, Long)].collect().toSet
      assert(a2 === a2Batch)
      assert(a2.count(_._1 == "hot") == 0)
      assert(a2.count(_._1 == "cold") == cap - 1)
      assert(a2.contains(("fresh", 200L)))
    } finally q.stop()
  }

  test("capRankOf (JVM) ≡ the capRank Column arithmetic on a range of ids") {
    val ids = (0L to 500L) ++ Seq(Long.MaxValue, 123456789012345L)
    val viaCol = ids.toDF("doc_id")
      .select(col("doc_id"),
        conv(substring(md5(concat(lit("cap:"), col("doc_id").cast("string"))),
          1, 12), 16, 10).cast("long").as("rk"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      assert(graft.ops.Text.capRankOf(id, "cap:") === viaCol(id),
        s"rank fork at id=$id")
    }
  }

  test("minhashCandidateStream: band state store reproduces the batch " +
    "twin's candidate pairs across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.DocIn]
    val q = EventStream.minhashCandidateStream(input.toDS())
      .writeStream.format("memory").queryName("minhash_cands")
      .outputMode("append").start()
    val b1 = Seq(
      EventStream.DocIn(1, "the quick brown fox jumps over the lazy dog"),
      EventStream.DocIn(2, "the quick brown fox jumps over the lazy dog"),
      EventStream.DocIn(5, "completely different words entirely here now"))
    val b2 = Seq(
      EventStream.DocIn(3, "the quick brown fox leaps over the lazy dog"),
      EventStream.DocIn(9, "unrelated content again something else"))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("minhash_cands")
        .distinct().as[EventStream.CandPair].collect().toSet
      input.addData(b2: _*)
      q.processAllAvailable()
      val all = spark.table("minhash_cands")
        .distinct().as[EventStream.CandPair].collect().toSet

      // (1) after batch 1: exactly the batch path's pairs on b1
      def df(rows: Seq[EventStream.DocIn]) =
        rows.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
      val batchB1 = graft.ops.Dedup.minhashCandidatePairs(df(b1), "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      assert(afterB1.map(p => (p.id_a, p.id_b)) === batchB1)

      // (2) accumulated stream = full-corpus batch run on b1 ∪ b2
      val batchFull = graft.ops.Dedup.minhashCandidatePairs(
        df(b1 ++ b2), "doc_id", "text").as[(Long, Long)].collect().toSet
      assert(all.map(p => (p.id_a, p.id_b)) === batchFull)

      // (3) batch-2 emissions alone = the incremental batch twin against
      // b1's persisted band table (the state store plays that role here)
      val incr = graft.ops.Dedup.minhashIncrementalCandidates(
        df(b2), "doc_id", "text",
        graft.ops.Dedup.bandTable(
          df(b1).select(col("doc_id").as("_id"),
            graft.ops.Text.shingles(col("text"), 3).as("_sh"))))
        .as[(Long, Long)].collect().toSet
      assert((all -- afterB1).map(p => (p.id_a, p.id_b)) === incr)

      // the exact dup pair (1,2) must be present, the unrelated docs absent
      assert(all.exists(p => p.id_a == 1L && p.id_b == 2L))
      assert(!all.exists(p => p.id_a == 5L || p.id_b == 5L || p.id_b == 9L))
    } finally q.stop()
  }

  test("sessionize incrementalizes: same results via MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = EventStream.sessionize(input.toDF(), gap = "60 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(batch: _*)
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .orderBy("user_id", "session_start").collect()
      val batched = EventStream.sessionize(batch.toDF(), gap = "60 minutes")
        .orderBy("user_id", "session_start").collect()
      assert(streamed.toSeq == batched.toSeq)
    } finally q.stop()
  }

  test("clusterMaintenance: streamed edge batches converge the store to " +
    "from-scratch CC, including a cross-batch component merge") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_cluster_store").toString
    val store = s"$base/labels"
    val input = MemoryStream[EventStream.CandPair]
    val q = EventStream.clusterMaintenance(
      input.toDF(), store, s"$base/ckpt")
    try {
      // batch 1: two separate components {1,2} and {10,11}
      input.addData(EventStream.CandPair(1L, 2L), EventStream.CandPair(10L, 11L))
      q.processAllAvailable()
      // batch 2: a bridge 2-10 (merges the two stored components) plus a
      // brand-new pair — the store must relabel 10/11 without re-clustering
      input.addData(EventStream.CandPair(2L, 10L), EventStream.CandPair(20L, 21L))
      q.processAllAvailable()
      val streamed = spark.read.parquet(store)
        .as[(Long, Long)].collect().toMap
      val scratch = graft.ops.Dedup.connectedComponents(
        Seq((1L, 2L), (10L, 11L), (2L, 10L), (20L, 21L)).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(streamed === scratch)
      assert(streamed(11L) === 1L) // the cross-batch merge actually happened
    } finally q.stop()
  }

  test("label store swap is recoverable from a crash in every window " +
    "(no state where the store is lost)") {
    import org.apache.hadoop.fs.Path
    def freshStore(): (String, org.apache.hadoop.fs.FileSystem) = {
      val base = java.nio.file.Files
        .createTempDirectory("graft_store_swap").toString
      val store = s"$base/labels"
      (store, new Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration))
    }
    val v1 = Seq((1L, 1L), (2L, 1L))
    val v2 = Seq((1L, 1L), (2L, 1L), (3L, 1L))
    def write(rows: Seq[(Long, Long)], path: String): Unit =
      rows.toDF("id", "component").coalesce(1).write.parquet(path)
    def readStore(store: String): Set[(Long, Long)] =
      spark.read.parquet(store).as[(Long, Long)].collect().toSet

    // happy path: swap promotes ._next, drops the aside copy
    locally {
      val (store, fs) = freshStore()
      write(v1, store); write(v2, store + "._next")
      EventStream.swapLabelStore(fs, store)
      assert(readStore(store) === v2.toSet)
      assert(!fs.exists(new Path(store + "._next")))
      assert(!fs.exists(new Path(store + "._old")))
    }
    // crash between rename-aside and promote: no store, complete ._next →
    // recovery promotes the newer labeling (refolding the batch is
    // idempotent); the aside copy is dropped
    locally {
      val (store, fs) = freshStore()
      write(v1, store); write(v2, store + "._next")
      assert(fs.rename(new Path(store), new Path(store + "._old")))
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v2.toSet)
      assert(!fs.exists(new Path(store + "._old")))
    }
    // torn ._next (no _SUCCESS marker) must NEVER be promoted: the aside
    // copy is restored instead
    locally {
      val (store, fs) = freshStore()
      write(v1, store); write(v2, store + "._next")
      assert(fs.delete(new Path(store + "._next", "_SUCCESS"), false))
      assert(fs.rename(new Path(store), new Path(store + "._old")))
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v1.toSet)
    }
    // crash after promote but before cleanup: live store + stale ._old →
    // recovery keeps the store and drops the stale copy
    locally {
      val (store, fs) = freshStore()
      write(v2, store); write(v1, store + "._old")
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v2.toSet)
      assert(!fs.exists(new Path(store + "._old")))
    }
  }

  test("a torn LIVE store (non-atomic rename crash) is discarded for the " +
    "newest complete copy, never trusted") {
    import org.apache.hadoop.fs.Path
    def freshStore(): (String, org.apache.hadoop.fs.FileSystem) = {
      val base = java.nio.file.Files
        .createTempDirectory("graft_store_torn").toString
      val store = s"$base/labels"
      (store, new Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration))
    }
    val v1 = Seq((1L, 1L), (2L, 1L))
    val v2 = Seq((1L, 1L), (2L, 1L), (3L, 1L))
    def write(rows: Seq[(Long, Long)], path: String): Unit =
      rows.toDF("id", "component").coalesce(1).write.parquet(path)
    def readStore(store: String): Set[(Long, Long)] =
      spark.read.parquet(store).as[(Long, Long)].collect().toSet
    def tear(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit =
      assert(fs.delete(new Path(dir, "_SUCCESS"), false))

    // torn live + complete ._next (crash mid rename(path -> ._old) on an
    // object store, after ._next was fully written): the post-merge
    // ._next wins over the partial live copy
    locally {
      val (store, fs) = freshStore()
      write(v1, store); tear(fs, store); write(v2, store + "._next")
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v2.toSet)
      assert(!fs.exists(new Path(store + "._next")))
    }
    // torn live + complete ._old only (crash mid rename(next -> path)):
    // the aside copy is restored
    locally {
      val (store, fs) = freshStore()
      write(v2, store); tear(fs, store); write(v1, store + "._old")
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v1.toSet)
    }
    // a live store with NO swap artifacts beside it is accepted as-is
    // even without the marker — a caller-provided bootstrap store, not a
    // crash residue
    locally {
      val (store, fs) = freshStore()
      write(v1, store); tear(fs, store)
      EventStream.recoverLabelStore(fs, store)
      assert(readStore(store) === v1.toSet)
    }
    // torn live + only torn artifacts: the swap protocol guarantees a
    // complete copy in every window, so this is a violation — refuse to
    // serve partial labels rather than silently accepting them
    locally {
      val (store, fs) = freshStore()
      write(v1, store); tear(fs, store)
      write(v2, store + "._old"); tear(fs, store + "._old")
      intercept[java.io.IOException](EventStream.recoverLabelStore(fs, store))
    }
  }
}
