package graft.streaming

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The sharded label store: same merge semantics as the flat
  * [[EventStream.clusterMaintenance]] store (pinned against from-scratch
  * CC), but per-batch rewrite cost proportional to the batch's component
  * footprint — untouched shards must stay BYTE-identical on disk — with
  * cross-shard crash atomicity from the `_swap_pending` two-phase commit.
  */
class ShardedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val S = 4

  private def freshBase(): String = java.nio.file.Files
    .createTempDirectory("graft_sharded_store").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (relative file name → md5) for every regular file under dir. */
  private def fileDigests(dir: String): Map[String, String] = {
    val base = Paths.get(dir)
    if (!Files.exists(base)) Map.empty
    else {
      val it = Files.walk(base).iterator()
      var out = Map.empty[String, String]
      while (it.hasNext) {
        val p = it.next()
        if (Files.isRegularFile(p)) {
          val md = MessageDigest.getInstance("MD5")
            .digest(Files.readAllBytes(p))
          out += (base.relativize(p).toString ->
            md.map("%02x".format(_)).mkString)
        }
      }
      out
    }
  }

  test("sharded maintenance converges to from-scratch CC, including a " +
    "CROSS-SHARD component merge that physically moves rows") {
    implicit val sqlCtx = spark.sqlContext
    val base = freshBase()
    val store = s"$base/labels"
    val input = MemoryStream[EventStream.CandPair]
    val q = EventStream.clusterMaintenanceSharded(
      input.toDF(), store, s"$base/ckpt", numShards = S)
    try {
      // shard = xxhash64(cast(component as string)) mod 4:
      // component 1 -> shard 0, component 6 -> shard 3, 20 -> shard 2
      // batch 1: components 1 and 6
      input.addData(EventStream.CandPair(1L, 2L), EventStream.CandPair(6L, 11L))
      q.processAllAvailable()
      // batch 2: bridge 2-6 merges component 6 into 1 — rows must move
      // from shard 3 to shard 0 — plus a fresh pair (component 20)
      input.addData(EventStream.CandPair(2L, 6L), EventStream.CandPair(20L, 21L))
      q.processAllAvailable()
      val streamed = EventStream.readShardedStore(spark, store)
        .as[(Long, Long)].collect().toMap
      val scratch = graft.ops.Dedup.connectedComponents(
        Seq((1L, 2L), (6L, 11L), (2L, 6L), (20L, 21L)).toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(streamed === scratch)
      assert(streamed(11L) === 1L)
      // the merged component's rows live in ONE shard: component 1's
      val winnerShard = spark.read.parquet(EventStream.shardDir(store, 0))
        .as[(Long, Long)].collect().toMap
      assert(winnerShard.keySet === Set(1L, 2L, 6L, 11L))
      val loserShard = spark.read.parquet(EventStream.shardDir(store, 3))
      assert(loserShard.count() === 0, "losing shard must have shed its rows")
    } finally q.stop()
  }

  test("a fold rewrites ONLY the touched shards; untouched shards are " +
    "byte-identical on disk") {
    val base = freshBase()
    val store = s"$base/labels"
    // shard = xxhash64(cast(component as string)) mod 4:
    // components 100/101/200/700 land in shards 2/0/3/1 — all four
    val labels = Seq(
      (100L, 100L), (300L, 100L), (101L, 101L), (301L, 101L),
      (200L, 200L), (302L, 200L), (700L, 700L))
      .toDF("id", "component")
    EventStream.shardLabelStore(labels, store, S)
    val before1 = fileDigests(EventStream.shardDir(store, 1))
    val before2 = fileDigests(EventStream.shardDir(store, 2))
    assert(before1.nonEmpty && before2.nonEmpty)
    // one edge bridging components 101 (shard 0) and 200 (shard 3)
    val touched = EventStream.foldShardedBatch(
      Seq((301L, 302L)).toDF("id_a", "id_b"), store, S)
    assert(touched === Seq(0, 3),
      "merge map names exactly the shards of the merged components")
    assert(fileDigests(EventStream.shardDir(store, 1)) === before1,
      "shard 1 was rewritten by a fold that never touched it")
    assert(fileDigests(EventStream.shardDir(store, 2)) === before2,
      "shard 2 was rewritten by a fold that never touched it")
    val after = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(after === Map(
      100L -> 100L, 300L -> 100L, 101L -> 101L, 301L -> 101L,
      200L -> 101L, 302L -> 101L, 700L -> 700L))
    // a BRAND-NEW id joining an existing component: the merge map pairs
    // the new id's self-component with the winner, but no store row ever
    // carried the new id as a component — its shard (here 0:
    // xxhash64("502") mod 4) must not be rewritten; only the winner's
    // shard (100 -> 2) is
    val beforeSelf = fileDigests(EventStream.shardDir(store, 0))
    val touched2 = EventStream.foldShardedBatch(
      Seq((502L, 300L)).toDF("id_a", "id_b"), store, S)
    assert(touched2 === Seq(2),
      "a new id's self-component shard is not store-touched")
    assert(fileDigests(EventStream.shardDir(store, 0)) === beforeSelf,
      "shard of a new id's never-stored self-component was rewritten")
    val after2 = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(after2(502L) === 100L && after2(300L) === 100L)
  }

  test("STRING-keyed labelings shard, fold, and stay footprint-bounded — " +
    "the shard key is a hash, not a cast (an ANSI cast of 'doc_x1' " +
    "would throw mid-fold)") {
    val base = freshBase()
    val store = s"$base/labels"
    // comps "a" -> shard 0, "c" -> shard 2, "doc_x1" -> shard 3
    // (xxhash64 mod 4)
    EventStream.shardLabelStore(Seq(
      ("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"),
      ("doc_x1", "doc_x1")).toDF("id", "component"), store, S)
    val beforeBystander = fileDigests(EventStream.shardDir(store, 3))
    assert(beforeBystander.nonEmpty)
    val touched = EventStream.foldShardedBatch(
      Seq(("b", "c")).toDF("id_a", "id_b"), store, S)
    assert(touched === Seq(0, 2),
      "the merged string components' shards, nothing else")
    assert(fileDigests(EventStream.shardDir(store, 3)) === beforeBystander,
      "untouched string-keyed shard must stay byte-identical")
    val after = EventStream.readShardedStore(spark, store)
      .as[(String, String)].collect().toMap
    assert(after === Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "doc_x1" -> "doc_x1"))
  }

  test("a NULL edge endpoint (producer glitch) is dropped, not a " +
    "poison pill: the fold must neither NPE on the null shard key nor " +
    "write a (null, null) row") {
    val base = freshBase()
    val store = s"$base/labels"
    EventStream.shardLabelStore(
      Seq((100L, 100L), (300L, 100L)).toDF("id", "component"), store, S)
    val touched = EventStream.foldShardedBatch(
      Seq((Some(300L), Some(500L)), (None, Some(700L)),
        (Some(900L), None))
        .toDF("id_a", "id_b"), store, S)
    assert(touched.nonEmpty)
    val after = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    // null endpoints contribute no MERGES, but observed good endpoints
    // still enter (self-labeled) — the shared CC null contract; no
    // (null, null) row is ever written
    assert(after === Map(100L -> 100L, 300L -> 100L, 500L -> 100L,
      700L -> 700L, 900L -> 900L))
  }

  test("the _layout marker refuses folds whose placement would not " +
    "match the store's: different numShards, or a legacy store with " +
    "no marker at all") {
    val base = freshBase()
    val store = s"$base/labels"
    EventStream.shardLabelStore(
      Seq((100L, 100L), (300L, 100L)).toDF("id", "component"), store, S)
    // numShards drift: same scheme, different count — every placement
    // differs, the fold must refuse rather than scatter components
    val eDrift = intercept[java.io.IOException] {
      EventStream.foldShardedBatch(
        Seq((300L, 500L)).toDF("id_a", "id_b"), store, S * 2)
    }
    assert(eDrift.getMessage.contains("layout mismatch"))
    // legacy/foreign store: live shards but no marker — placement
    // cannot be trusted, refuse with the re-shard instruction
    fsOf(store).delete(new Path(store, "_layout"), false)
    val eLegacy = intercept[java.io.IOException] {
      EventStream.foldShardedBatch(
        Seq((300L, 500L)).toDF("id_a", "id_b"), store, S)
    }
    assert(eLegacy.getMessage.contains("no _layout"))
    // a matching fold still works after re-stamping via bootstrap
    EventStream.shardLabelStore(
      EventStream.readShardedStore(spark, store), store + "2", S)
    val touched = EventStream.foldShardedBatch(
      Seq((300L, 500L)).toDF("id_a", "id_b"), store + "2", S)
    assert(touched.nonEmpty)
  }

  test("reshardStore: one-shot in-place migration for the two _layout " +
    "refusals and for shard-count changes; crash-resumable") {
    val base = freshBase()
    val store = s"$base/labels"
    val rows = Map(100L -> 100L, 300L -> 100L, 500L -> 500L)
    EventStream.shardLabelStore(
      rows.toSeq.toDF("id", "component"), store, S)
    // simulate a legacy / foreign-scheme store: live shards, no marker
    fsOf(store).delete(new Path(store, "_layout"), false)
    val eLegacy = intercept[java.io.IOException] {
      EventStream.foldShardedBatch(
        Seq((500L, 900L)).toDF("id_a", "id_b"), store, S)
    }
    assert(eLegacy.getMessage.contains("reshardStore"))
    // the helper migrates in place; folds work again, rows preserved
    EventStream.reshardStore(spark, store, S)
    assert(EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap === rows)
    assert(EventStream.foldShardedBatch(
      Seq((500L, 900L)).toDF("id_a", "id_b"), store, S).nonEmpty)
    val afterFold = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(afterFold === rows ++ Map(900L -> 500L))
    // shard-count change: the same helper re-places every row at the
    // new count and re-stamps; a fold at the new count proceeds
    EventStream.reshardStore(spark, store, S * 2)
    assert(EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap === afterFold)
    assert(EventStream.foldShardedBatch(
      Seq((900L, 901L)).toDF("id_a", "id_b"), store, S * 2).nonEmpty)
    // crash-resume: park the store by hand (the state after a crash
    // between the park rename and the rewrite) — a retried reshard
    // finds the parked source, rebuilds, and cleans up
    val expect = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    val fs = fsOf(store)
    assert(fs.rename(new Path(store),
      new Path(store + EventStream.ReshardSrcSuffix)))
    EventStream.reshardStore(spark, store, S)
    assert(!fs.exists(new Path(store + EventStream.ReshardSrcSuffix)))
    assert(EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap === expect)
    assert(EventStream.foldShardedBatch(
      Seq((901L, 902L)).toDF("id_a", "id_b"), store, S).nonEmpty)
  }

  test("two-phase commit: the _swap_pending marker decides whether a " +
    "complete ._next is promoted at recovery") {
    def setup(): (String, org.apache.hadoop.fs.FileSystem) = {
      val store = s"${freshBase()}/labels"
      EventStream.shardLabelStore(
        Seq((100L, 100L), (300L, 100L)).toDF("id", "component"), store, S)
      (store, fsOf(store))
    }
    val v2 = Seq((100L, 100L), (300L, 100L), (500L, 100L))
    // crash AFTER the commit point (marker present): recovery must
    // complete the batch's swap by promoting the complete ._next
    locally {
      val (store, fs) = setup()
      v2.toDF("id", "component").write
        .parquet(EventStream.shardDir(store, 2) + "._next")
      fs.create(new Path(store, "_swap_pending"), true).close()
      EventStream.recoverShardedStore(fs, store)
      assert(spark.read.parquet(EventStream.shardDir(store, 2))
        .as[(Long, Long)].collect().toSet === v2.toSet)
      assert(!fs.exists(new Path(store, "_swap_pending")))
      assert(!fs.exists(new Path(EventStream.shardDir(store, 2) + "._next")))
    }
    // crash BEFORE the commit point (no marker): the live state is the
    // consistent one — the stale ._next must be DISCARDED, never
    // promoted (leaving it around would let a LATER batch's marker
    // promote a stale copy)
    locally {
      val (store, fs) = setup()
      v2.toDF("id", "component").write
        .parquet(EventStream.shardDir(store, 2) + "._next")
      EventStream.recoverShardedStore(fs, store)
      assert(spark.read.parquet(EventStream.shardDir(store, 2))
        .as[(Long, Long)].collect().toSet ===
        Set((100L, 100L), (300L, 100L)))
      assert(!fs.exists(new Path(EventStream.shardDir(store, 2) + "._next")),
        "pre-commit-point residue must be discarded at recovery")
    }
    // pre-commit-point crash on a BRAND-NEW shard (phase 1 wrote the
    // first-ever `._next` for a shard with no live dir, then died before
    // the marker): the uncommitted half-batch must NOT surface — the
    // flat-store rule "complete ._next with no live = mid-swap, promote"
    // would resurrect half a merge here
    locally {
      val (store, fs) = setup()
      val newShard = EventStream.shardDir(store, 3)
      Seq((700L, 3L)).toDF("id", "component").write
        .parquet(newShard + "._next")
      EventStream.recoverShardedStore(fs, store)
      assert(!fs.exists(new Path(newShard)),
        "uncommitted phase-1 residue on a new shard must not be promoted")
      assert(!fs.exists(new Path(newShard + "._next")))
      // and an INCOMPLETE ._next (torn phase-1 write) must not wedge
      Seq((700L, 3L)).toDF("id", "component").write
        .parquet(newShard + "._next")
      fs.delete(new Path(newShard + "._next/_SUCCESS"), false)
      EventStream.recoverShardedStore(fs, store)
      assert(!fs.exists(new Path(newShard + "._next")))
    }
    // post-commit-point crash in the torn-DELETE window of a shard's
    // promote rename (copy finished — live is complete AND carries the
    // batch token, because the token file traveled with the promoted
    // dir — but the rename died before removing `._next`, with `._old`
    // still parked): live IS the new content; recovery must keep it and
    // drop both residues, not re-swap the half-deleted ._next over it
    locally {
      val (store, fs) = setup()
      val d = EventStream.shardDir(store, 2)
      if (!fs.rename(new Path(d), new Path(d + "._old")))
        fail(s"setup rename failed for $d")
      v2.toDF("id", "component").write.parquet(d)
      EventStream.stampSuccess(fs, new Path(d), Some("tok-b1"))
      v2.toDF("id", "component").write.parquet(d + "._next")
      EventStream.stampSuccess(fs, new Path(d + "._next"), Some("tok-b1"))
      fs.create(new Path(store, "_swap_pending"), true).close()
      val liveBefore = fileDigests(d)
      EventStream.recoverShardedStore(fs, store)
      assert(fileDigests(d) === liveBefore,
        "promote-finished live content must be kept byte-identical")
      assert(!fs.exists(new Path(d + "._next")))
      assert(!fs.exists(new Path(d + "._old")))
      assert(!fs.exists(new Path(store, "_swap_pending")))
    }
    // post-commit-point crash in the torn-delete window of the ARCHIVE
    // rename: live is still the OLD content (complete — the archive
    // rename copied it to ._old but died before deleting the source),
    // ._next holds the committed new content with a DIFFERENT token.
    // Byte-layout is identical to the promote-finished window above;
    // only the token tells them apart — recovery must run the swap, not
    // keep the stale live
    locally {
      val (store, fs) = setup()
      val d = EventStream.shardDir(store, 2)
      // live keeps the bootstrap content; manufacture the partial
      // archive copy and the committed ._next
      fs.mkdirs(new Path(d + "._old"))
      v2.toDF("id", "component").write.parquet(d + "._next")
      EventStream.stampSuccess(fs, new Path(d + "._next"), Some("tok-b2"))
      fs.create(new Path(store, "_swap_pending"), true).close()
      EventStream.recoverShardedStore(fs, store)
      assert(spark.read.parquet(d)
        .as[(Long, Long)].collect().toSet === v2.toSet,
        "stale live must be replaced by the committed ._next")
      assert(!fs.exists(new Path(d + "._next")))
      assert(!fs.exists(new Path(d + "._old")))
      assert(!fs.exists(new Path(store, "_swap_pending")))
    }
    // a marker-first torn COPY (object stores copy keys in listing
    // order: `_SUCCESS` < `part-*`): a live dir holding only the marker
    // and none of its manifest's data files must NOT be trusted — the
    // complete ._next beside it is the real content
    locally {
      val (store, fs) = setup()
      val d = EventStream.shardDir(store, 2)
      // hollow live: keep _SUCCESS (with manifest), delete data files
      EventStream.stampSuccess(fs, new Path(d))
      fs.listStatus(new Path(d)).map(_.getPath)
        .filter(p => !p.getName.startsWith("_"))
        .foreach(p => fs.delete(p, false))
      v2.toDF("id", "component").write.parquet(d + "._next")
      EventStream.stampSuccess(fs, new Path(d + "._next"), Some("tok-b3"))
      fs.create(new Path(store, "_swap_pending"), true).close()
      EventStream.recoverShardedStore(fs, store)
      assert(spark.read.parquet(d)
        .as[(Long, Long)].collect().toSet === v2.toSet,
        "a hollow marker-only live dir must not outrank the complete ._next")
    }
    // the marker-first torn copy of the PROMOTE rename itself: the
    // copy materialized `_SUCCESS` — carrying the batch TOKEN — before
    // any data file, with `._old` still parked and `._next` (same
    // token) the only complete copy. Byte-layout satisfies every bare
    // promote-finished test (marker present, old present, next present,
    // tokens match); only the manifest check can tell the live dir is
    // hollow. Recovery must run the swap, NOT delete `._next`+`._old`
    // (which would lose the shard permanently).
    locally {
      val (store, fs) = setup()
      val d = EventStream.shardDir(store, 2)
      if (!fs.rename(new Path(d), new Path(d + "._old")))
        fail(s"setup rename failed for $d")
      // hollow live: stamp the manifest+token over real data files,
      // then delete the data files (the torn-copy window)
      v2.toDF("id", "component").write.parquet(d)
      EventStream.stampSuccess(fs, new Path(d), Some("tok-b4"))
      fs.listStatus(new Path(d)).map(_.getPath)
        .filter(p => !p.getName.startsWith("_"))
        .foreach(p => fs.delete(p, false))
      v2.toDF("id", "component").write.parquet(d + "._next")
      EventStream.stampSuccess(fs, new Path(d + "._next"), Some("tok-b4"))
      fs.create(new Path(store, "_swap_pending"), true).close()
      EventStream.recoverShardedStore(fs, store)
      assert(spark.read.parquet(d)
        .as[(Long, Long)].collect().toSet === v2.toSet,
        "a hollow token-matching live dir with ._old parked must be " +
          "replaced by the complete ._next, not trusted as promoted")
      assert(!fs.exists(new Path(d + "._next")))
      assert(!fs.exists(new Path(d + "._old")))
    }
    // the REVERSE torn-delete of the promote rename: copy finished
    // (live complete, token traveled), but the delete phase removed
    // ._next's DATA files before its marker — ._next is now a husk
    // whose bare _SUCCESS check reads true. Only the branch ORDER saves
    // the shard: promote-finished (live manifest + token match) must
    // intercept BEFORE the complete-._next swap path, whose
    // swapLabelStore would first drop the parked ._old and then
    // promote the husk over the complete live copy.
    locally {
      val (store, fs) = setup()
      val d = EventStream.shardDir(store, 2)
      if (!fs.rename(new Path(d), new Path(d + "._old")))
        fail(s"setup rename failed for $d")
      v2.toDF("id", "component").write.parquet(d)
      EventStream.stampSuccess(fs, new Path(d), Some("tok-b5"))
      // husk ._next: marker (with manifest + token) but no data files
      v2.toDF("id", "component").write.parquet(d + "._next")
      EventStream.stampSuccess(fs, new Path(d + "._next"), Some("tok-b5"))
      fs.listStatus(new Path(d + "._next")).map(_.getPath)
        .filter(p => !p.getName.startsWith("_"))
        .foreach(p => fs.delete(p, false))
      fs.create(new Path(store, "_swap_pending"), true).close()
      val liveBefore = fileDigests(d)
      EventStream.recoverShardedStore(fs, store)
      assert(fileDigests(d) === liveBefore,
        "complete live must be kept byte-identical; the husk ._next " +
          "must never be promoted over it")
      assert(!fs.exists(new Path(d + "._next")))
      assert(!fs.exists(new Path(d + "._old")))
      assert(!fs.exists(new Path(store, "_swap_pending")))
    }
  }

  test("a fold folded into a crashed-and-recovered store equals the fold " +
    "into a clean store (replay idempotence through the marker path)") {
    val base = freshBase()
    val store = s"$base/labels"
    EventStream.shardLabelStore(
      Seq((101L, 101L), (301L, 101L), (102L, 102L), (302L, 102L))
        .toDF("id", "component"), store, S)
    // first fold merges 101/102; manufacture the post-commit-point crash
    // by re-creating the marker AFTER the fold completed, then replaying
    // the same batch (exactly what a restarted stream does)
    EventStream.foldShardedBatch(
      Seq((301L, 302L)).toDF("id_a", "id_b"), store, S)
    fsOf(store).create(new Path(store, "_swap_pending"), true).close()
    val replayTouched = EventStream.foldShardedBatch(
      Seq((301L, 302L)).toDF("id_a", "id_b"), store, S)
    assert(replayTouched.isEmpty,
      "an already-applied merge contracts to self-loops: nothing to rewrite")
    val after = EventStream.readShardedStore(spark, store)
      .as[(Long, Long)].collect().toMap
    assert(after === Map(
      101L -> 101L, 301L -> 101L, 102L -> 101L, 302L -> 101L))
  }

  test("shardsFor: the store-size selector holds shard size at target " +
    "and fails loudly past the fixed-cost cap") {
    // arithmetic: ceil(store/target), floor 1
    assert(EventStream.shardsFor(0L) === 1)
    assert(EventStream.shardsFor(1L) === 1)
    assert(EventStream.shardsFor(128L << 20) === 1)
    assert(EventStream.shardsFor((128L << 20) + 1) === 2)
    assert(EventStream.shardsFor(10L * (128L << 20)) === 10)
    // the measured sf1 trickle point: a ~1 MiB fixture store at a
    // 4 KiB fixture target selects the couple-hundred-shard regime the
    // 256-shard measurement (14-17% bytes/batch) sits in
    assert(EventStream.shardsFor(1L << 20, targetShardBytes = 4L << 10)
      === 256)
    // the footprint constraint reproduces that regime from the FEED:
    // ~35 components/batch at the default 0.15 rewrite fraction needs
    // 234 shards even when the store-size term alone would pick 7 —
    // the exact operating point StreamScaleBench measured at 100%
    // bytes/batch for size-only vs 14-17% at ~256
    assert(EventStream.shardsFor(417465L, targetShardBytes = 64L << 10,
      batchComponents = 35L) === 234)
    assert(EventStream.shardsFor(417465L, targetShardBytes = 64L << 10)
      === 7)
    // monotone in store size at fixed target — shard SIZE, not shard
    // count, is the conserved quantity as the store grows
    assert(EventStream.shardsFor(100L << 30) >
      EventStream.shardsFor(10L << 30))
    // a store that would need more than maxShards at the asked target
    // is a loud failure (every fold pays O(numShards) listing), not a
    // silently enormous layout
    assertThrows[IllegalArgumentException] {
      EventStream.shardsFor(1L << 40, targetShardBytes = 1L << 20)
    }
    assertThrows[IllegalArgumentException] {
      EventStream.shardsFor(-1L)
    }
  }
}
