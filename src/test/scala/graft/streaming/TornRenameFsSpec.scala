package graft.streaming

import java.io.IOException
import java.net.URI

import graft.{Materialize, SparkSpec}
import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** A Hadoop FileSystem whose rename is COPY-THEN-DELETE — the semantics
  * object stores actually provide (S3-style rename is a per-file copy
  * manifest, not an atomic directory move) — with an injectable crash
  * point. The round-7 torn-store recovery paths
  * (`EventStream.recoverLabelStore`) were exercised only against
  * hand-sculpted torn directories on the local FS; this class lets the
  * RENAME MECHANISM ITSELF produce the torn states, closing the round-7
  * "simulated tears only" caveat (SCALE.md round 7; MiniDFSCluster is
  * not available offline — its jars are not in /opt/spark/jars — so a
  * custom FileSystem is the strongest offline stand-in, and unlike HDFS
  * it actually HAS non-atomic rename, which is the semantics under
  * test).
  *
  * Directory renames copy data files BEFORE the `_SUCCESS` marker (the
  * order a manifest commit exposes: markers last), so a mid-copy crash
  * yields exactly the torn shape — partial data, no marker — that
  * `recoverLabelStore` refuses to trust.
  */
class TornRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "torn"
  override def getUri: URI = URI.create("torn:///")

  override def rename(src: Path, dst: Path): Boolean = {
    import TornRenameFileSystem._
    renames.incrementAndGet()
    val st = getFileStatus(src)
    if (!st.isDirectory) {
      maybeCrash(dst, copied = 0)
      FileUtil.copy(this, src, this, dst, false, getConf)
      maybeCrashBeforeDelete(dst)
      delete(src, false)
    } else {
      mkdirs(dst)
      val (markers, data) =
        listStatus(src).toSeq.partition(_.getPath.getName == "_SUCCESS")
      var n = 0
      (data ++ markers).foreach { f =>
        maybeCrash(dst, n)
        FileUtil.copy(this, f.getPath, this,
          new Path(dst, f.getPath.getName), false, getConf)
        n += 1
      }
      maybeCrashBeforeDelete(dst)
      delete(src, true)
    }
    true
  }

  private def maybeCrash(dst: Path, copied: Int): Unit =
    TornRenameFileSystem.crash.get() match {
      case (name, after) if name == dst.getName && after >= 0 && copied >= after =>
        TornRenameFileSystem.crash.set(TornRenameFileSystem.NoCrash)
        throw new IOException(
          s"simulated object-store crash mid-rename to $dst after $copied files")
      case _ => ()
    }

  private def maybeCrashBeforeDelete(dst: Path): Unit =
    TornRenameFileSystem.crash.get() match {
      case (name, -1) if name == dst.getName =>
        TornRenameFileSystem.crash.set(TornRenameFileSystem.NoCrash)
        throw new IOException(
          s"simulated crash after copy, before source delete ($dst)")
      case _ => ()
    }
}

object TornRenameFileSystem {
  private[streaming] val NoCrash: (String, Int) = ("", Int.MinValue)

  /** (destination directory NAME, crash point): `after >= 0` crashes
    * after copying that many files into the matching destination (before
    * the `_SUCCESS` marker when `after` is at most the data-file count);
    * `-1` crashes after the full copy but before the source delete
    * (duplicated directory). One-shot: the knob self-clears when it
    * fires, so recovery's own renames run clean.
    */
  val crash = new java.util.concurrent.atomic.AtomicReference(NoCrash)
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

class TornRenameFsSpec extends SparkSpec {
  import spark.implicits._

  private def tornFs(): TornRenameFileSystem = {
    val fs = new TornRenameFileSystem
    fs.initialize(URI.create("torn:///"), spark.sparkContext.hadoopConfiguration)
    fs
  }
  private def freshStore(): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_torn_rename").toString
    s"$base/labels"
  }
  private val v1 = Seq((1L, 1L), (2L, 1L))
  private val v2 = Seq((1L, 1L), (2L, 1L), (3L, 1L))
  private def write(rows: Seq[(Long, Long)], path: String): Unit =
    rows.toDF("id", "component").coalesce(1).write.parquet(path)
  private def readStore(store: String): Set[(Long, Long)] =
    spark.read.parquet(store).as[(Long, Long)].collect().toSet

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    TornRenameFileSystem.crash.set(TornRenameFileSystem.NoCrash)
  }

  test("store swap completes unchanged over copy-then-delete renames " +
    "(object-store semantics, no atomic directory move anywhere)") {
    val fs = tornFs()
    val store = freshStore()
    write(v1, store); write(v2, store + "._next")
    val before = TornRenameFileSystem.renames.get()
    EventStream.swapLabelStore(fs, store)
    assert(TornRenameFileSystem.renames.get() > before,
      "swap did not route through the copy-then-delete rename")
    assert(readStore(store) === v2.toSet)
    assert(!fs.exists(new Path(store + "._next")))
    assert(!fs.exists(new Path(store + "._old")))
  }

  test("a crash mid-PROMOTE tears the live store for real; recovery " +
    "discards it for the complete ._next") {
    val fs = tornFs()
    val store = freshStore()
    write(v1, store); write(v2, store + "._next")
    // first swap rename (dst labels._old) runs clean; the promote's dst
    // is the store name — crash after 1 data file, before _SUCCESS
    TornRenameFileSystem.crash.set(("labels", 1))
    intercept[IOException](EventStream.swapLabelStore(fs, store))
    // the crash left: complete ._old (v1), torn live store (no marker),
    // and the promote's SOURCE ._next intact (copy-then-delete never
    // deleted it) — recovery must pick ._next, the post-merge labeling
    assert(fs.exists(new Path(store)))
    assert(!fs.exists(new Path(store, "_SUCCESS")))
    assert(fs.exists(new Path(store + "._next", "_SUCCESS")))
    EventStream.recoverLabelStore(fs, store)
    assert(readStore(store) === v2.toSet)
    assert(fs.exists(new Path(store, "_SUCCESS")))
  }

  test("a crash between copy and source-delete duplicates the directory; " +
    "recovery keeps the trusted live store and drops the residue") {
    val fs = tornFs()
    val store = freshStore()
    write(v1, store); write(v2, store + "._next")
    // rename-aside (dst labels._old) copies fully then crashes before
    // deleting the source: live store AND ._old both complete
    TornRenameFileSystem.crash.set(("labels._old", -1))
    intercept[IOException](EventStream.swapLabelStore(fs, store))
    assert(fs.exists(new Path(store, "_SUCCESS")))
    assert(fs.exists(new Path(store + "._old", "_SUCCESS")))
    EventStream.recoverLabelStore(fs, store)
    // live store with its marker is trusted; stale aside copy dropped;
    // ._next remains for the next batch to delete-and-rewrite
    assert(readStore(store) === v1.toSet)
    assert(!fs.exists(new Path(store + "._old")))
    assert(fs.exists(new Path(store + "._next", "_SUCCESS")))
  }

  test("reliable-mode Materialize.checkpoint round-trips through the " +
    "non-atomic-rename FileSystem (torn:// checkpoint dir)") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.torn.impl", classOf[TornRenameFileSystem].getName)
    hconf.set("fs.torn.impl.disable.cache", "true")
    val dir = java.nio.file.Files.createTempDirectory("graft_torn_ckpt").toString
    spark.conf.set(Materialize.ModeKey, "reliable")
    spark.conf.set(Materialize.DirKey, s"torn://$dir")
    try {
      val before = TornRenameFileSystem.renames.get()
      val out = Materialize.checkpoint(
        (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "s"))
      assert(out.count() === 100)
      assert(out.agg(org.apache.spark.sql.functions.sum("id"))
        .head.getLong(0) === 5050)
      // the checkpoint artifact landed under the torn:// dir, and the
      // write path's task-commit renames ran as copy-then-delete
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"expected checkpoint files under $dir")
      assert(TornRenameFileSystem.renames.get() > before,
        "checkpoint write did not route through the torn FileSystem")
    } finally {
      spark.conf.unset(Materialize.ModeKey)
      spark.conf.unset(Materialize.DirKey)
      // checkpoint dir is per-context state shared across suites: hand
      // ownership back to the seam (MaterializeSpec convention)
      Materialize.adoptCurrentDirForTest(spark.sparkContext)
    }
  }
}
