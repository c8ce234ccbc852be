package graft.sources

import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[PipelineLogger]] to the reference's `common/logger.py`
  * contract: format, level routing (file INFO+, console DEBUG/INFO per
  * the debug flag), and RotatingFileHandler-style shift-up rotation.
  */
class PipelineLoggerSpec extends AnyFunSuite {

  private def lines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  test("format and level routing: file records INFO and above, console " +
    "drops DEBUG unless the debug flag is set") {
    val dir = Files.createTempDirectory("logs")
    val seen = ArrayBuffer.empty[String]
    val log = new PipelineLogger(dir = Some(dir), debug = false,
      console = seen += _)
    log.debugLog("quiet")
    log.info("hello")
    log.warning("careful")
    log.error("boom")
    val f = lines(dir.resolve("sync.log"))
    assert(f.size === 3 && seen.size === 3, "DEBUG reaches neither sink")
    assert(f.forall(_.matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3} - (INFO|WARNING|ERROR) - .*""")),
      f.mkString("\n"))
    assert(f.map(_.split(" - ", 3)(1)) === Seq("INFO", "WARNING", "ERROR"))
    assert(f.last.endsWith(" - boom"))

    val seenDbg = ArrayBuffer.empty[String]
    val dbg = new PipelineLogger(dir = Some(dir), debug = true,
      console = seenDbg += _)
    dbg.debugLog("loud")
    assert(seenDbg.size === 1 && seenDbg.head.contains(" - DEBUG - loud"))
    // ...but DEBUG still stays out of the file (logger.py:30 file
    // handler is pinned at INFO regardless of the console flag)
    assert(lines(dir.resolve("sync.log")).size === 3)
  }

  test("rotation shifts backups up and drops the oldest past " +
    "backupCount (RotatingFileHandler.doRollover semantics)") {
    val dir = Files.createTempDirectory("logs_rot")
    val log = new PipelineLogger(dir = Some(dir), maxBytes = 120,
      backupCount = 2, console = _ => ())
    (1 to 12).foreach(i => log.info(s"message number $i"))
    val names = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(names === Seq("sync.log", "sync.log.1", "sync.log.2"),
      names.mkString(","))
    // .1 is the NEWEST backup: its messages come after .2's
    def lastN(n: String): Int =
      lines(dir.resolve(n)).last.split(" ").last.toInt
    assert(lastN("sync.log") > lastN("sync.log.1"))
    assert(lastN("sync.log.1") > lastN("sync.log.2"))
    // nothing vanished inside the retention window: the live file
    // continues exactly after .1
    val live = lines(dir.resolve("sync.log"))
      .map(_.split(" ").last.toInt)
    assert(live === (lastN("sync.log.1") + 1 to 12).toList)
  }

  test("backupCount=0 truncates in place; dir=None is console-only and " +
    "touches no filesystem") {
    val dir = Files.createTempDirectory("logs_trunc")
    val log = new PipelineLogger(dir = Some(dir), maxBytes = 80,
      backupCount = 0, console = _ => ())
    (1 to 10).foreach(i => log.info(s"m$i"))
    val names = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(names === Seq("sync.log"))

    val seen = ArrayBuffer.empty[String]
    val pure = new PipelineLogger(dir = None, console = seen += _)
    pure.info("x")
    assert(seen.size === 1)
    // the library default writes nowhere: sources-layer logging through
    // PipelineLogger.active must not create ./logs as a side effect
    assert(PipelineLogger.active !== null)
  }
}
