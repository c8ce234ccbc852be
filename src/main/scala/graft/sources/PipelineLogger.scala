package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Console+file logger, the analog of the reference's
  * `common/logger.py:1-46` (`setup_logger`): one logger writing
  * `timestamp - LEVEL - message` lines to
  *
  *  - a size-ROTATING file `logs/sync.log` (10 MB per file, 5 backups,
  *    INFO and above — `logger.py:25-31`; rotation renames the live
  *    file to `.1` and shifts existing backups up, dropping the
  *    oldest, the `RotatingFileHandler` discipline), and
  *  - the console (stderr; DEBUG and above when `debug`, else INFO —
  *    `logger.py:33-36`, the `--debug` CLI flag's consumer).
  *
  * Implemented directly on java.nio (zero dependencies — the JDK's
  * own `java.util.logging.FileHandler` rotates with a different naming
  * scheme and cannot reproduce the reference's shift-up behavior).
  * Driver-side only, like the REST client it serves; never ships to
  * executors. Thread-safe via a single monitor — log volume here is
  * per-request, not per-row.
  *
  * [[PipelineLogger.active]] is the process-wide instance the sources
  * layer logs through; it defaults to console-only (no `logs/` side
  * effect from library use) and [[graft.PipelineMain]] swaps in the
  * full file+console logger at CLI startup, mirroring where the
  * reference calls `setup_logger` (`common/api.py:18`).
  */
final class PipelineLogger(
    dir: Option[Path] = Some(Paths.get("logs")),
    maxBytes: Long = 10L * 1024 * 1024,
    backupCount: Int = 5,
    debug: Boolean = false,
    console: String => Unit = System.err.println(_)) {

  import PipelineLogger._

  private val file: Option[Path] = dir.map { d =>
    Files.createDirectories(d)
    d.resolve("sync.log")
  }

  def debugLog(msg: String): Unit = log(Debug, msg)
  def info(msg: String): Unit = log(Info, msg)
  def warning(msg: String): Unit = log(Warning, msg)
  def error(msg: String): Unit = log(Error, msg)

  private val consoleLevel = if (debug) Debug else Info

  private def log(level: Int, msg: String): Unit = synchronized {
    val line = s"${timestamp()} - ${levelName(level)} - $msg"
    if (level >= consoleLevel) console(line)
    if (level >= Info) file.foreach(write(_, line))
  }

  private def write(p: Path, line: String): Unit = {
    val bytes = (line + System.lineSeparator())
      .getBytes(StandardCharsets.UTF_8)
    if (Files.exists(p) && Files.size(p) + bytes.length > maxBytes)
      rotate(p)
    Files.write(p, bytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }

  /** `RotatingFileHandler.doRollover`: drop `.{backupCount}`, shift
    * `.{i}` → `.{i+1}` from the top down, move the live file to `.1`.
    * With backupCount == 0 the live file simply truncates (the
    * stdlib's degenerate case).
    */
  private def rotate(p: Path): Unit = {
    if (backupCount <= 0) { Files.deleteIfExists(p); () }
    else {
      Files.deleteIfExists(backup(p, backupCount))
      ((backupCount - 1) to 1 by -1).foreach { i =>
        val src = backup(p, i)
        if (Files.exists(src)) { Files.move(src, backup(p, i + 1)); () }
      }
      Files.move(p, backup(p, 1))
      ()
    }
  }

  private def backup(p: Path, i: Int): Path =
    p.resolveSibling(s"${p.getFileName}.$i")

  private def timestamp(): String =
    java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss,SSS"))
}

object PipelineLogger {
  private val Debug = 10
  private val Info = 20
  private val Warning = 30
  private val Error = 40

  private def levelName(level: Int): String = level match {
    case Debug => "DEBUG"
    case Info => "INFO"
    case Warning => "WARNING"
    case _ => "ERROR"
  }

  /** Process-wide logger the sources layer writes through. Console-only
    * by default (library use must not create a `logs/` directory);
    * the CLI installs the file+console instance at startup.
    */
  @volatile var active: PipelineLogger = new PipelineLogger(dir = None)
}
