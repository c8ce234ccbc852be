package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The single seam every eager materialization in graft goes through.
  *
  * Iterative operators (transitive closure, breadcrumbs, connected
  * components) and multi-consumer frames (band tables, shingle frames)
  * must be materialized eagerly: once to truncate lineage so per-iteration
  * plans stay O(1), and once so expensive derivations aren't re-executed
  * per consumer. HOW to materialize is a deployment decision, not an
  * operator decision:
  *
  *  - `local` (default): `localCheckpoint(eager = true)` — blocks stored
  *    UNREPLICATED on executors. Fastest (no DFS round-trip); correct on
  *    `local[*]` where executor == driver process. On a real cluster a
  *    single lost executor makes the checkpointed RDD unrecoverable and
  *    aborts the job — acceptable for short interactive work, NOT for a
  *    multi-hour 100 TB dedup.
  *  - `reliable`: `checkpoint(eager = true)` to the fault-tolerant
  *    checkpoint directory (HDFS/object store). An executor loss
  *    re-reads the checkpointed blocks from the DFS; lineage is truncated
  *    exactly like the local variant, so iterative plan growth is equally
  *    bounded. The directory comes from `SparkContext.setCheckpointDir`
  *    or, if unset, from `spark.graft.materialize.dir`.
  *  - `persist`: `persist(MEMORY_AND_DISK_2)` + a count() to force it —
  *    2× replicated blocks, recompute-from-lineage on double loss. NOTE:
  *    persist does NOT truncate lineage, so the iterative operators'
  *    analysis cost grows with iteration count under this mode — it is
  *    the right choice only for the single-shot multi-consumer frames
  *    (band/shingle/SRP tables), which is why `reliable` is the
  *    recommended cluster setting and `persist` an opt-in.
  *
  * Select with `spark.conf.set("spark.graft.materialize.mode", ...)` (a
  * runtime conf — switchable per job without rebuilding the session).
  */
object Materialize {

  /** Runtime conf key selecting the materialization strategy:
    * `local` (default) | `reliable` | `persist`.
    */
  val ModeKey = "spark.graft.materialize.mode"

  /** Fallback checkpoint directory for `reliable` mode when
    * `SparkContext.setCheckpointDir` was not called.
    */
  val DirKey = "spark.graft.materialize.dir"

  // last conf value pushed to SparkContext.setCheckpointDir (see below)
  @volatile private var lastReliableDir: Option[String] = None

  /** Eagerly materialize `df` under the configured strategy and return
    * the materialized frame (lineage-truncated under `local`/`reliable`).
    * Usable point-free: `df.transform(Materialize.checkpoint)`.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint(eager = true)
      case "reliable" =>
        val sc = spark.sparkContext
        spark.conf.getOption(DirKey) match {
          case Some(dir) =>
            // Set ONCE per distinct conf value, not per call:
            // setCheckpointDir mkdirs a fresh UUID subdirectory every
            // invocation — per-iteration calls in the closure/CC loops
            // would issue one namenode round-trip per round and scatter
            // artifacts over dozens of directories. The resolved dir is
            // remembered so a runtime conf change still takes effect.
            if (!lastReliableDir.contains(dir)) {
              sc.setCheckpointDir(dir)
              lastReliableDir = Some(dir)
            }
          case None if sc.getCheckpointDir.nonEmpty => ()
          case None => throw new IllegalStateException(
            s"$ModeKey=reliable requires SparkContext.setCheckpointDir(...) or $DirKey")
        }
        df.checkpoint(eager = true)
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // force the blocks now; callers rely on eager semantics
        p
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be local|reliable|persist, got '$other'")
    }
  }
}
