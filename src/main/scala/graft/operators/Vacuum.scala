package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Crash-leftover sweeper: remove the staging/park debris that interrupted
  * jobs leave under a table root. Every write protocol in this repo is
  * crash-SAFE — a died job leaves only invisible dirs, never corrupt
  * data — but not crash-CLEAN: `.staging-*` ([[graft.sinks.AtomicPublisher]]),
  * `.old-*` (its park side), `.merge-staging` ([[Merge]]),
  * `.compact-staging` ([[FileCompaction]]) accumulate until something
  * sweeps them, and on a 100 TB estate "something" must be a job, not a
  * person.
  *
  * Reference: the reference's job launcher does exactly this sweep after
  * every run (AbstractJobLauncher cleanLeftoverStagingData /
  * JobLauncherUtils.cleanTaskStagingData — task-staging and task-output
  * dirs removed on both success and failure paths); this operator is
  * that sweep as a standalone, schedulable maintenance job.
  *
  * SAFETY: only dot-prefixed dirs matching the known protocol prefixes
  * are touched, and only when older than `olderThanMs` — a staging dir
  * younger than the grace period may belong to a LIVE job mid-publish
  * (the same reasoning as the reference's skip-if-locked). Data dirs,
  * `_graft_*` sidecars and unknown names are never deleted. Driver-side
  * metadata walk; one listing per directory level, no data read.
  */
object Vacuum {

  val protocolPrefixes: Seq[String] =
    Seq(".staging-", ".old-", ".merge-staging", ".compact-staging",
      ".undone-") // restoreBackup's forensic park of the displaced output

  final case class VacuumStats(removed: Seq[String], kept: Seq[String])

  /** Default grace period (6 h): a staging dir younger than this may
    * belong to a LIVE job mid-publish — deleting it fails that job. The
    * conservative call must be the easy call; pass 0 explicitly for a
    * sweep-everything cleanup of an estate known to be idle. */
  val DefaultGraceMs: Long = 6L * 3600 * 1000

  /** Sweep `dir` and its (arbitrarily nested) partition subdirectories
    * for protocol leftovers older than `olderThanMs` (default
    * [[DefaultGraceMs]] — a younger dir may be a live publish in
    * flight, the reference's skip-if-locked reasoning). */
  def sweepStaging(spark: SparkSession, dir: String,
                   olderThanMs: Long = DefaultGraceMs): VacuumStats = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return VacuumStats(Nil, Nil)
    val now = System.currentTimeMillis()
    val removed = Seq.newBuilder[String]
    val kept = Seq.newBuilder[String]
    def isLeftover(st: FileStatus): Boolean =
      st.isDirectory && protocolPrefixes.exists(st.getPath.getName.startsWith)
    def sweep(d: Path): Unit =
      fs.listStatus(d).foreach { st =>
        if (isLeftover(st)) {
          if (now - st.getModificationTime >= olderThanMs) {
            fs.delete(st.getPath, true)
            removed += st.getPath.toString
          } else kept += st.getPath.toString // inside the grace period
        } else if (st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")) {
          sweep(st.getPath) // partition dirs one level down
        }
      }
    sweep(root)
    VacuumStats(removed.result(), kept.result())
  }
}
