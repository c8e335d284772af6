package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Staged atomic publish: write to a staging dir, then swap into the
  * final dir with renames.
  *
  * Reference: all FS writers stage task output
  * (gobblin-core/.../writer/FsDataWriter.java:58 — task-staging ->
  * task-output) and BaseDataPublisher.java:106,338 atomically renames to
  * the final directory at JOB commit, per branch — data becomes visible
  * only after every branch and every quality check succeeded
  * (COMMIT_ON_FULL_SUCCESS, JobCommitPolicy.java:35).
  *
  * Spark-first: Spark's FileCommitProtocol already gives task-level
  * atomicity (_temporary + rename); this publisher adds the job-level
  * step, split into [[stage]] (expensive write, failure-safe) and
  * [[Staged.promote]] (cheap rename swap) so a multi-branch job can stage
  * everything, run task-level policies, and only then make any branch
  * visible. Promote never deletes the previous output before the new one
  * is in place: old data is renamed aside, the staging dir renamed in,
  * and the old copy removed last. A crash between the two renames leaves
  * the final path briefly missing, but the previous output remains
  * recoverable in `.old-<name>` — [[stage]] and [[Staged.promote]] both
  * restore such a dangling park before starting, so the next run (or
  * retry) heals the gap rather than deleting the parked copy. The park
  * name is exactly `.old-` + the destination's name (no runId: a park is
  * meaningful only relative to its destination, one park per destination
  * can exist, and an exact name can never match a sibling destination
  * whose name happens to share a suffix). Parks from the earlier
  * `.old-<runId>-<name>` format are NOT auto-restored: unlike committed
  * state (manifests, watermarks), a park is a transient crash artifact
  * that exists only if a promote died inside its two-rename window —
  * recover such a leftover by renaming it to `.old-<name>` by hand.
  */
object AtomicPublisher {

  /** `keepBackup` retains the displaced previous output as
    * `.old-<name>` after a SUCCESSFUL promote (normally the park only
    * survives crashes) — the compliance-restore backup
    * (gobblin-compliance restore/: a purge keeps the pre-purge
    * version so AdhocRestorePolicy/ComplianceRestoreJob can swap it
    * back). The backup lives until the next publish replaces it or
    * [[graft.operators.Vacuum]]'s grace-period sweep reclaims it. */
  final case class WriteSpec(format: String = "parquet",
                             partitionBy: Seq[String] = Nil,
                             options: Map[String, String] = Map.empty,
                             mode: SaveMode = SaveMode.Overwrite,
                             keepBackup: Boolean = false)

  /** Anything written-but-not-yet-visible: promote makes it visible
    * atomically, abort discards it. Directories (this file) and staging
    * tables (JdbcWriter) share the contract so Fork can stage
    * heterogeneous branches and promote them together. */
  trait StagedOutput {
    def promote(): Unit
    def abort(): Unit
  }

  /** A written-but-not-yet-visible output directory. */
  final case class Staged(fs: FileSystem, staging: Path, dst: Path,
                          runId: String, keepBackup: Boolean = false)
      extends StagedOutput {
    /** Swap staged data into the final path (old aside -> new in ->
      * drop old — or KEEP old as the restore backup). */
    def promote(): Unit = {
      recoverDangling(fs, dst)
      val old = new Path(dst.getParent, s".old-${dst.getName}")
      // after recovery, a park that still coexists with dst is either
      // stale (a prior promote crashed after its swap, before the final
      // delete) or the previous publish's retained backup — either way
      // this publish's displaced output replaces it
      if (fs.exists(old)) fs.delete(old, true)
      val hadOld = fs.exists(dst)
      if (hadOld) require(fs.rename(dst, old), s"promote: cannot set aside $dst")
      if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
      if (!fs.rename(staging, dst)) {
        if (hadOld) fs.rename(old, dst) // restore previous output
        throw new IllegalStateException(s"promote rename failed: $staging -> $dst")
      }
      if (hadOld && !keepBackup) fs.delete(old, true)
    }

    /** Drop the staged data (nothing was ever visible). */
    def abort(): Unit = { if (fs.exists(staging)) fs.delete(staging, true); () }
  }

  /** A crash between promote's two renames leaves dst missing and the
    * previous output parked in `.old-<name>`. If dst is absent and its
    * park exists, rename it back so readers (and this run's overwrite
    * semantics) see the last published data again. Exact-name match only:
    * a sibling destination's park (`.old-raw-events` vs dst `events`) can
    * never be confused for this one. */
  private[sinks] def recoverDangling(fs: FileSystem, dst: Path): Unit = {
    val park = new Path(dst.getParent, s".old-${dst.getName}")
    if (!fs.exists(dst) && fs.exists(park))
      // HDFS rename reports failure via `false`, not an exception. If the
      // restore fails, the park is the ONLY copy of the last published
      // output — abort rather than fall through to promote's stale-park
      // delete, which would destroy it.
      require(fs.rename(park, dst), s"recover: cannot restore $park -> $dst")
  }

  /** Write df to `<parent>/.staging-<runId>-<name>`; nothing visible yet. */
  def stage(df: DataFrame, finalDir: String, runId: String,
            spec: WriteSpec = WriteSpec()): Staged = {
    val spark = df.sparkSession
    val dst = new Path(finalDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDangling(fs, dst)
    val staging = new Path(dst.getParent, s".staging-$runId-${dst.getName}")
    if (fs.exists(staging)) fs.delete(staging, true)

    var w = df.write.mode(spec.mode).format(spec.format).options(spec.options)
    if (spec.partitionBy.nonEmpty) w = w.partitionBy(spec.partitionBy: _*)
    // a write that dies mid-stage must not leave a half-written staging
    // dir behind — the caller has no StagedOutput to abort yet. The save
    // runs in its OWN job group so the sweep can cancel stragglers and
    // wait for them to terminate: when a task poisons the job, the
    // driver's exception races sibling tasks that are still aborting,
    // and their commit machinery re-creates the staging dir AFTER a
    // naive delete (the sweep below closes that window).
    val sc = spark.sparkContext
    val group = s"graft-stage-$runId-${dst.getName}"
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(group, s"graft stage -> $dst", interruptOnCancel = true)
    try w.save(staging.toString)
    catch { case e: Throwable =>
      try sweepFailedStaging(sc, group, fs, staging)
      catch { case _: java.io.IOException => }
      throw e
    } finally {
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
    }
    Staged(fs, staging, dst, runId, spec.keepBackup)
  }

  /** Remove a failed stage's directory DETERMINISTICALLY: cancel the
    * write's job group, wait until the status tracker reports zero
    * active tasks in it (task abort — including the file-commit
    * machinery that re-creates staging dirs — runs inside the task
    * body, so quiesced tasks can no longer resurrect the path), then
    * delete and re-check. The verify loop is the backstop for status
    * propagation lag: delete again if the dir reappears. */
  private[sinks] def sweepFailedStaging(sc: org.apache.spark.SparkContext,
                                        group: String, fs: FileSystem,
                                        staging: Path): Unit = {
    sc.cancelJobGroup(group)
    val tracker = sc.statusTracker
    def quiesced: Boolean =
      tracker.getJobIdsForGroup(group).forall { jobId =>
        tracker.getJobInfo(jobId).forall { j =>
          j.status() != org.apache.spark.JobExecutionStatus.RUNNING &&
            j.stageIds().forall { sid =>
              tracker.getStageInfo(sid).forall(_.numActiveTasks() == 0)
            }
        }
      }
    val deadline = System.nanoTime + 30L * 1000 * 1000 * 1000
    while (!quiesced && System.nanoTime < deadline) Thread.sleep(20)
    var verifies = 0
    while (verifies < 3 && System.nanoTime < deadline) {
      if (fs.exists(staging)) { fs.delete(staging, true); verifies = 0 }
      else verifies += 1
      if (verifies < 3) Thread.sleep(30)
    }
  }

  /** Single-branch convenience: stage then promote immediately. */
  def publish(df: DataFrame, finalDir: String, runId: String,
              spec: WriteSpec = WriteSpec()): Unit =
    stage(df, finalDir, runId, spec).promote()

  /** The deliberate restore (AdhocRestorePolicy/ComplianceRestoreJob
    * semantics): swap the retained `.old-<name>` backup back into the
    * destination, parking the damaged current output as
    * `.undone-<name>` for forensics. Refuses loudly when no backup
    * survives — a publish without `keepBackup` (or a Vacuum sweep)
    * consumed it, and pretending to restore would be worse than
    * failing. One restore consumes the backup (the park becomes
    * current), so a second call refuses. */
  def restoreBackup(spark: org.apache.spark.sql.SparkSession,
                    finalDir: String): Unit = {
    val dst = new Path(finalDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val park = new Path(dst.getParent, s".old-${dst.getName}")
    if (!fs.exists(dst) && fs.exists(park)) {
      // destination absent (crash-dangling park, or a fully-purged
      // partition whose backup is the only copy): the recovery rename
      // IS the restore
      recoverDangling(fs, dst)
      return
    }
    require(fs.exists(park),
      s"no backup to restore for $finalDir — publish with keepBackup " +
        "(or before a Vacuum sweep) to retain one")
    val undone = new Path(dst.getParent, s".undone-${dst.getName}")
    if (fs.exists(undone)) fs.delete(undone, true)
    if (fs.exists(dst))
      require(fs.rename(dst, undone), s"restore: cannot park damaged $dst")
    if (!fs.rename(park, dst)) {
      // the park is the only good copy — put the damaged dir back so the
      // dataset is at least readable, then fail loudly
      if (fs.exists(undone)) fs.rename(undone, dst)
      throw new IllegalStateException(s"restore rename failed: $park -> $dst")
    }
  }
}
