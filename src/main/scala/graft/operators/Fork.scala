package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.storage.StorageLevel

import graft.sinks.AtomicPublisher
import graft.sinks.AtomicPublisher.WriteSpec

/** Fork: route/duplicate one input stream into N independently
  * transformed + checked + written branches.
  *
  * Reference: ForkOperator (gobblin-api/.../fork/ForkOperator.java:36,52,
  * 61,70) returns a per-record Boolean routing vector; Forker splits the
  * record stream into per-branch bounded queues
  * (StreamModelTaskRunner.java:140-155); BaseDataPublisher publishes all
  * branches only at job commit, after quality checks
  * (COMMIT_ON_FULL_SUCCESS — JobCommitPolicy.java:35).
  *
  * Spark-first: the routing vector becomes per-branch filter predicates;
  * the shared input is persisted ONCE and each branch is an independent
  * write action over it. Branch row counts come from `observe()` metrics
  * collected DURING each write — never from re-reading published output
  * (which would double branch IO at scale and mis-count formats whose
  * read-back needs options, e.g. headered CSV). All branches stage first;
  * the `beforePromote` hook (task-level policies) then gates a rename-only
  * promote of every branch — a failed branch or failed policy leaves all
  * previous outputs untouched. At 100 TB prefer StorageLevel.DISK_ONLY or
  * recompute (no persist) when branch predicates are selective enough that
  * two scans beat caching.
  */
object Fork {

  final case class Branch(name: String,
                          predicate: Option[Column] = None, // None = all records
                          transform: DataFrame => DataFrame = identity,
                          outDir: String,
                          spec: WriteSpec = WriteSpec())

  /** Per-branch observed counts: rows routed into the branch (after its
    * predicate, before its transform) and rows actually written. */
  final case class BranchResult(routed: Long, written: Long)

  /** Stage every branch, collect per-branch metrics from the writes, run
    * `beforePromote` (task-level policies), then promote all branches.
    * Any failure before promote leaves no branch visible/modified. */
  def run(df: DataFrame, branches: Seq[Branch], runId: String,
          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
          beforePromote: Map[String, BranchResult] => Unit = _ => ())
      : Map[String, BranchResult] = {
    val needPersist =
      branches.size > 1 && df.storageLevel == StorageLevel.NONE
    val shared = if (needPersist) df.persist(storage) else df
    val staged = scala.collection.mutable.ListBuffer
      .empty[(Branch, Observation, Observation, AtomicPublisher.StagedOutput)]
    try {
      branches.foreach { b =>
        val routed = b.predicate.fold(shared)(shared.filter)
        val obsR = Observation(s"graft_${runId}_${b.name}_routed")
        val obsW = Observation(s"graft_${runId}_${b.name}_written")
        val out = b.transform(routed.observe(obsR, count(lit(1)).as("rows")))
          .observe(obsW, count(lit(1)).as("rows"))
        val so: AtomicPublisher.StagedOutput =
          if (b.spec.format == "jdbc")
            // jdbc branches stage into a <table>_stg table; outDir names
            // the table when no dbtable option is given
            graft.sinks.JdbcWriter.stage(out, graft.sinks.JdbcWriter.JdbcSpec(
              url = b.spec.options("url"),
              table = b.spec.options.getOrElse("dbtable", b.outDir),
              mode = b.spec.mode,
              batchSize = b.spec.options.get("batchsize")
                .map(_.toInt).getOrElse(1000)), runId)
          else AtomicPublisher.stage(out, b.outDir, runId, b.spec)
        staged += ((b, obsR, obsW, so))
      }
      val results = staged.map { case (b, obsR, obsW, _) =>
        b.name -> BranchResult(
          obsR.get("rows").asInstanceOf[Long],
          obsW.get("rows").asInstanceOf[Long])
      }.toMap
      beforePromote(results)
      // promotes are cheap renames but sequential: a crash BETWEEN them
      // can leave branches at different versions until the re-run — the
      // same exposure as the reference's per-branch publish loop
      // (BaseDataPublisher publishes branch dirs one rename at a time);
      // all failure modes BEFORE the first promote publish nothing
      staged.foreach(_._4.promote())
      results
    } catch {
      case e: Throwable => staged.foreach(_._4.abort()); throw e
    } finally if (needPersist) { shared.unpersist(); () }
  }

  /** Outcome of a partial-commit fork: per-branch results for published
    * branches, per-branch error text for the ones that weren't, and the
    * branches whose EMPTY delta left their previous output untouched. */
  final case class PartialOutcome(succeeded: Map[String, BranchResult],
                                  failed: Map[String, String],
                                  skipped: Set[String] = Set.empty)

  /** COMMIT_SUCCESSFUL_TASKS (JobCommitPolicy.java:53-58 + task-level
    * publish): each branch stages, is gated, and promotes INDEPENDENTLY —
    * a branch that fails to write, fails its gate, or fails its promote
    * is aborted (its staging removed, its previous output untouched)
    * while every other branch still publishes. Use when branches feed
    * independent datasets and holding all of them hostage to one flaky
    * sink (COMMIT_ON_FULL_SUCCESS, [[run]]) costs more than a re-run of
    * the failed one. Failure text is captured per branch so the caller
    * can ledger a COMMITTED_PARTIAL outcome. Only non-fatal branch
    * errors are contained; fatal JVM errors still propagate.
    *
    * `skipEmpty(name)` = true marks a branch whose publish should be
    * SKIPPED (staging aborted, previous output untouched) when zero rows
    * route to it — the per-dataset face of "an empty extract publishes
    * nothing and preserves state" (QueryBasedSource.java:195-199). The
    * runner enables it for branches that published before under a
    * per-branch watermark, where an empty delta means "already current",
    * not "dataset became empty".
    *
    * `maxAttempts` > 1 retries a FAILED branch in place before declaring
    * it failed — the reference's task retry (ConfigurationKeys
    * .MAX_TASK_RETRIES_KEY `task.maxretries`, default 5, consumed by the
    * task retry loop in gobblin-runtime TaskExecutor). Safe here by
    * construction: a failed attempt aborts its staging, so a retry
    * re-stages from scratch and the published output is only ever
    * touched by the attempt that promotes. The failure text of the last
    * attempt is what the outcome carries, prefixed with the attempt
    * count so a retried-then-failed branch is distinguishable. */
  def runPartial(df: DataFrame, branches: Seq[Branch], runId: String,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                 branchGate: (String, BranchResult) => Unit = (_, _) => (),
                 skipEmpty: String => Boolean = _ => false,
                 maxAttempts: Int = 1)
      : PartialOutcome = {
    import scala.util.control.NonFatal
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    val needPersist =
      branches.size > 1 && df.storageLevel == StorageLevel.NONE
    val shared = if (needPersist) df.persist(storage) else df
    try {
      val outcomes: Seq[Either[(String, String), (String, Option[BranchResult])]] =
        branches.map { b =>
          var attempt = 0
          var last: Either[(String, String), (String, Option[BranchResult])] =
            null
          while (attempt < maxAttempts && (last == null || last.isLeft)) {
            attempt += 1
            last = runBranchOnce(shared, b, s"${runId}_a$attempt",
              branchGate, skipEmpty)
          }
          last.left.map { case (n, e) =>
            n -> s"after $attempt attempts: $e"
          }
        }
      PartialOutcome(
        succeeded = outcomes.collect { case Right((n, Some(r))) => n -> r }.toMap,
        failed = outcomes.collect { case Left(kv) => kv }.toMap,
        skipped = outcomes.collect { case Right((n, None)) => n }.toSet)
    } finally if (needPersist) { shared.unpersist(); () }
  }

  /** One staged attempt of one branch (the body [[runPartial]] retries). */
  private def runBranchOnce(shared: DataFrame, b: Branch, runId: String,
                            branchGate: (String, BranchResult) => Unit,
                            skipEmpty: String => Boolean)
      : Either[(String, String), (String, Option[BranchResult])] = {
    import scala.util.control.NonFatal
    try {
      val routed = b.predicate.fold(shared)(shared.filter)
      val obsR = Observation(s"graft_${runId}_${b.name}_routed")
      val obsW = Observation(s"graft_${runId}_${b.name}_written")
      val out = b.transform(routed.observe(obsR, count(lit(1)).as("rows")))
        .observe(obsW, count(lit(1)).as("rows"))
      val so: AtomicPublisher.StagedOutput =
        if (b.spec.format == "jdbc")
          graft.sinks.JdbcWriter.stage(out, graft.sinks.JdbcWriter.JdbcSpec(
            url = b.spec.options("url"),
            table = b.spec.options.getOrElse("dbtable", b.outDir),
            mode = b.spec.mode,
            batchSize = b.spec.options.get("batchsize")
              .map(_.toInt).getOrElse(1000)), runId)
        else AtomicPublisher.stage(out, b.outDir, runId, b.spec)
      // observations completed during the staged write; gate + promote
      // this branch without reference to any sibling
      try {
        val r = BranchResult(
          obsR.get("rows").asInstanceOf[Long],
          obsW.get("rows").asInstanceOf[Long])
        if (r.routed == 0 && skipEmpty(b.name)) {
          so.abort() // nothing new: keep the published output as-is
          Right(b.name -> None)
        } else {
          branchGate(b.name, r)
          so.promote()
          Right(b.name -> Some(r))
        }
      } catch {
        case NonFatal(e) => so.abort(); Left(b.name -> e.toString)
      }
    } catch { case NonFatal(e) => Left(b.name -> e.toString) }
  }

  /** Plan-only fork (no writes): per-branch DataFrames over a shared scan. */
  def plan(df: DataFrame, branches: Seq[Branch]): Map[String, DataFrame] =
    branches.map(b => b.name -> b.transform(b.predicate.fold(df)(df.filter))).toMap

  /** Fork whose branches commit through a [[graft.sinks.SnapshotLog]]:
    * every branch writes an immutable snapshot data dir, `beforePromote`
    * (task-level policies) gates the commit, then ONE pointer swap makes
    * all branches visible atomically — closing [[run]]'s sequential-rename
    * window (a crash can never leave branches at mixed versions) and
    * giving the reference's COMMIT_ON_FULL_SUCCESS across branches with
    * snapshot isolation for readers. Branch `outDir` is ignored; the
    * branch NAME keys the log. Returns the committed snapshot id and the
    * observed per-branch counts. */
  def runSnapshot(df: DataFrame, branches: Seq[Branch],
                  log: graft.sinks.SnapshotLog, runId: String,
                  storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                  beforePromote: Map[String, BranchResult] => Unit = _ => ())
      : (Long, Map[String, BranchResult]) = {
    val needPersist =
      branches.size > 1 && df.storageLevel == StorageLevel.NONE
    val shared = if (needPersist) df.persist(storage) else df
    try {
      val outputs = branches.map { b =>
        val routed = b.predicate.fold(shared)(shared.filter)
        val obsR = Observation(s"graft_${runId}_${b.name}_routed")
        val obsW = Observation(s"graft_${runId}_${b.name}_written")
        val out = b.transform(routed.observe(obsR, count(lit(1)).as("rows")))
          .observe(obsW, count(lit(1)).as("rows"))
        (b, obsR, obsW, out)
      }
      // stage runs the writes (invisible until activate); observations
      // complete during those writes
      val pending = log.stage(
        outputs.map { case (b, _, _, out) => b.name -> out }.toMap,
        branches.map(b => b.name -> b.spec).toMap)
      val results = outputs.map { case (b, obsR, obsW, _) =>
        b.name -> BranchResult(
          obsR.get("rows").asInstanceOf[Long],
          obsW.get("rows").asInstanceOf[Long])
      }.toMap
      // a policy throw leaves only invisible orphans — but must release
      // the commit lock so the next run isn't told a rival is in flight
      try beforePromote(results)
      catch { case e: Throwable => pending.abort(); throw e }
      (pending.activate(), results)
    } finally if (needPersist) { shared.unpersist(); () }
  }
}
