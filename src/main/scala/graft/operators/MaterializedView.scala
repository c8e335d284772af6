package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg.AggSpec
import graft.state.StateStore

/** Watermark-driven materialized-view refresh: a stored keyed aggregate
  * plus a persisted event-time high-water mark. Each [[refresh]] folds
  * in ONLY the rows newer than the stored watermark
  * ([[IncrementalAgg.merge]] — O(delta + state), never O(history)) and
  * advances the watermark in the same run ledger the sources use
  * ([[graft.state.StateStore]]), so the extraction side's incremental
  * pattern (QueryBasedSource watermarks,
  * [[graft.planning.WatermarkPartitioner]]) and the result side's meet
  * in one job: the reference pulls increments, this keeps the ANSWER
  * incremental too.
  *
  * Crash contract: the aggregate dir is swapped via the
  * [[graft.sinks.AtomicPublisher]] park-restore protocol and the
  * watermark commits AFTER the swap — a crash between them re-folds
  * the same delta on the next run, which would double-count. The
  * guard: each refresh records the watermark it READ; a re-run after a
  * half-applied refresh sees state newer than its watermark and
  * REFUSES (operator restores the parked dir or rebuilds — loud, not
  * silently wrong). Bootstrap (no state yet) is just the first fold
  * over everything.
  *
  * Rows at exactly the stored watermark are EXCLUDED from the delta
  * (strictly-greater): the previous run already folded ts <= watermark.
  * A source that can deliver new rows AT an old timestamp needs the
  * late-data path ([[LateData]]), not a tighter watermark.
  */
object MaterializedView {

  final case class RefreshStats(bootstrapped: Boolean, deltaRows: Long,
                                watermark: String)

  private def aggDir(viewDir: String) = s"$viewDir/agg"
  private def stateDir(viewDir: String) = s"$viewDir/state"
  private val WmKey = "mv-watermark"
  private val AppliedKey = "mv-applied"
  private val CkptWmPrefix = "mv-ckpt-wm-"

  /** The current materialized aggregate (must exist). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(aggDir(viewDir))

  /** Streaming face: fold every micro-batch into the stored aggregate.
    *
    * Exactly-once is keyed on the BATCH ID within a run, not on event
    * time (the SnapshotStream pattern): Spark chooses micro-batch
    * boundaries, so a batch cut between two rows sharing an event
    * timestamp would silently drop the later rows if replay filtered on
    * `ts > watermark` — with coarse (second-granularity) timestamps no
    * sink() caller could honor that contract. Instead: a batch whose id
    * is at or below the per-checkpoint applied marker is a replay and
    * skips; a new batch folds EVERY row newer than the watermark frozen
    * when this CHECKPOINT first touched the view (its "birth
    * watermark", persisted per checkpoint), so equal-timestamp rows
    * split across batches — or across a crash/restart — of one
    * checkpoint all land exactly once. The birth watermark provides
    * cross-checkpoint idempotence: a fresh checkpoint replaying the
    * source from scratch filters everything at or below the previous
    * checkpoint's final watermark, and because the cut is frozen at
    * checkpoint birth (not re-read per run), a replay spanning many
    * batches or interrupted by crashes filters consistently, while a
    * continuing checkpoint never loses rows at the mid-run-advanced
    * watermark. The one unguardable window is an equal-timestamp group
    * split across CHECKPOINTS (stop + restart with a NEW checkpoint
    * exactly between the two halves) — that is the monotone-complete
    * contract this operator retains, now only at checkpoint
    * boundaries. The half-applied refusal applies per micro-batch
    * exactly as in batch mode. */
  def sink(stream: DataFrame, viewDir: String, tsCol: String,
           keyCols: Seq[String], specs: Seq[AggSpec],
           checkpointDir: String,
           trigger: org.apache.spark.sql.streaming.Trigger =
             org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // batch ids are monotone PER CHECKPOINT — scope the applied marker
    // to this checkpoint so a rebuilt checkpoint starts a fresh ledger
    val ckptTag = Integer.toHexString(checkpointDir.hashCode)
    // the checkpoint's birth watermark, cached per run (foreachBatch
    // runs its closure sequentially on the driver, so a var is safe)
    var birthWm: Option[Option[String]] = None
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val store = new StateStore(spark, stateDir(viewDir))
        if (birthWm.isEmpty) birthWm = Some(
          store.highWatermark(s"$CkptWmPrefix$ckptTag") match {
            // recorded at this checkpoint's first commit; "" = the view
            // had no state when this checkpoint was born
            case Some(s) => if (s.isEmpty) None else Some(s)
            case None    => store.highWatermark(WmKey)
          })
        streamBatch(spark, viewDir, store, batch, tsCol, keyCols, specs,
          ckptTag, batchId, birthWm.get)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  private def streamBatch(spark: SparkSession, viewDir: String,
                          store: StateStore, batch: DataFrame, tsCol: String,
                          keyCols: Seq[String], specs: Seq[AggSpec],
                          ckptTag: String, batchId: Long,
                          birthWm: Option[String]): Unit = {
    val bRead = s"mv-batch-read-$ckptTag"
    val bApplied = s"mv-batch-applied-$ckptTag"
    val ckptWmKey = s"$CkptWmPrefix$ckptTag"
    val readMark = store.highWatermark(bRead).map(_.toLong)
    val applied = store.highWatermark(bApplied).map(_.toLong)
    require(readMark == applied,
      s"view $viewDir is half-refreshed (batch read=$readMark applied=$applied): " +
        "a crash landed between swap and batch commit — restore the parked " +
        "aggregate dir or rebuild before streaming into it")
    if (applied.exists(batchId <= _)) return // replayed batch: already folded
    // pin the birth watermark on the checkpoint's FIRST commit, so a
    // later run of this checkpoint filters on the same frozen cut even
    // after WmKey advances ("" encodes born-with-no-state)
    val birthEntry: Map[(String, String), String] =
      if (store.highWatermark(ckptWmKey).isEmpty)
        Map((ckptWmKey, "") -> birthWm.getOrElse(""))
      else Map.empty
    val tsType = batch.schema(tsCol).dataType
    val delta = birthWm match {
      case Some(w) => batch.filter(col(tsCol) > lit(w).cast(tsType))
      case None    => batch
    }
    // the committed watermark must be monotone even when a later batch's
    // max ts is smaller (out-of-order sources), so take the max against
    // the stored watermark IN THE COLUMN'S TYPE — a lexicographic string
    // max would order epoch "9" above "10" (greatest() ignores the null
    // max of an empty delta; count disambiguates that case)
    val storedWm = store.highWatermark(WmKey)
    val wmAgg = storedWm match {
      case Some(w) => greatest(max(col(tsCol)), lit(w).cast(tsType)).cast("string")
      case None    => max(col(tsCol)).cast("string")
    }
    val probe = delta.agg(wmAgg, count(lit(1))).collect()(0)
    // isNullAt(0): a non-empty bootstrap batch whose ts values are ALL
    // NULL has no usable watermark — treat as empty (the batch-mode
    // refresh() contract) instead of committing a null watermark
    if (probe.getLong(1) == 0L || probe.isNullAt(0)) {
      // empty delta: still record the batch as applied (one commit, no
      // swap in between, so no crash window needs the two-phase marks)
      store.commit(birthEntry ++ Map((bRead, "") -> batchId.toString,
        (bApplied, "") -> batchId.toString), s"epoch-$batchId")
      return
    }
    val newWm = probe.getString(0)
    val folded =
      if (!new org.apache.hadoop.fs.Path(aggDir(viewDir)).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(aggDir(viewDir))))
        IncrementalAgg.state(delta, keyCols, specs)
      else IncrementalAgg.merge(
        Seq(read(spark, viewDir), IncrementalAgg.state(delta, keyCols, specs)),
        keyCols, specs)
    val staged = graft.sinks.AtomicPublisher.stage(folded, aggDir(viewDir),
      s"epoch-$batchId")
    // record what this batch READ, then swap, then record applied: any
    // crash window leaves read != applied and the next replay refuses
    store.commit(birthEntry ++ Map((bRead, "") -> batchId.toString,
      (WmKey, "") -> newWm), s"epoch-$batchId")
    staged.promote()
    store.commit(Map((bApplied, "") -> batchId.toString,
      (AppliedKey, "") -> newWm), s"epoch-$batchId")
  }

  def refresh(spark: SparkSession, viewDir: String, src: DataFrame,
              tsCol: String, keyCols: Seq[String],
              specs: Seq[AggSpec], runId: String): RefreshStats = {
    val store = new StateStore(spark, stateDir(viewDir))
    val wm = store.highWatermark(WmKey)
    val applied = store.highWatermark(AppliedKey)
    require(wm == applied,
      s"view $viewDir is half-refreshed (read=$wm applied=$applied): a " +
        "crash landed between swap and watermark commit — restore the " +
        "parked aggregate dir or rebuild before refreshing")
    val delta = wm match {
      case Some(w) => src.filter(col(tsCol) > lit(w).cast(src.schema(tsCol).dataType))
      case None => src
    }
    // ONE pass computes the watermark and the stats row count — a
    // separate count() would re-scan the delta just for reporting
    val probe = delta.agg(max(col(tsCol)).cast("string"),
      count(lit(1))).collect()(0)
    val deltaRows = probe.getLong(1)
    if (probe.isNullAt(0)) // empty delta: nothing to fold
      return RefreshStats(wm.isEmpty, 0L, wm.getOrElse(""))
    val newWm = probe.getString(0)
    val folded = wm match {
      case None => IncrementalAgg.state(delta, keyCols, specs)
      case Some(_) =>
        // the stored frame must be materialized BEFORE the swap deletes
        // the files it reads — stage() writes to a sibling staging dir,
        // so the read plan and the write never overlap
        IncrementalAgg.merge(
          Seq(read(spark, viewDir), IncrementalAgg.state(delta, keyCols, specs)),
          keyCols, specs)
    }
    val staged = graft.sinks.AtomicPublisher.stage(folded, aggDir(viewDir), runId)
    // record what this refresh READ, then swap, then record applied:
    // any crash window leaves read != applied and the next run refuses
    store.commit(Map((WmKey, "") -> newWm), runId)
    staged.promote()
    store.commit(Map((AppliedKey, "") -> newWm), runId)
    RefreshStats(wm.isEmpty, deltaRows, newWm)
  }
}
