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

  /** The current materialized aggregate (must exist). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    spark.read.parquet(aggDir(viewDir))

  /** Fold rows of `src` newer than the stored watermark into the view.
    * `tsCol` must be monotone-complete in the source (everything up to
    * max(ts) has arrived — the same assumption every watermark-based
    * incremental pull makes). */
  /** Streaming face: fold every micro-batch into the stored aggregate
    * through [[refresh]] — the persisted event-time watermark is the
    * exactly-once mechanism (a replayed batch's rows sit at or below
    * the committed watermark and filter to an empty delta, so replay
    * is a no-op), under the same monotone-complete contract as any
    * watermark-incremental pull: a key's rows must arrive in event-time
    * order across batches. The half-applied-refresh refusal applies
    * per micro-batch exactly as in batch mode. */
  def sink(stream: DataFrame, viewDir: String, tsCol: String,
           keyCols: Seq[String], specs: Seq[AggSpec],
           checkpointDir: String,
           trigger: org.apache.spark.sql.streaming.Trigger =
             org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        refresh(batch.sparkSession, viewDir, batch, tsCol, keyCols, specs,
          s"epoch-$batchId"): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

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
