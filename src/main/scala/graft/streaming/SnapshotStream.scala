package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sinks.SnapshotLog

/** Streaming ingestion INTO the snapshot log: every micro-batch commits
  * one new snapshot whose branch holds just that epoch's rows, so the
  * table is an append chain of immutable epoch branches — Iceberg's
  * streaming-append model over this repo's own log. What that buys:
  *
  *  - **exactly-once through at-least-once replay**: the epoch branch
  *    is named by the micro-batch id; a redelivered batch finds its
  *    branch already in the live manifest and is a NO-OP — idempotence
  *    from the manifest itself, no separate transaction ledger (the
  *    same determinism argument as [[ContinuousIngest]], but with the
  *    atomic multi-reader-safe commit point of [[SnapshotLog]]).
  *  - **atomic visibility**: readers see an epoch entirely or not at
  *    all (pointer flip), never a half-written data dir.
  *  - **time travel & incremental consumption**: `asOf` an older
  *    snapshot excludes later epochs; [[readAppendsSince]] reads ONLY
  *    the epochs after a consumer's high-water batch — the downstream
  *    incremental-read face, O(new data) per poll.
  *
  * Reference: the reference's streaming writers flush epochs to dirs
  * and publish via rename (flush-epoch semantics in our [[Streams]]),
  * and its Iceberg module commits flushed files as table snapshots
  * (IcebergMetadataWriter.java:141) — this is both at once.
  *
  * Scale shape: each commit writes O(epoch) data + one manifest line
  * per LIVE branch; carried-forward branches repeat a pointer, their
  * data is never touched. The manifest grows with epoch count —
  * [[SnapshotLog.expire]] retires old snapshots, and a compaction
  * ([[graft.operators.FileCompaction]]-style epoch fold) can rewrite
  * many epoch branches into one; both are log-local metadata ops.
  */
object SnapshotStream {

  private def epochBranch(table: String, batchId: Long) = s"$table@$batchId"
  private def EpochRe(table: String) = (java.util.regex.Pattern.quote(table) + "@(\\d+)").r

  /** Idempotently commit one epoch: false (and NOTHING written) if this
    * batch id is at or below the table's high-water epoch — the replay
    * no-op. Monotonic-id comparison (not mere branch membership) so a
    * replay of an epoch that [[compactEpochs]] already FOLDED AWAY is
    * still refused; streaming batch ids are monotonic, so a fresh id
    * below the high-water mark can only be a redelivery. */
  def appendEpoch(log: SnapshotLog, table: String, batchId: Long,
                  df: DataFrame): Boolean = {
    if (epochs(log, table).lastOption.exists(_ >= batchId)) false
    else { log.commit(Map(epochBranch(table, batchId) -> df)); true }
  }

  /** Batch ids of the epochs visible at the live (or `asOf`) snapshot,
    * ascending. */
  def epochs(log: SnapshotLog, table: String,
             asOf: Option[Long] = None): Seq[Long] = {
    val re = EpochRe(table)
    val snap = asOf.map(log.snapshot).orElse(log.current())
    snap.map(_.branches.keys.collect { case re(id) => id.toLong }.toSeq.sorted)
      .getOrElse(Seq.empty)
  }

  /** The whole table (union of every visible epoch) at the live or
    * `asOf` snapshot. */
  def readTable(log: SnapshotLog, table: String,
                asOf: Option[Long] = None): DataFrame = {
    val ids = epochs(log, table, asOf)
    require(ids.nonEmpty, s"no epochs for $table")
    ids.map(id => log.read(epochBranch(table, id), asOf)).reduce(_ unionByName _)
  }

  /** Incremental consumption: only the epochs with batch id >
    * `afterBatch` — a consumer that remembers its high-water batch id
    * reads O(new data) per poll. Empty result keeps the schema. */
  def readAppendsSince(log: SnapshotLog, table: String,
                       afterBatch: Long): DataFrame = {
    val ids = epochs(log, table)
    require(ids.nonEmpty, s"no epochs for $table")
    val fresh = ids.filter(_ > afterBatch)
    if (fresh.isEmpty)
      readTable(log, table).limit(0)
    else fresh.map(id => log.read(epochBranch(table, id)))
      .reduce(_ unionByName _)
  }

  /** Fold every epoch with batch id <= `upToBatch` into ONE branch (kept
    * under the highest folded id, so the high-water mark — and replay
    * refusal — survives the fold). One atomic commit: the folded branch
    * replaces its inputs in the new manifest; older snapshots still see
    * the original epochs until [[SnapshotLog.expire]] sweeps them. This
    * is the manifest-size / small-file maintenance op a per-batch-commit
    * table needs — a day of 5-minute epochs folds to one branch, and
    * incremental consumers ([[readAppendsSince]]) are unaffected as long
    * as their high-water is >= `upToBatch`. */
  def compactEpochs(log: SnapshotLog, table: String, upToBatch: Long): Long = {
    val ids = epochs(log, table)
    val fold = ids.filter(_ <= upToBatch)
    require(fold.nonEmpty, s"no epochs at or below $upToBatch for $table")
    val folded = fold.map(id => log.read(epochBranch(table, id)))
      .reduce(_ unionByName _)
    log.commit(Map(epochBranch(table, fold.max) -> folded),
      drop = fold.filter(_ < fold.max).map(epochBranch(table, _)).toSet)
  }

  /** Run `stream` to completion (AvailableNow), committing one snapshot
    * per micro-batch via [[appendEpoch]] — restart-safe twice over
    * (checkpoint tracks source progress; the manifest makes replayed
    * epochs no-ops even after checkpoint loss). */
  def sink(stream: DataFrame, logRoot: String, table: String,
           checkpoint: String): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendEpoch(new SnapshotLog(spark, logRoot), table, id, batch): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
