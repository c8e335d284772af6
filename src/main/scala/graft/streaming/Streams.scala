package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.Quality

/** Streaming-mode pipeline pieces.
  *
  * The reference runs the same task graph in batch and streaming mode
  * (gobblin-runtime/.../ExecutionModel.java, Task.java:517); its streaming
  * specifics map onto Structured Streaming:
  *   - per-record CheckpointableWatermark + WatermarkManager commit
  *     (FineGrainedWatermarkTracker.java:63) -> checkpoint offset log;
  *   - FlushControlMessage epochs every stream.flush.interval.secs
  *     (FlushingExtractor.java:81-85) -> Trigger.ProcessingTime micro-batches;
  *   - completeness windows (KafkaAuditCountVerifier.java:44) -> tumbling
  *     window aggregation with event-time watermark;
  *   - fork multi-sink -> foreachBatch { persist; write each branch }.
  */
/** A closed activity session: [start, end] of events for one key with
  * no gap longer than the session timeout; `seq` numbers the key's
  * sessions from 1 in close order — identical to the batch face's
  * `session_seq` when events arrive per-key in event-time order (the
  * watermark contract). (Package-level: encoder codegen requires
  * top-level case classes.) */
final case class Session(key: String, seq: Long, start: java.sql.Timestamp,
                         end: java.sql.Timestamp, events: Long)

/** Per-key loop state: how many sessions have closed (drives `seq`), plus
  * the open session's bounds — `events == 0` means none open. The closed
  * counter survives timeouts, so a key that goes quiet and returns
  * continues its numbering (batch parity); the cost is one O(1) state row
  * per key ever seen — the floor for exact global per-key numbering. */
private[streaming] final case class SessionState(closed: Long, start: Long,
                                                 end: Long, events: Long)

object Streams {

  /** Replay a bounded file table as a stream (the test stand-in for a Kafka
    * topic), matching the batch schema. */
  def fileReplay(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet",
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .format(format).load(path)

  /** Tumbling event-time window counts with late-data watermark —
    * the completeness/audit aggregation in streaming form. */
  def tumblingCounts(events: DataFrame, tsCol: String, windowLen: String,
                     lateness: String = "0 seconds"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("cnt"))

  /** Stream-stream interval join: pair each left-stream row with the
    * right-stream rows sharing its keys whose event time falls in
    * [leftTs + lowerBound, leftTs + upperBound] (bounds are SQL interval
    * strings, either side may be negative, e.g. `"-1 hour"`/`"0 seconds"`
    * = right events in the hour BEFORE the left event). This is the
    * two-live-feeds face of enrichment that [[enrich]] (stream-static)
    * and [[asOfEnrich]] (stream vs slowly-changing dim) can't express —
    * attribution-style joins where BOTH sides arrive as events.
    *
    * Both sides carry the same watermark `delay`; with an inner join,
    * matches emit as they form and the watermark exists to EVICT state:
    * each side buffers only rows inside watermark + interval width, so
    * state is O(in-flight window), never O(stream history) — Spark
    * refuses the join entirely without time bounds, and so should you at
    * 100 TB. Rows arriving later than `delay` out of order miss their
    * matches (the documented watermark contract, same as
    * [[dedupWithinWatermark]]).
    *
    * Column names must be disjoint apart from `keyCols` (rename before
    * joining — the condition references both sides by name).
    *
    * `joinType` "left_outer" additionally emits every UNMATCHED left row
    * (right columns null) — but only once the watermark has passed the
    * row's match window, because until then a matching right row could
    * still arrive. The flip side: outer rows need the watermark to
    * actually ADVANCE past them; a replay whose last batch carries the
    * newest timestamps leaves the tail un-emitted until later data (or
    * the engine's trailing no-data batch) moves the watermark. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: String, rightTs: String,
                   lowerBound: String, upperBound: String,
                   delay: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    val cond = (keyCols.map(k => s"$k = __r_$k") :+
      s"$rightTs >= $leftTs + interval '$lowerBound'" :+
      s"$rightTs <= $leftTs + interval '$upperBound'").mkString(" AND ")
    val rKeyed = keyCols.foldLeft(r)((d, k) => d.withColumnRenamed(k, s"__r_$k"))
    l.join(rKeyed, expr(cond), joinType)
      .drop(keyCols.map(k => s"__r_$k"): _*)
  }

  /** Watermark-BOUNDED streaming dedup — the production default once the
    * source bounds disorder (e.g. a queue with bounded redelivery): a
    * duplicate arriving within `delay` of its first copy's event time is
    * dropped, and the key's state is EVICTED when the watermark passes
    * first-copy-ts + delay. State is O(keys in flight inside the
    * watermark), not O(every key ever seen) — the unbounded
    * `dropDuplicates` (q86) grows state forever, which at 100 TB of
    * stream history is an OOM, not a dedup. The contract's flip side: a
    * duplicate redelivered LATER than `delay` after the original
    * re-emits (its state is gone) — size `delay` to the source's actual
    * redelivery horizon. Mirrors the reference's streaming-mode record
    * dedup over a bounded window
    * (gobblin-modules/gobblin-kafka-common/.../KafkaStreamingExtractor.java
    * resume semantics). */
  def dedupWithinWatermark(stream: DataFrame, keyCols: Seq[String],
                           tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Run a streaming aggregation to completion over bounded input
    * (Trigger.AvailableNow), returning the final result as a batch
    * DataFrame via the in-memory sink. Exercises the real streaming
    * execution path; the batch-mode equivalent must produce equal output
    * (stream/batch parity is the correctness check). */
  def runToCompletion(stream: DataFrame, queryName: String,
                      statePartitions: Option[Int] = None): DataFrame =
    withStatePartitions(stream.sparkSession, statePartitions) {
      val q = stream.writeStream
        .format("memory")
        .queryName(queryName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      stream.sparkSession.table(queryName)
    }

  /** As [[runToCompletion]] but in APPEND mode — for stateless streams
    * (projections, filters, stream-static joins) where every micro-batch
    * row is final on arrival.
    *
    * `skipNoDataBatch = true` disables the engine's trailing NO-DATA
    * micro-batch (`spark.sql.streaming.noDataMicroBatches.enabled`) for
    * this run — a full extra trigger (plan + state-store open/commit on
    * every partition) whose only purpose is emitting state the final
    * watermark advance released. Opt in ONLY where that batch provably
    * emits nothing: emission happens on arrival (watermark dedup), on
    * match (inner interval join), or is driven by dedicated
    * watermark-advancing sentinel DATA batches (q117's outer join). A
    * stream whose LAST rows are released by timeout/watermark — e.g.
    * flatMapGroupsWithState sessions closing after the final data batch
    * — must keep the default, or those rows are silently dropped. */
  def runToCompletionAppend(stream: DataFrame, queryName: String,
                            statePartitions: Option[Int] = None,
                            skipNoDataBatch: Boolean = false): DataFrame =
    withStatePartitions(stream.sparkSession, statePartitions) {
      withNoDataBatchDisabled(stream.sparkSession, skipNoDataBatch) {
        val q = stream.writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        stream.sparkSession.table(queryName)
      }
    }

  /** Scope `spark.sql.streaming.noDataMicroBatches.enabled=false` around
    * a bounded streaming run (same session-global caveat as
    * [[withStatePartitions]]). */
  private def withNoDataBatchDisabled[T](
      spark: org.apache.spark.sql.SparkSession,
      disable: Boolean)(body: => T): T =
    if (!disable) body
    else {
      val key = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, prev)
    }

  /** Scope `spark.sql.shuffle.partitions` around a streaming run. A
    * STATEFUL stream opens and commits one state-store instance per
    * shuffle partition EVERY micro-batch, so the partition count must
    * track the STATE volume, not the core count: a watermark-bounded
    * join whose live state is a few thousand rows pays ~2.5x wall time
    * at 32 partitions vs 8 on identical data (measured at sf0.1). At
    * real scale raise it with the same knob — results are identical
    * either way, only the per-batch commit overhead moves. The value is
    * fixed at query START (state stores keep their layout for the
    * checkpoint's life), so the override brackets `.start()`.
    *
    * NOT REENTRANT: the override mutates the session-global conf for the
    * duration of `body` (restored in finally), so a CONCURRENT query
    * planned on the same session inside that window silently picks up
    * the override. Fine for the single-threaded bench/test drivers this
    * serves; concurrent launchers should plan on `spark.newSession()`
    * (per-session conf) instead. */
  def withStatePartitions[T](spark: org.apache.spark.sql.SparkSession,
                             n: Option[Int])(body: => T): T = n match {
    case None => body
    case Some(parts) =>
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try body finally spark.conf.set(key, prev)
  }

  /** Stream-static enrichment: join each micro-batch against a broadcast
    * dimension — the lookup-converter shape (dimension attributes added
    * during ingestion). The static side re-broadcasts per batch, so a
    * slowly-changing dim can be swapped by re-resolving the DataFrame; no
    * stream state, no watermark needed for an inner join. */
  def enrich(stream: DataFrame, dim: DataFrame,
             joinCols: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), joinCols)

  /** Streaming as-of enrichment — the temporal face of [[enrich]]: each
    * streamed row joins the dim row that was CURRENT AT ITS EVENT TIME,
    * not the latest one. Same semantics as the batch
    * [[graft.operators.TemporalJoin.asOf]] (inclusive at equal ts,
    * left-outer before the first dim row), so a backfill and the live
    * stream enrich identically — the batch/stream parity contract
    * [[sessionize]] establishes, extended to point-in-time lookup.
    *
    * Streams can't run window functions, so the batch union+forward-fill
    * shape is unavailable; this is the SCD-2 rewrite instead: the STATIC
    * side (where windows are fine) precomputes each dim row's validity
    * interval [dimTs, next dimTs), and the stream does a supported
    * stream-static broadcast left-outer join with exactly one matching
    * interval per row — zero stream-side state, zero shuffles per batch.
    * Dim rows sharing an exact (key, ts) make the interval chain
    * ill-defined — pre-dedup the dim, as with the batch operator. */
  def asOfEnrich(stream: DataFrame, dim: DataFrame, keyCols: Seq[String],
                 streamTsCol: String, dimTsCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val payload = dim.columns.filterNot(keyCols.contains).toSeq
    require(payload.contains(dimTsCol),
      s"dimTsCol $dimTsCol must be a non-key column of dim")
    val clash = payload.toSet intersect stream.columns.toSet
    require(clash.isEmpty,
      s"dim payload columns collide with stream: $clash — rename first")
    val until = "__graft_valid_until"
    val timeline = dim.withColumn(until,
      lead(col(dimTsCol), 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(col(dimTsCol))))
    val cond = keyCols.map(k => stream(k) === timeline(k))
      .reduce(_ && _) &&
      stream(streamTsCol) >= timeline(dimTsCol) &&
      (timeline(until).isNull || stream(streamTsCol) < timeline(until))
    stream.join(broadcast(timeline), cond, "left_outer")
      .select(stream.columns.map(stream(_)) ++
        payload.map(timeline(_)): _*)
  }

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * KeyValueGroupedDataset state surface the built-in windows can't
    * express (gap-based sessions close when a key goes quiet, not on a
    * fixed grid). State per key is O(1) (open-session bounds + count);
    * sessions close either by a later event arriving past the gap or by
    * the event-time timeout firing once the watermark passes end+gap —
    * so state never outlives the watermark (bounded at any key count).
    *
    * The reference has no session operator (SURVEY §2.8 "not present");
    * this is the Spark-native extension point its FlushingExtractor-style
    * per-key state would map onto. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gap: String): org.apache.spark.sql.Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    val gapMillis = gapMs.days * 86400000L + gapMs.microseconds / 1000L
    require(gapMs.months == 0, "gap must be day-or-finer")

    events.select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"))
      .withWatermark("ts", gap)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session is final; keep
            // only the closed counter so a returning key numbers on
            val s = state.get
            state.update(SessionState(s.closed + 1, 0L, 0L, 0L))
            Iterator(Session(key, s.closed + 1, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.events))
          } else {
            // interval merge, NOT materialize+sort: each event either
            // extends an adjacent session or opens its own, so per-key
            // task memory is O(sessions in the batch) — a hot key's
            // dense bot burst folds into ONE interval while a
            // toSeq.sorted would buffer the entire burst. The map holds
            // (start -> (end, events)); `closed` rides alongside.
            val prev = state.getOption
            val closedBefore = prev.map(_.closed).getOrElse(0L)
            val sessions = new java.util.TreeMap[Long, SessionState]()
            prev.filter(_.events > 0).foreach(s => sessions.put(s.start, s))
            it.foreach { case (_, tsv) =>
              val t = tsv.getTime
              val fl = sessions.floorEntry(t)
              if (fl != null && t - fl.getValue.end <= gapMillis) {
                // lands in (or within gap after) the session starting <= t
                val ext = fl.getValue.copy(
                  end = math.max(fl.getValue.end, t),
                  events = fl.getValue.events + 1)
                sessions.put(fl.getKey, ext)
                // the extension may bridge into the next session
                val nx = sessions.higherEntry(fl.getKey)
                if (nx != null && nx.getKey - ext.end <= gapMillis) {
                  val u = ext.copy(
                    end = math.max(ext.end, nx.getValue.end),
                    events = ext.events + nx.getValue.events)
                  sessions.remove(nx.getKey)
                  sessions.put(fl.getKey, u)
                }
              } else {
                val ce = sessions.ceilingEntry(t)
                if (ce != null && ce.getKey - t <= gapMillis) {
                  // within gap BEFORE the next session: extend it backward
                  val s = ce.getValue
                  sessions.remove(ce.getKey)
                  sessions.put(t, s.copy(start = t, events = s.events + 1))
                } else sessions.put(t, SessionState(0L, t, t, 1))
              }
            }
            // every session but the newest is final (numbered in time
            // order continuing the key's counter); the newest stays open
            val all = sessions.values().iterator()
            val closed = scala.collection.mutable.ListBuffer.empty[SessionState]
            var open: Option[SessionState] = None
            while (all.hasNext) {
              val s = all.next()
              open.foreach(closed += _)
              open = Some(s)
            }
            val closedNow = closedBefore + closed.size
            open.foreach { s =>
              state.update(SessionState(closedNow, s.start, s.end, s.events))
              state.setTimeoutTimestamp(s.end + gapMillis)
            }
            if (open.isEmpty && prev.isDefined)
              state.update(SessionState(closedNow, 0L, 0L, 0L))
            closed.iterator.zipWithIndex.map { case (s, i) =>
              Session(key, closedBefore + i + 1,
                new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
                s.events)
            }
          }
      }
  }

  /** Exactly-once stream -> JDBC: each micro-batch's rows commit in the
    * same database transaction as its (stream, epoch) ledger entry
    * ([[graft.sinks.JdbcWriter.writeEpochOnce]]), so the at-least-once
    * redelivery of foreachBatch after a crash-restart dedupes at the sink
    * — checkpoint (offset progress) + idempotent epoch publish = the
    * reference's streaming commit contract (FlushingExtractor epoch ack). */
  def jdbcSinkExactlyOnce(stream: DataFrame,
                          spec: graft.sinks.JdbcWriter.JdbcSpec,
                          streamName: String, checkpointDir: String,
                          trigger: Trigger = Trigger.AvailableNow()) =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        graft.sinks.JdbcWriter.writeEpochOnce(batch, spec, streamName, epochId): Unit
      }
      .start()

  /** Streaming row-quality gate: the streaming face of the batch
    * RowQualityChecker + ERR_FILE route (operators.Quality / the
    * reference's per-record policy check inside the stream task). Each
    * micro-batch splits once: rejected rows append to the dead-letter dir
    * (partitioned by epoch so redelivered batches overwrite their own
    * slice idempotently — no double-counting on crash-replay), passing
    * rows go to the delivery function. FAIL-typed policies abort the
    * query: a contract violation must stop ingestion, not leak rows into
    * the dead-letter dir. */
  def qualityGate(stream: DataFrame, policies: Seq[Quality.RowPolicy],
                  errDir: String, checkpointDir: String,
                  deliver: DataFrame => Unit,
                  trigger: Trigger = Trigger.AvailableNow()) = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val checked = Quality.checkRows(batch, policies)
        checked.passed.persist()
        try {
          // the batch face's FAIL semantics verbatim (first violating
          // rejected row aborts — no full-batch scan), epoch-tagged
          try checked.enforceFail()
          catch { case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"epoch $epochId: ${e.getMessage}", e)
          }
          checked.rejected
            .write.mode("overwrite") // idempotent per-epoch slice
            .parquet(s"$errDir/epoch=$epochId")
          deliver(checked.passed)
        } finally { checked.passed.unpersist(); () }
      }
      .start()
  }

  /** Streaming fork: one micro-batch persisted, written to N sinks — the
    * streaming equivalent of operators.Fork (per-batch atomicity; sinks see
    * each micro-batch exactly once given checkpointing + idempotent paths). */
  def forkSinks(stream: DataFrame, checkpointDir: String,
                sinks: Seq[(String, DataFrame => Unit)],
                trigger: Trigger = Trigger.AvailableNow()) = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (sinks.size > 1) batch.persist()
        sinks.foreach { case (_, write) => write(batch) }
        if (sinks.size > 1) { batch.unpersist(); () }
      }
      .start()
  }
}
