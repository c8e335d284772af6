package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

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

  /** Run a streaming aggregation to completion over bounded input
    * (Trigger.AvailableNow), returning the final result as a batch
    * DataFrame via the in-memory sink. Exercises the real streaming
    * execution path; the batch-mode equivalent must produce equal output
    * (stream/batch parity is the correctness check). */
  def runToCompletion(stream: DataFrame, queryName: String): DataFrame = {
    val spark = stream.sparkSession
    val q = stream.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
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
