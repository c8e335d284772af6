package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ann.Ann

/** Streaming ANN-index maintenance: every micro-batch of embeddings is
  * appended to an incremental IVF index ([[Ann.ivfAppendIndex]]) keyed
  * by the MICRO-BATCH id — Structured Streaming replays a failed batch
  * under the same id, and the append publishes `batch=<id>` by
  * overwrite, so a replay republishes byte-identically instead of
  * duplicating index rows: exactly-once by layout, no transaction log.
  * Searches ([[Ann.ivfTopKIndexed]]) keep working mid-stream — each
  * committed batch partition is visible atomically.
  *
  * The quantizer must already be persisted at the index
  * ([[Ann.ivfInitIndex]] from a bootstrap corpus — appends assign with
  * the index's OWN model); a missing model refuses at the first batch
  * rather than silently training a different geometry per restart.
  * Watch [[Ann.appendDrift]] on a cadence and rebuild the index when
  * the stream has drifted off the trained centroids.
  */
object VectorIndexIngest {

  /** `sq8 = true` appends int8-coded rows ([[Ann.ivfAppendIndexSq8]])
    * — the index must have been bootstrapped with [[Ann.ivfInitIndexSq8]]
    * so every batch shares the row shape (a mixed float/SQ8 index
    * would fail at read time, loudly). */
  def start(stream: DataFrame, idCol: String, vecCol: String,
            indexPath: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            sq8: Boolean = false): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (sq8) Ann.ivfAppendIndexSq8(batch, idCol, vecCol, indexPath, batchId)
        else Ann.ivfAppendIndex(batch, idCol, vecCol, indexPath, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
