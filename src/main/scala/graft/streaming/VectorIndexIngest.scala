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
  *
  * The replay contract holds only while batch ids come from ONE
  * checkpoint lineage: a deleted or switched checkpoint restarts ids
  * at 0, and "replay" overwrites of batches that are NOT replays would
  * silently destroy committed index partitions. The index therefore
  * records its feeding stream's identity (`_stream.json`: checkpoint
  * location + Spark's per-checkpoint query id) on first start and
  * REFUSES a stream whose identity differs. Rebinding a new stream to
  * an existing index is an explicit act: delete `_stream.json` (and
  * fold or clear the old `batch=` partitions first).
  */
object VectorIndexIngest {

  /** `codec` selects the stored row shape — `"float"` (raw vectors),
    * `"sq8"` (int8 affine codes, [[Ann.ivfAppendIndexSq8]]) or `"pq"`
    * (product-quantization codes, [[Ann.ivfAppendIndexPq]]) — and must
    * match the bootstrap (`ivfInitIndex`/`Sq8`/`Pq`) so every batch
    * shares the row shape: a mixed-codec index would fail at read time,
    * loudly. `sq8 = true` is the legacy spelling of `codec = "sq8"`.
    *
    * `compactEvery > 0` gives a continuously-fed index its fold CADENCE:
    * every N micro-batches, `batch <= batchId - keepOut` partitions fold
    * into one layout ([[Ann.ivfCompactIndex]]) inside foreachBatch, so
    * the manifest stays bounded without a separate maintenance job. The
    * fold line + `keepOut` make the cadence replay-safe: every folded
    * batch was committed before its fold, so a Structured Streaming
    * redelivery of a folded id no-ops instead of overwriting the fold,
    * and the most recent `keepOut` batches stay out of any fold. */
  def start(stream: DataFrame, idCol: String, vecCol: String,
            indexPath: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            sq8: Boolean = false, codec: String = "float",
            compactEvery: Int = 0, keepOut: Int = 1): StreamingQuery = {
    val spark = stream.sparkSession
    require(compactEvery >= 0, s"compactEvery=$compactEvery must be >= 0")
    require(keepOut >= 1,
      s"keepOut=$keepOut must be >= 1 — folding the in-flight batch " +
        "would race its own commit")
    val effective = if (sq8) "sq8" else codec
    val append: (DataFrame, Long) => Unit = effective match {
      case "float" => Ann.ivfAppendIndex(_, idCol, vecCol, indexPath, _)
      case "sq8" => Ann.ivfAppendIndexSq8(_, idCol, vecCol, indexPath, _)
      case "pq" => Ann.ivfAppendIndexPq(_, idCol, vecCol, indexPath, _)
      case other => throw new IllegalArgumentException(
        s"unknown index codec '$other' (float, sq8, pq)")
    }
    StreamIdentity.guard(spark, indexPath, checkpointDir)
    val query = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, batchId)
        if (compactEvery > 0 && batchId % compactEvery == 0 &&
            batchId - keepOut >= 0)
          Ann.ivfCompactIndex(batch.sparkSession, indexPath,
            upTo = batchId - keepOut): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
    // Bind the index to this stream on first start. query.id is minted
    // by (and persisted in) the checkpoint's metadata file, so it IS
    // the checkpoint-lineage token: a recreated checkpoint gets a new
    // id even at the same path.
    if (StreamIdentity.read(spark, indexPath).isEmpty)
      StreamIdentity.write(spark, indexPath, checkpointDir,
        query.id.toString)
    query
  }
}
