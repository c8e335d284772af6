package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.hadoop.fs.Path

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
    guardStreamIdentity(spark, indexPath, checkpointDir)
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
    if (readToken(spark, indexPath).isEmpty)
      writeToken(spark, indexPath, checkpointDir, query.id.toString)
    query
  }

  private def tokenPath(indexPath: String) = new Path(indexPath, "_stream.json")

  /** Refuse an append stream whose checkpoint lineage is not the one
    * this index was bound to — the batch-id sequence would collide with
    * committed partitions. */
  private def guardStreamIdentity(spark: SparkSession, indexPath: String,
                                  checkpointDir: String): Unit =
    readToken(spark, indexPath).foreach { case (boundDir, boundId) =>
      require(boundDir == checkpointDir,
        s"index $indexPath is bound to checkpoint $boundDir but this " +
          s"stream uses $checkpointDir — its batch ids would overwrite " +
          "committed partitions. Delete _stream.json to rebind explicitly.")
      checkpointQueryId(spark, checkpointDir) match {
        case None => require(requirement = false,
          s"index $indexPath is bound to checkpoint $checkpointDir " +
            s"(query $boundId) but the checkpoint has no metadata — it " +
            "was deleted or never started; a fresh checkpoint restarts " +
            "batch ids at 0 and would overwrite committed partitions. " +
            "Delete _stream.json to rebind explicitly.")
        case Some(id) => require(id == boundId,
          s"index $indexPath is bound to query $boundId but checkpoint " +
            s"$checkpointDir now holds query $id — the checkpoint was " +
            "recreated, so batch ids restart at 0. Delete _stream.json " +
            "to rebind explicitly.")
      }
    }

  /** The query id Spark persisted in the checkpoint's `metadata` file —
    * minted once per checkpoint creation, stable across restarts. */
  private def checkpointQueryId(spark: SparkSession,
                                checkpointDir: String): Option[String] = {
    val p = new Path(checkpointDir, "metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
    }
  }

  private def readToken(spark: SparkSession,
                        indexPath: String): Option[(String, String)] = {
    val p = tokenPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val rx = "\"checkpoint\"\\s*:\\s*\"([^\"]+)\"[\\s\\S]*\"query_id\"\\s*:\\s*\"([^\"]+)\"".r
      rx.findFirstMatchIn(s).map(m => (m.group(1), m.group(2)))
    }
  }

  private def writeToken(spark: SparkSession, indexPath: String,
                         checkpointDir: String, queryId: String): Unit = {
    val p = tokenPath(indexPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"checkpoint":${q(checkpointDir)},"query_id":${q(queryId)}}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
