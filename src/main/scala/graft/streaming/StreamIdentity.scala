package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Checkpoint-lineage binding for stores fed by micro-batch ids. Any
  * store that publishes `batch=<id>` partitions by overwrite gets its
  * exactly-once-by-layout guarantee from ONE assumption: batch ids come
  * from a single checkpoint lineage. A deleted or switched checkpoint
  * restarts ids at 0, and "replay" overwrites of batches that are NOT
  * replays would silently destroy committed partitions. The store
  * therefore records its feeding stream's identity (`_stream.json`:
  * checkpoint location + Spark's per-checkpoint query id) on first start
  * and REFUSES a stream whose identity differs; rebinding is an explicit
  * token delete. Shared by the incremental vector indexes
  * ([[VectorIndexIngest]]) and the streaming media dedup store
  * ([[MediaDedupIngest]]). */
object StreamIdentity {

  private def tokenPath(storePath: String) = new Path(storePath, "_stream.json")

  /** Refuse an append stream whose checkpoint lineage is not the one
    * this store was bound to — its batch-id sequence would collide with
    * committed partitions. */
  def guard(spark: SparkSession, storePath: String,
            checkpointDir: String): Unit =
    read(spark, storePath).foreach { case (boundDir, boundId) =>
      require(boundDir == checkpointDir,
        s"store $storePath is bound to checkpoint $boundDir but this " +
          s"stream uses $checkpointDir — its batch ids would overwrite " +
          "committed partitions. Delete _stream.json to rebind explicitly.")
      checkpointQueryId(spark, checkpointDir) match {
        case None => require(requirement = false,
          s"store $storePath is bound to checkpoint $checkpointDir " +
            s"(query $boundId) but the checkpoint has no metadata — it " +
            "was deleted or never started; a fresh checkpoint restarts " +
            "batch ids at 0 and would overwrite committed partitions. " +
            "Delete _stream.json to rebind explicitly.")
        case Some(id) => require(id == boundId,
          s"store $storePath is bound to query $boundId but checkpoint " +
            s"$checkpointDir now holds query $id — the checkpoint was " +
            "recreated, so batch ids restart at 0. Delete _stream.json " +
            "to rebind explicitly.")
      }
    }

  /** The query id Spark persisted in the checkpoint's `metadata` file —
    * minted once per checkpoint creation, stable across restarts. */
  def checkpointQueryId(spark: SparkSession,
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

  def read(spark: SparkSession,
           storePath: String): Option[(String, String)] = {
    val p = tokenPath(storePath)
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

  def write(spark: SparkSession, storePath: String,
            checkpointDir: String, queryId: String): Unit = {
    val p = tokenPath(storePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val json = s"""{"checkpoint":${q(checkpointDir)},"query_id":${q(queryId)}}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
