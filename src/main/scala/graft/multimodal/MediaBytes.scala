package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BYTE-exact media deduplication — the FIRST crawl dedup pass, before
  * any codec work: identical files (the same bytes mirrored under many
  * URLs) collapse on a SHA-256 of the payload with ZERO decodes. At
  * crawl scale this pass removes the bulk of duplicates for free (decode
  * is the pipeline's dominant cost; the perceptual faces then only pay
  * it for byte-distinct survivors), which is why it is modality-agnostic
  * and runs before [[ImageDedup]]/[[AudioDedup]]/[[VideoDedup]].
  *
  * Scale shape: one codegen'd hash projection (Spark's native `sha2`
  * over the binary column — no UDF), one hash shuffle for the group
  * window; payloads never decode and never broadcast. Incremental
  * admission reuses the shared Bloom path at O(batch).
  */
object MediaBytes {

  /** Every record labeled with its byte-group's representative (min
    * media_id sharing the payload SHA-256). Output (media_id, sha,
    * group_rep). */
  def exactGroups(media: DataFrame): DataFrame =
    media.select(col("media_id"), sha2(col("payload"), 256).as("sha"))
      .withColumn("group_rep",
        min(col("media_id")).over(Window.partitionBy(col("sha"))))

  /** One survivor per byte-group (the minimum id), carrying the full
    * original row — the frame the perceptual faces then decode. */
  def survivors(media: DataFrame): DataFrame =
    media.withColumn("__sha", sha2(col("payload"), 256))
      .withColumn("__rep",
        min(col("media_id")).over(Window.partitionBy(col("__sha"))))
      .filter(col("media_id") === col("__rep"))
      .drop("__sha", "__rep")

  /** O(batch) incremental byte-exact admission against a committed
    * SHA-256 store (one string column `h`), through the shared
    * Bloom-prefilter path — byte-identical to the exact anti-join.
    * Output (content_hash, media_id), the shared incremental shape. */
  def incrementalSurvivors(batch: DataFrame, committedHashes: DataFrame,
                           fpp: Double = 0.01): DataFrame =
    graft.dedup.IncrementalDedup.survivors(
      batch, committedHashes, "media_id", sha2(col("payload"), 256), fpp)
}
