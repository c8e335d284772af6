package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting for MEDIA corpora — the
  * multimodal face of [[graft.text.LeakSafeSplit]]: a per-item hash
  * split puts a benchmark image and its re-encoded near-copy on opposite
  * sides of the train/eval cut, so eval numbers inflate exactly as the
  * text contamination literature measures. Here the split key is the
  * PERCEPTUAL duplicate cluster (dHash banding for images, the
  * envelope/ZCR fingerprint for audio, the majority-fold frame hash for
  * video), so near-duplicates cannot straddle by construction.
  *
  * Scale shape: one map-only decode+hash pass per record (the modality
  * dedup faces' own contract — each payload decodes exactly once), the
  * shared banded pairing (equi-join, never all-pairs), star-contraction
  * components, then a map-only portable-hash band on the CLUSTER id.
  * Nothing here adds a shuffle beyond the dedup pass a curation pipeline
  * already runs.
  */
object MediaSplit {

  /** Near-dup pairs for one modality's media frame, through each face's
    * persisted single-decode hash pass. The returned frame is PERSISTED
    * (the faces' contract) — unpersist once consumed. */
  private def pairsFor(media: DataFrame, modality: String,
                       maxHamming: Int): DataFrame = modality match {
    case "image" =>
      ImageDedup.nearDupPairs(ImageDedup.hashImages(media), maxHamming)
    case "audio" =>
      AudioDedup.nearDupPairs(AudioDedup.hashAudio(media), maxHamming)
    case "video" =>
      VideoDedup.nearDupPairs(VideoDedup.hashVideos(media), maxHamming)
    case other => throw new IllegalArgumentException(
      s"modality must be image|audio|video, got '$other'")
  }

  /** Split every media item by its perceptual cluster: members of one
    * near-dup cluster always land in the SAME band. Output: media_id,
    * cluster_id, `outCol` — bands = (label, width out of `mod`), the
    * same portable md5-banded assignment as the text path (stable under
    * corpus growth, engine-reproducible). */
  def byPerceptualCluster(media: DataFrame, modality: String,
                          maxHamming: Int, bands: Seq[(String, Int)],
                          outCol: String = "split",
                          mod: Int = 100): DataFrame = {
    val pairs = pairsFor(media, modality, maxHamming)
    try graft.text.LeakSafeSplit.byCluster(
      media.select(col("media_id")), "media_id",
      pairs.select("id_a", "id_b"), bands, outCol, mod = mod)
    finally { pairs.unpersist(); () } // cluster labels are materialized
  }

  /** Carve a fixed-size eval set with CLUSTER QUARANTINE per stratum
    * (the media face of [[graft.text.LeakSafeSplit.carveEval]]): per
    * `stratumCol` value, the `perStratum` items with the smallest
    * portable hash become `eval`; unselected members of their perceptual
    * clusters become `quarantine` (they may train NOWHERE); the rest
    * `train`. */
  def carveEval(media: DataFrame, modality: String, maxHamming: Int,
                perStratum: Int, stratumCol: String = "source",
                roleCol: String = "role"): DataFrame = {
    val pairs = pairsFor(media, modality, maxHamming)
    try {
      val resolved = graft.dedup.DupClusters.resolve(
        media.select(col("media_id"), col(stratumCol)), "media_id",
        pairs.select("id_a", "id_b"))
      graft.text.LeakSafeSplit.carveEval(resolved, "media_id",
        "cluster_id", stratumCol, perStratum, roleCol)
    } finally { pairs.unpersist(); () }
  }
}
