package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media corpus DATA CARD — the media face of the text corpus report
  * (`text/CorpusReport.scala`): per modality, how many items the corpus
  * holds, how many DISTINCT perceptual contents they collapse to, and
  * the exact-duplicate rate. The numbers a dataset release documents
  * before training ships.
  *
  * Scale shape: one map-only perceptual-hash pass per modality (decode
  * confined to mapPartitions, one codec per partition), one hash-keyed
  * aggregate — no payload ever shuffles, and the card is
  * modality-bounded (<= 3 rows). */
object MediaReport {

  /** (media_type, n_items, n_distinct, n_exact_dup, dup_rate) for every
    * modality present in `media`. `every` is the video frame-sampling
    * stride. dup_rate is rounded to 4 places (portable across engines). */
  def card(media: DataFrame, every: Int = 1): DataFrame = {
    def part(tpe: String, hash: DataFrame => DataFrame,
             hcol: String): DataFrame =
      hash(media.filter(col("media_type") === tpe))
        .select(lit(tpe).as("media_type"),
          col(hcol).cast("string").as("chash"))
    val hashes =
      part("image", ImageDedup.hashImages, "dhash")
        .unionByName(part("audio", AudioDedup.hashAudio, "ahash"))
        .unionByName(part("video", VideoDedup.hashVideos(_, every), "vhash"))
    hashes.groupBy("media_type").agg(
      count(lit(1)).as("n_items"),
      countDistinct("chash").as("n_distinct"))
      .withColumn("n_exact_dup", col("n_items") - col("n_distinct"))
      .withColumn("dup_rate",
        round(col("n_exact_dup").cast("double") / col("n_items"), 4))
  }
}
