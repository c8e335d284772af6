package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Media corpus DATA CARD — the media face of the text corpus report
  * (`text/CorpusReport.scala`): per modality, how many items the corpus
  * holds, how many DISTINCT perceptual contents they collapse to, and
  * the exact-duplicate rate. The numbers a dataset release documents
  * before training ships.
  *
  * Scale shape: ONE map-only perceptual-hash pass over the whole mixed
  * table (the pass switches codec on media_type per record, so the
  * binary payload column is SCANNED once — not once per modality), one
  * hash-keyed aggregate — no payload ever shuffles, and the card is
  * modality-bounded (<= 3 rows). */
object MediaReport {

  /** (media_type, n_items, n_distinct, n_exact_dup, dup_rate) for every
    * modality present in `media`. `every` is the video frame-sampling
    * stride. dup_rate is rounded to 4 places (portable across engines). */
  def card(media: DataFrame, every: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.as[Multimodal.MediaRecord].mapPartitions(_.map { r =>
      val h = r.media_type match {
        case "image" =>
          val img = Multimodal.ImageCodec.read(r.payload)
          require(img != null,
            s"media_id=${r.media_id}: payload is not a decodable image")
          ImageDedup.dHash64(img)
        case "audio" => AudioDedup.fingerprint64(r.payload)
        case "video" => VideoDedup.fingerprint64(r.payload, every)
        case other => throw new IllegalArgumentException(
          s"media_id=${r.media_id}: unknown media_type '$other'")
      }
      (r.media_type, h.toString)
    }).toDF("media_type", "chash")
    hashes.groupBy("media_type").agg(
      count(lit(1)).as("n_items"),
      countDistinct("chash").as("n_distinct"))
      .withColumn("n_exact_dup", col("n_items") - col("n_distinct"))
      .withColumn("dup_rate",
        round(col("n_exact_dup").cast("double") / col("n_items"), 4))
  }

  /** Media HYGIENE card — the ops view a crawl-cleaning run reports
    * next to [[card]]: per modality, item count, how many fail their
    * quality gates ([[MediaQuality]] defaults) and how many carry
    * container metadata ([[MediaScrub]] audit). One decode per record
    * for the quality leg; the metadata leg is a byte-level walk with
    * ZERO decodes. Joins stay WITHIN each modality slice, so mixed
    * tables whose ids only promise per-modality uniqueness still
    * aggregate correctly; <= 3 rows out. */
  def hygieneCard(media: DataFrame): DataFrame = {
    def leg(modality: String,
            signals: DataFrame => DataFrame): DataFrame = {
      val slice = media.filter(col("media_type") === modality)
      signals(slice).select(col("media_id"), col("passes"))
        .join(MediaScrub.scrubReport(slice)
          .select(col("media_id"), col("had_metadata")), Seq("media_id"))
        .agg(count(lit(1)).as("n"),
          sum(when(!col("passes"), 1L).otherwise(0L)).as("n_quality_fail"),
          sum(when(col("had_metadata"), 1L).otherwise(0L))
            .as("n_with_metadata"))
        .select(lit(modality).as("media_type"), col("n"),
          col("n_quality_fail"), col("n_with_metadata"))
    }
    leg("image", MediaQuality.imageSignals(_))
      .unionByName(leg("audio", MediaQuality.audioSignals(_)))
      .unionByName(leg("video", MediaQuality.videoSignals(_)))
      .filter(col("n") > 0) // modalities absent from the table emit no row
  }
}
