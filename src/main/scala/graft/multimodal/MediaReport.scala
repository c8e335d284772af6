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
}
