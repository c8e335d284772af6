package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaReportSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("card recovers the planted per-modality duplicate arithmetic") {
    val images = Multimodal.syntheticImageVariants(spark, docs, groups = 25)
      .filter(expr("(media_id div 25) % 2 = 0"))
    val audio = Multimodal.syntheticAudioVariants(spark, docs, groups = 20)
    val video = Multimodal.syntheticGifVariants(spark, docs, groups = 20)
      .filter(expr("(media_id div 20) % 2 = 0"))
    val card = MediaReport.card(
      images.unionByName(audio).unionByName(video))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nDocs = docs.count()
    val nImg = images.count()
    val nVid = video.count()
    assert(card("image") == ((nImg, 25L, nImg - 25)), card("image"))
    assert(card("audio") == ((nDocs, 20L, nDocs - 20)), card("audio"))
    assert(card("video") == ((nVid, 20L, nVid - 20)), card("video"))
    // a single-modality corpus yields a single-row card
    assert(MediaReport.card(audio).count() == 1)
  }
}
