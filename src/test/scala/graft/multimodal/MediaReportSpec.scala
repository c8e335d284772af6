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

  test("hygieneCard: quality and metadata chains stay independent") {
    val mix = Multimodal.syntheticHygieneMix(spark,
      docs.filter(col("doc_id") < 200))
    val card = MediaReport.hygieneCard(mix).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val ids = 0L until 200L
    val wantFail = ids.count(i => i % 5 == 0 || i % 11 == 0 || i % 7 == 0)
    val wantMeta = ids.count(_ % 4 == 0)
    assert(card.keySet == Set("image", "audio", "video"))
    card.foreach { case (m, (n, f, md)) =>
      assert(n == 200L && f == wantFail && md == wantMeta,
        s"$m: n=$n fail=$f meta=$md want (200, $wantFail, $wantMeta)")
    }
    // a single-modality table emits one row
    assert(MediaReport.hygieneCard(
      mix.filter(col("media_type") === "audio")).count() == 1)
  }
}
