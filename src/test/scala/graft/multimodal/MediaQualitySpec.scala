package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("image gates fire exactly where the generator planted defects") {
    val mix = Multimodal.syntheticImageQualityMix(spark, docs)
    val sig = MediaQuality.imageSignals(mix).persist()
    try {
      val wrong = sig.filter(
        col("too_small") =!= (pmod(col("media_id"), lit(5L)) === 0) ||
          col("extreme_aspect") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) === 0) ||
          col("low_contrast") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) =!= 0 &&
            pmod(col("media_id"), lit(7L)) === 0))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // signals are real: solid placeholders report range 0, textures wide
      assert(sig.filter(col("low_contrast") && col("luma_range") =!= 0)
        .count() == 0)
      assert(sig.filter(col("passes") && col("luma_range") < 100).count() == 0)
      // filterImages keeps exactly the passing set
      val kept = MediaQuality.filterImages(mix)
      assert(kept.count() == sig.filter(col("passes")).count())
    } finally { sig.unpersist(); () }
  }

  test("audio gates fire exactly where the generator planted defects") {
    val mix = Multimodal.syntheticAudioQualityMix(spark, docs)
    val sig = MediaQuality.audioSignals(mix).persist()
    try {
      val wrong = sig.filter(
        col("too_short") =!= (pmod(col("media_id"), lit(5L)) === 0) ||
          col("silent") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) === 0) ||
          col("clipped") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) =!= 0 &&
            pmod(col("media_id"), lit(7L)) === 0))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the square wave really is wall-to-wall full scale; silence is 0
      assert(sig.filter(col("clipped") && col("clip_permille") =!= 1000)
        .count() == 0)
      assert(sig.filter(col("silent") && col("mean_abs") =!= 0).count() == 0)
      val kept = MediaQuality.filterAudio(mix)
      assert(kept.count() == sig.filter(col("passes")).count())
    } finally { sig.unpersist(); () }
  }

  test("non-decodable and wrong-type records refuse loudly") {
    val junk = Seq((1L, "image", Array[Byte](1, 2, 3), "image/png", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e = intercept[org.apache.spark.SparkException] {
      MediaQuality.imageSignals(junk).collect()
    }
    assert(e.getMessage != null)
    val wrongType = Multimodal.syntheticAudioQualityMix(spark, docs.limit(1))
    val e2 = intercept[org.apache.spark.SparkException] {
      MediaQuality.imageSignals(wrongType).collect()
    }
    assert(e2.getMessage != null)
  }
}
