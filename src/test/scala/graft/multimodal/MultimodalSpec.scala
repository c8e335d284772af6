package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.syntheticMedia(spark, Tables.load(spark, sf, "documents"))

  test("synthetic media table matches the canonical schema") {
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.select("media_type").distinct().as[String].collect().toSet ==
      Set("image", "audio", "video"))
  }

  test("extractFeatures decodes every record deterministically") {
    val f1 = Multimodal.extractFeatures(media)
    val f2 = Multimodal.extractFeatures(media)
    assert(f1.count() == media.count())
    val a = f1.orderBy("media_id").limit(3).collect()
    val b = f2.orderBy("media_id").limit(3).collect()
    assert(a.map(_.width).toSeq == b.map(_.width).toSeq)
    assert(a.forall(_.feature.length == 8))
    assert(a.forall(r => r.width >= 16 && r.height >= 16))
  }

  test("video records get frames, images get exactly one") {
    val f = Multimodal.extractFeatures(media).toDF()
    assert(f.filter($"media_type" === "image" && $"n_frames" =!= 1).count() == 0)
    assert(f.filter($"media_type" === "video").count() > 0)
  }

  test("resizeImages retargets images only; decode honors the new dims") {
    val resized = Multimodal.resizeImages(media, 224, 224)
    val feats = Multimodal.extractFeatures(resized.toDF()).toDF()
    val images = feats.filter(col("media_type") === "image")
    assert(images.count() > 0)
    assert(images.filter(col("width") =!= 224 || col("height") =!= 224)
      .count() == 0)
    // non-images pass through untouched: same dims as the unresized decode
    val origOther = Multimodal.extractFeatures(media).toDF()
      .filter(col("media_type") =!= "image")
      .select("media_id", "width", "height")
    val newOther = feats.filter(col("media_type") =!= "image")
      .select("media_id", "width", "height")
    assert(newOther.exceptAll(origOther).isEmpty)
    // payload (and so the content-derived feature vector) is unchanged
    val f0 = Multimodal.extractFeatures(media).toDF()
      .select("media_id", "feature")
    val f1 = feats.select("media_id", "feature")
    assert(f1.exceptAll(f0).isEmpty)
  }

  test("sampleFrames explodes every nth frame for videos only") {
    val f = Multimodal.extractFeatures(media).toDF()
    val frames = Multimodal.sampleFrames(f, every = 10)
    assert(frames.count() > 0)
    assert(frames.select(min("frame_idx")).as[Int].head == 0)
    val joined = frames.join(f, "media_id")
      .filter($"media_type" =!= "video").count()
    assert(joined == 0)
  }
}
