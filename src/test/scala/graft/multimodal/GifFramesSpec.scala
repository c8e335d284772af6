package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Real multi-frame video-path decode: animated GIFs written by the JDK
  * sequence writer round-trip through the frame-indexed reader — frame
  * counts, per-frame pixels and summed delays all come from parsing the
  * actual container, not from doc_id arithmetic on the Spark side. */
class GifFramesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val gifs = Multimodal.syntheticAnimatedGifs(spark, docs)

  test("GifVideoDecoder reads REAL frame counts, dims and durations") {
    val out = Multimodal.extractFeatures(gifs,
      new Multimodal.GifVideoDecoder()).toDF()
    val wrong = out.filter(
      col("n_frames") =!= (lit(2) + pmod(col("media_id"), lit(6L))) ||
        col("width") =!= (lit(16) + pmod(col("media_id"), lit(16L))) ||
        col("height") =!= (lit(16) + pmod(col("media_id"), lit(12L))) ||
        col("duration_ms") =!= (lit(2) + pmod(col("media_id"), lit(6L))) * 100L)
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(out.count() == docs.count())
  }

  test("sampleGifFrames decodes every nth frame with per-frame pixels") {
    val sampled = Multimodal.sampleGifFrames(gifs, every = 2).persist()
    try {
      // ceil(n/2) sampled rows per gif, indices 0,2,4,...
      val counts = sampled.groupBy("media_id").agg(
        count(lit(1)).as("n_sampled"), max("frame_idx").as("max_idx"))
      val wrong = counts.filter(
        col("n_sampled") =!=
          floor((lit(2) + pmod(col("media_id"), lit(6L)) + 1) / 2) ||
          pmod(col("max_idx"), lit(2)) =!= 0)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // frames DIFFER within a gif (content shifts per frame index): the
      // per-frame feature must not be constant for any multi-sample gif —
      // proof the reader decoded frame i's pixels, not frame 0 repeatedly
      val distinctFeats = sampled
        .withColumn("f0", element_at(col("feature"), 1))
        .groupBy("media_id").agg(
          countDistinct("f0").as("nf"), count(lit(1)).as("n"))
      assert(distinctFeats.filter(col("n") > 1 && col("nf") === 1).count() == 0,
        "a multi-frame gif sampled identical features for every frame")
      // dims ride every sampled frame
      assert(sampled.filter(
        col("width") =!= (lit(16) + pmod(col("media_id"), lit(16L)))).count() == 0)
    } finally { sampled.unpersist(); () }
  }

  test("delays round-trip: a 25cs-per-frame gif reports 250ms per frame") {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val payload = Multimodal.GifCodec.writeAnimated(Seq(img, img, img), 25)
    val feats = new Multimodal.GifVideoDecoder().decode(
      Multimodal.MediaRecord(1L, "video", payload, "image/gif", "t"))
    assert(feats.n_frames == 3)
    assert(feats.duration_ms == 750L, s"got ${feats.duration_ms}")
  }

  test("reclassifyAnimatedGifs routes multi-frame GIFs to the video path") {
    // a dump types .gif as image by extension; the content probe must
    // flip ONLY the animated ones
    val dir = tmpDir("gif-dump")
    val animated = gifs.limit(1).select("payload")
      .collect()(0).getAs[Array[Byte]](0)
    val still = Multimodal.GifCodec.writeAnimated(Seq(
      new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)), 10)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.gif"), animated)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/s.gif"), still)
    val ingested = Multimodal.reclassifyAnimatedGifs(
      Multimodal.readMediaDir(spark, dir))
    val types = ingested.select("source", "media_type").as[(String, String)]
      .collect().map { case (p, t) => (p.split('/').last, t) }.toMap
    assert(types("a.gif") == "video", types)
    assert(types("s.gif") == "image", types)
    // the reclassified record flows through REAL frame sampling
    val sampled = Multimodal.sampleGifFrames(
      ingested.filter(col("media_type") === "video"), every = 1)
    assert(sampled.count() >= 2)
  }

  test("non-GIF video payloads refuse loudly in sampling, fall back in decode") {
    val junk = Seq((1L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
      "video/mp4", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleGifFrames(junk, every = 1).collect()
    }
    assert(e.getMessage.contains("not an animated GIF") ||
      e.getCause != null, e.getMessage)
    // the decoder contract: non-GIF video stays on the documented stub seam
    val feats = Multimodal.extractFeatures(junk,
      new Multimodal.GifVideoDecoder()).collect()
    assert(feats.head.n_frames == 8 % 300 + 1) // FakeDecoder arithmetic
  }
}
