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

  // ------------------------------------------------ real ImageIO path

  private lazy val images =
    Multimodal.syntheticImages(spark, Tables.load(spark, sf, "documents"))

  test("ImageIoDecoder reads REAL dims from actual PNG payloads") {
    val feats = Multimodal.extractFeatures(images,
      new Multimodal.ImageIoDecoder()).toDF()
    // dims come from the decoded pixels and must equal the generator's
    // doc_id formula for EVERY row — a codec round-trip, not a stub
    val bad = feats.filter(
      col("width") =!= lit(16) + pmod(col("media_id"), lit(32)) ||
      col("height") =!= lit(16) + pmod(col("media_id"), lit(24))).count()
    assert(bad == 0)
    assert(feats.count() == images.count())
  }

  test("ImageIoDecoder features reflect pixel content, not payload length") {
    def onePixelImage(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 4) img.setRGB(x, y, rgb)
      Multimodal.ImageCodec.write(img, "png")
    }
    val dec = new Multimodal.ImageIoDecoder(featureDim = 4)
    def rec(id: Long, rgb: Int) = Multimodal.MediaRecord(
      id, "image", onePixelImage(rgb), "image/png", "t")
    val black = dec.decode(rec(1, 0x000000))
    val white = dec.decode(rec(2, 0xffffff))
    assert(black.feature.forall(_ < 0.01f), black.feature.toSeq)
    assert(white.feature.forall(_ > 0.99f), white.feature.toSeq)
    assert(black.width == 4 && black.height == 4)
  }

  test("ImageIoDecoder decodes JPEG as well as PNG; garbage refuses loudly") {
    val img = new java.awt.image.BufferedImage(20, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jpeg = Multimodal.ImageCodec.write(img, "jpg")
    val dec = new Multimodal.ImageIoDecoder()
    val f = dec.decode(Multimodal.MediaRecord(7, "image", jpeg, "image/jpeg", "t"))
    assert(f.width == 20 && f.height == 30 && f.n_frames == 1)
    val e = intercept[IllegalArgumentException] {
      dec.decode(Multimodal.MediaRecord(8, "image",
        Array[Byte](1, 2, 3, 4), "image/png", "t"))
    }
    assert(e.getMessage.contains("not a decodable image"), e.getMessage)
  }

  test("ImageIoResizer rescales REAL pixels: dims change, content survives") {
    // a solid-color image stays (approximately) solid through bilinear
    // scaling + PNG round-trip; the decoded dims are the target's
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 32; y <- 0 until 32) img.setRGB(x, y, 0x406080)
    val r0 = Multimodal.MediaRecord(9, "image",
      Multimodal.ImageCodec.write(img, "png"), "image/png", "t")
    val rz = new Multimodal.ImageIoResizer()
    val small = rz.resize(r0, 8, 8)
    assert(small.mime == "image/png")
    val back = Multimodal.ImageCodec.read(small.payload)
    assert(back.getWidth == 8 && back.getHeight == 8)
    for (x <- 0 until 8; y <- 0 until 8)
      assert((back.getRGB(x, y) & 0xffffff) == 0x406080,
        s"solid color not preserved at ($x,$y)")
  }

  test("real resize on the distributed table: every image decodes at target dims") {
    val resized = Multimodal.resizeImages(images, 24, 18,
      new Multimodal.ImageIoResizer())
    val feats = Multimodal.extractFeatures(resized.toDF(),
      new Multimodal.ImageIoDecoder()).toDF()
    assert(feats.filter(col("width") =!= 24 || col("height") =!= 18)
      .count() == 0)
    assert(feats.count() == images.count())
  }

  // ------------------------------------------------ real WAV audio path

  private lazy val audio =
    Multimodal.syntheticAudio(spark, Tables.load(spark, sf, "documents"))

  test("WavDecoder reads REAL frame counts and durations from actual WAVs") {
    val feats = Multimodal.extractFeatures(audio,
      new Multimodal.WavDecoder()).toDF()
    val bad = feats.filter(
      col("n_frames") =!= lit(400) + pmod(col("media_id"), lit(800)) ||
      col("duration_ms") =!=
        ((lit(400) + pmod(col("media_id"), lit(800))) * 1000 / 8000)
          .cast("bigint")).count()
    assert(bad == 0)
    assert(feats.count() == audio.count())
  }

  test("WavDecoder features reflect sample energy, not payload length") {
    def wav(pcm: Array[Byte], frames: Long): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val dec = new Multimodal.WavDecoder(featureDim = 4)
    val silence = dec.decode(Multimodal.MediaRecord(1, "audio",
      wav(new Array[Byte](1600), 800), "audio/wav", "t"))
    assert(silence.feature.forall(_ == 0f), silence.feature.toSeq)
    assert(silence.n_frames == 800 && silence.duration_ms == 100)
    // half-amplitude sine: RMS ~= 0.5 / sqrt(2) ~= 0.354 in every band
    val pcm = new Array[Byte](1600)
    for (i <- 0 until 800) {
      val v = (math.sin(2 * math.Pi * 440 * i / 8000) * 16384).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val sine = dec.decode(Multimodal.MediaRecord(2, "audio",
      wav(pcm, 800), "audio/wav", "t"))
    assert(sine.feature.forall(f => f > 0.3f && f < 0.4f),
      sine.feature.toSeq)
    // garbage refuses loudly
    val e = intercept[IllegalArgumentException] {
      dec.decode(Multimodal.MediaRecord(3, "audio",
        Array[Byte](9, 9, 9, 9), "audio/wav", "t"))
    }
    assert(e.getMessage.contains("not a decodable audio"), e.getMessage)
  }

  test("a chained real decoder covers image+audio; video falls back to the stub") {
    val dec = new Multimodal.ImageIoDecoder(
      fallback = new Multimodal.WavDecoder())
    val img = Multimodal.syntheticImages(spark,
      Tables.load(spark, sf, "documents").limit(5))
    val mixed = img.unionByName(audio.limit(5))
      .unionByName(media.filter($"media_type" === "video").limit(5))
    val feats = Multimodal.extractFeatures(mixed, dec).toDF()
    assert(feats.filter($"media_type" === "image")
      .filter($"width" < 16).count() == 0)
    assert(feats.filter($"media_type" === "audio")
      .filter($"n_frames" < 400).count() == 0)
    assert(feats.filter($"media_type" === "video").count() == 5)
  }

  test("media decode runs in a STREAM: micro-batched features == batch decode") {
    val dir = tmpDir("mm-stream")
    val images = Multimodal.syntheticImages(spark,
      Tables.load(spark, sf, "documents"))
    images.repartition(4).write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val streamed = graft.streaming.Streams.runToCompletionAppend(
      Multimodal.extractFeatures(stream,
        new Multimodal.ImageIoDecoder()).toDF()
        .select("media_id", "width", "height"),
      "mm_stream_tbl")
    val batch = Multimodal.extractFeatures(images,
      new Multimodal.ImageIoDecoder()).toDF()
      .select("media_id", "width", "height")
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("readMediaDir ingests a file dump: real files decode, non-media excluded") {
    val dir = tmpDir("mm-dir")
    // a real PNG, a real JPEG, a real WAV, and a text file to exclude
    def img(w: Int, h: Int, fmt: String, name: String): Unit = {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        Multimodal.ImageCodec.write(bi, fmt))
      ()
    }
    img(12, 7, "png", "a.png")
    img(9, 5, "jpg", "b.jpg")
    val pcm = new Array[Byte](400)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 200L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.wav"),
      bos.toByteArray)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"),
      "not media".getBytes("UTF-8"))

    val media = Multimodal.readMediaDir(spark, dir)
    assert(media.count() == 3) // .txt excluded at LISTING by the glob
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.filter($"media_type" === "image").count() == 2)
    assert(media.filter($"mime" === "image/jpeg").count() == 1)
    // and the ingested payloads decode for REAL through the chain
    val feats = Multimodal.extractFeatures(media,
      new Multimodal.ImageIoDecoder(fallback = new Multimodal.WavDecoder()))
      .toDF()
    assert(feats.filter($"media_type" === "image")
      .select("width", "height").as[(Int, Int)].collect().toSet ==
      Set((12, 7), (9, 5)))
    assert(feats.filter($"media_type" === "audio")
      .select("n_frames").as[Int].head() == 200)
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
