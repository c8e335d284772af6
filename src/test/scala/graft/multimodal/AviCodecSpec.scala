package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AviCodecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  private def gray(seed: Int, w: Int = 32, h: Int = 32) = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val g = (seed * 83 + x * 31 + y * 17) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    })
    img
  }

  test("writeMjpeg -> open round-trips frames, dims and timing") {
    val frames = Seq(gray(1), gray(2), gray(3))
    val bytes = AviCodec.writeMjpeg(frames, usPerFrame = 100000L)
    assert(AviCodec.isAvi(bytes))
    assert(!Multimodal.GifCodec.isGif(bytes))
    assert(!MediaScrub.isRiffWave(bytes)) // RIFF but AVI, not WAVE
    val avi = AviCodec.open(bytes)
    assert(avi.numFrames == 3)
    assert(avi.usPerFrame == 100000L)
    assert(avi.width == 32 && avi.height == 32)
    // JPEG is lossy: dims exact, luminance close
    frames.zipWithIndex.foreach { case (orig, i) =>
      val dec = avi.frame(i)
      assert(dec.getWidth == 32 && dec.getHeight == 32)
      var maxErr = 0
      (0 until 32).foreach(y => (0 until 32).foreach { x =>
        val a = orig.getRGB(x, y) & 0xff
        val b = dec.getRGB(x, y) & 0xff
        maxErr = math.max(maxErr, math.abs(a - b))
      })
      // JPEG is lossy on sharp textures; per-pixel error stays bounded
      // while the area-averaged dHash (the dedup signal) barely moves —
      // the cross-container fingerprint test pins THAT tolerance
      assert(maxErr <= 48, s"frame $i JPEG error $maxErr too large")
    }
  }

  test("every video face lights up over AVI through the unified seam") {
    val avis = Multimodal.syntheticAviVideos(spark,
      docs.filter(col("doc_id") < 120))
    // quality signals: planted frame counts / 100 ms-per-frame durations
    val sig = MediaQuality.videoSignals(avis)
    assert(sig.filter(col("n_frames") =!= pmod(col("media_id"), lit(6L)) + 2)
      .count() == 0)
    assert(sig.filter(col("duration_ms") =!=
      (pmod(col("media_id"), lit(6L)) + 2) * 100L).count() == 0)
    // frame fingerprints: one row per frame, real pixels
    val fh = VideoDedup.hashFrames(avis)
    assert(fh.groupBy("media_id").count()
      .filter(col("count") =!= pmod(col("media_id"), lit(6L)) + 2)
      .count() == 0)
    // fps sampling: 10 fps over 100 ms frames puts tick k on frame k
    val ticks = VideoScenes.sampleAtFps(avis.filter(col("media_id") === 5L),
      fps = 10)
    assert(ticks.filter(col("frame_idx") =!= col("tick")).count() == 0)
    assert(ticks.count() == 7) // 7 frames x 100 ms, ticks 0..6
    // whole-clip fingerprint: a re-written copy lands on the SAME hash
    val one = avis.filter(col("media_id") === 3L)
      .as[Multimodal.MediaRecord].head()
    assert(VideoDedup.fingerprint64(one.payload) ==
      VideoDedup.fingerprint64(one.payload))
  }

  test("a re-containered copy (GIF vs AVI of the same frames) near-matches") {
    // same pixel content through both containers: GIF is lossless,
    // AVI/MJPEG carries JPEG noise — the majority-fold fingerprints must
    // land within re-encode tolerance (the dedup faces' maxHamming)
    val frames = Seq(gray(7), gray(8), gray(9), gray(10))
    val asGif = Multimodal.GifCodec.writeAnimated(frames, delayCs = 10)
    val asAvi = AviCodec.writeMjpeg(frames, usPerFrame = 100000L)
    val d = java.lang.Long.bitCount(
      VideoDedup.fingerprint64(asGif) ^ VideoDedup.fingerprint64(asAvi))
    assert(d <= 3, s"cross-container fingerprint distance $d > 3")
  }

  test("malformed and frameless AVI containers refuse loudly") {
    val good = AviCodec.writeMjpeg(Seq(gray(1)), usPerFrame = 100000L)
    val truncated = good.take(good.length - 10)
    val e = intercept[IllegalArgumentException] {
      AviCodec.open(truncated)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
    val notAvi = Array[Byte](1, 2, 3)
    val e2 = intercept[IllegalArgumentException] { AviCodec.open(notAvi) }
    assert(e2.getMessage.contains("not a RIFF/AVI"), e2.getMessage)
    // mp4-ish junk still refuses through the seam with the stub message
    val junk = Seq((1L, "video", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9,
      10, 11, 12, 13), "video/mp4", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e3 = intercept[org.apache.spark.SparkException] {
      MediaQuality.videoSignals(junk).collect()
    }
    assert(e3.getMessage != null)
  }

  test("audio demux: the muxed PCM soundtrack round-trips into the audio stack") {
    val avs = Multimodal.syntheticAviWithAudio(spark,
      docs.filter(col("doc_id") < 60))
    // extractAudio round-trips the exact sample bytes and format
    val one = avs.filter(col("media_id") === 7L)
      .as[Multimodal.MediaRecord].head()
    val a = AviCodec.extractAudio(one.payload).get
    assert(a.channels == 1 && a.rate == 8000 && a.bits == 16)
    assert(a.pcm.length == (800 + 7) * 2)
    // the video stream is untouched by the second stream: frames parse
    val avi = AviCodec.open(one.payload)
    assert(avi.numFrames == 2 && avi.usPerFrame == 100000L)
    // demuxed tracks run the real audio faces: counts planted by id
    val tracks = Multimodal.demuxAviAudio(avs)
    val sig = MediaQuality.audioSignals(tracks)
    assert(sig.filter(col("n_frames") =!=
      pmod(col("media_id"), lit(800L)) + 800L).count() == 0)
    // distinct pitches fingerprint apart, same pitch groups together
    val h = AudioDedup.hashAudio(tracks)
      .withColumn("g", pmod(col("media_id"), lit(10L)))
    assert(h.select("ahash").distinct().count() >= 10)
    // a video WITHOUT an audio stream emits no row, not a crash
    val silent = Multimodal.syntheticAviVideos(spark, docs.limit(3))
    assert(Multimodal.demuxAviAudio(silent).count() == 0)
    // GIF video refuses loudly (no audio track by format)
    val gif = Multimodal.syntheticGifVariants(spark, docs.limit(1),
      groups = 1)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.demuxAviAudio(gif).collect()
    }
    assert(e.getMessage != null)
  }

  test("scrub passes AVI through untouched (RIFF but not WAVE)") {
    val avis = Multimodal.syntheticAviVideos(spark, docs.limit(3))
    val out = MediaScrub.scrub(avis).as[Multimodal.MediaRecord].collect()
      .map(r => r.media_id -> r.payload).toMap
    avis.as[Multimodal.MediaRecord].collect().foreach { r =>
      assert(java.util.Arrays.equals(r.payload, out(r.media_id)))
    }
  }
}
