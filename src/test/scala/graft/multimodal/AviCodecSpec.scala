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

  test("fps fold is invariant across 100 fps AVI, 25 fps AVI and GIF renders") {
    // one wall-clock timeline: texture A on screen 120 ms, texture B
    // 280 ms — rendered three ways. The old centisecond quantization
    // clamped the 100 fps render's 10000 µs delays to 10 cs (a 10x
    // stretch), which skews the per-tick vote proportions (A:B 2:2 vs
    // 12:28) and breaks the invariance these faces advertise
    val a = gray(21)
    val b = gray(99)
    val avi100 = AviCodec.writeMjpeg(
      Seq.fill(12)(a) ++ Seq.fill(28)(b), usPerFrame = 10000L)
    val avi25 = AviCodec.writeMjpeg(
      Seq.fill(3)(a) ++ Seq.fill(7)(b), usPerFrame = 40000L)
    val f100 = VideoDedup.fingerprint64AtFps(avi100, fps = 10)
    val f25 = VideoDedup.fingerprint64AtFps(avi25, fps = 10)
    assert(f100 == f25,
      s"100 fps and 25 fps re-renders of one timeline must fold " +
        s"identically (got ${f100.toHexString} vs ${f25.toHexString})")
    // the GIF render of the same timeline folds within JPEG re-encode
    // tolerance (GIF is lossless, MJPEG is not — same bound the
    // cross-container test pins)
    val gif = Multimodal.GifCodec.writeAnimatedVfr(Seq(a, b), Seq(12, 28))
    val fg = VideoDedup.fingerprint64AtFps(gif, fps = 10)
    assert(java.lang.Long.bitCount(fg ^ f100) <= 3)
    // sampleAtFps agrees: 4 ticks on both AVI renders, same split
    val mk = (bytes: Array[Byte], id: Long) => Seq(
      (id, "video", bytes, "video/avi", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val t100 = VideoScenes.sampleAtFps(mk(avi100, 1L), fps = 10)
      .select("tick", "t_ms").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(t100.toSeq == Seq((0, 0L), (1, 100L), (2, 200L), (3, 300L)))
    assert(VideoScenes.sampleAtFps(mk(avi25, 2L), fps = 10).count() == 4)
  }

  test("high-fps AVI durations are exact microsecond sums, never zero") {
    // 200 fps: the old integer centisecond division reported delay 0,
    // summed duration 0 ms and silently gated valid clips as too_short
    val avi200 = AviCodec.writeMjpeg(
      (0 until 4).map(gray(_)), usPerFrame = 5000L)
    val m = Seq((1L, "video", avi200, "video/avi", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val sig = MediaQuality.videoSignals(m).head()
    assert(sig.getAs[Long]("duration_ms") == 20L)
    // 60 fps non-cs-aligned rate: exact µs arithmetic, 33 ms not 30
    val avi60 = AviCodec.writeMjpeg(Seq(gray(1), gray(2)),
      usPerFrame = 16666L)
    val m60 = Seq((2L, "video", avi60, "video/avi", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    assert(MediaQuality.videoSignals(m60).head()
      .getAs[Long]("duration_ms") == 33L)
    // GIF semantics unchanged: stated-zero delays still sum raw (the
    // quality gate reads the container's claim; only the fps faces
    // apply the browser render convention)
    val gif0 = Multimodal.GifCodec.writeAnimated(
      Seq(gray(1), gray(2)), delayCs = 1)
    val mg = Seq((3L, "video", gif0, "image/gif", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    assert(MediaQuality.videoSignals(mg).head()
      .getAs[Long]("duration_ms") == 20L)
  }

  test("8-bit and stereo PCM soundtracks normalize to the 16-bit mono norm") {
    // stereo 16-bit: L = 1000, R = 3000 -> downmix average 2000
    val nFrames = 800
    val stereo = new Array[Byte](nFrames * 4)
    (0 until nFrames).foreach { f =>
      stereo(f * 4) = (1000 & 0xff).toByte
      stereo(f * 4 + 1) = ((1000 >> 8) & 0xff).toByte
      stereo(f * 4 + 2) = (3000 & 0xff).toByte
      stereo(f * 4 + 3) = ((3000 >> 8) & 0xff).toByte
    }
    val aviStereo = AviCodec.writeMjpeg(Seq(gray(1), gray(2)),
      usPerFrame = 100000L, audio = Some((stereo, 8000)),
      audioChannels = 2, audioBits = 16)
    val aS = AviCodec.extractAudio(aviStereo).get
    assert(aS.channels == 2 && aS.bits == 16)
    val monoS = AviCodec.toMono16(aS)
    assert(monoS.length == nFrames * 2)
    assert(((monoS(0) & 0xff) | (monoS(1) << 8)) == 2000)
    // 8-bit mono: unsigned 200 -> (200 - 128) << 8 = 18432
    val eight = Array.fill(nFrames)(200.toByte)
    val avi8 = AviCodec.writeMjpeg(Seq(gray(3), gray(4)),
      usPerFrame = 100000L, audio = Some((eight, 8000)),
      audioChannels = 1, audioBits = 8)
    val a8 = AviCodec.extractAudio(avi8).get
    assert(a8.bits == 8)
    val mono8 = AviCodec.toMono16(a8)
    assert(mono8.length == nFrames * 2)
    assert(((mono8(0) & 0xff) | (mono8(1) << 8)) == (200 - 128) << 8)
    // both round-trip the full audio stack via demux: frame counts hold
    val m = Seq((1L, "video", aviStereo, "video/avi", "t"),
      (2L, "video", avi8, "video/avi", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val sig = MediaQuality.audioSignals(Multimodal.demuxAviAudio(m))
    assert(sig.filter(col("n_frames") =!= nFrames.toLong).count() == 0)
    // 24-bit still refuses loudly (no lossless norm policy)
    val e = intercept[IllegalArgumentException] {
      AviCodec.toMono16(AviCodec.AviAudio(new Array[Byte](6), 1, 8000, 24))
    }
    assert(e.getMessage.contains("24-bit"), e.getMessage)
  }

  test("multi-vids containers and crafted chunk lengths refuse loudly") {
    val good = AviCodec.writeMjpeg(Seq(gray(1), gray(2)),
      usPerFrame = 100000L)
    // splice a COPY of the vids strl list right after the original:
    // find "strl" (its LIST header starts 8 bytes earlier), duplicate
    def le32(b: Array[Byte], o: Int): Int = (b(o) & 0xff) |
      ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
    def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    val strlAt = (0 until good.length - 4).find(i =>
      new String(good, i, 4, "US-ASCII") == "strl").get
    val listOff = strlAt - 8
    val listTotal = 8 + le32(good, listOff + 4)
    val twoVids = new Array[Byte](good.length + listTotal)
    System.arraycopy(good, 0, twoVids, 0, listOff + listTotal)
    System.arraycopy(good, listOff, twoVids, listOff + listTotal, listTotal)
    System.arraycopy(good, listOff + listTotal, twoVids,
      listOff + 2 * listTotal, good.length - listOff - listTotal)
    putLe32(twoVids, 4, le32(good, 4) + listTotal)   // RIFF size
    putLe32(twoVids, 16, le32(good, 16) + listTotal) // hdrl size
    val e = intercept[IllegalArgumentException] { AviCodec.open(twoVids) }
    assert(e.getMessage.contains("more than one vids"), e.getMessage)
    // a crafted length near Int.MaxValue must hit the loud truncated
    // refusal, not wrap the walk offset negative (untrusted crawl data)
    val crafted = java.util.Arrays.copyOf(good, good.length)
    putLe32(crafted, 16, 0x7ffffff0) // hdrl LIST length
    val e2 = intercept[IllegalArgumentException] { AviCodec.open(crafted) }
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      AviCodec.extractAudio(crafted)
    }
    assert(e3.getMessage.contains("truncated"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      MediaScrub.stripAvi(crafted)
    }
    assert(e4.getMessage.contains("truncated"), e4.getMessage)
  }

  test("stripAvi keeps movi-relative idx1, rebases absolute, drops unverifiable") {
    def le32(b: Array[Byte], o: Int): Int = (b(o) & 0xff) |
      ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
    def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def find(b: Array[Byte], s: String, from: Int = 0): Int =
      (from until b.length - 4).find(i =>
        new String(b, i, 4, "US-ASCII") == s).get
    val base = AviCodec.writeMjpeg(Seq(gray(5), gray(6)),
      usPerFrame = 100000L)
    // 1. movi-relative index (what writeMjpeg emits) survives an INFO
    //    strip verbatim and still dereferences
    val rel = MediaScrub.insertAviInfo(base, "encoder v1")
    val (cleanRel, droppedRel) = MediaScrub.stripAvi(rel)
    assert(droppedRel == Seq("LIST:INFO"))
    assert(AviCodec.open(cleanRel).numFrames == 2)
    val idxRel = find(cleanRel, "idx1")
    val moviRel = find(cleanRel, "movi")
    val eOff = le32(cleanRel, idxRel + 16)
    assert(new String(cleanRel, moviRel + eOff, 4, "US-ASCII") == "00dc",
      "relative idx1 must still point at the first frame chunk")
    // 2. ABSOLUTE index: insert INFO before movi FIRST, then rewrite the
    //    entries to valid file-absolute positions (offset of the 'movi'
    //    fourcc in THIS file + the relative offset) — the strip must
    //    rebase them past the removed INFO block
    val absInfo = MediaScrub.insertAviInfo(
      java.util.Arrays.copyOf(base, base.length), "padded encoder")
    val moviAt = find(absInfo, "movi")
    val idxAt = find(absInfo, "idx1")
    var e = idxAt + 8
    while (e + 16 <= absInfo.length) {
      putLe32(absInfo, e + 8, le32(absInfo, e + 8) + moviAt)
      e += 16
    }
    val (cleanAbs, droppedAbs) = MediaScrub.stripAvi(absInfo)
    assert(droppedAbs == Seq("LIST:INFO"))
    val idxAbs = find(cleanAbs, "idx1")
    val firstAbs = le32(cleanAbs, idxAbs + 16)
    assert(new String(cleanAbs, firstAbs, 4, "US-ASCII") == "00dc",
      "absolute idx1 entries must be rebased past the removed INFO block")
    assert(AviCodec.open(cleanAbs).numFrames == 2)
    // 3. an index in NEITHER convention (corrupt offsets) is dropped —
    //    a silently wrong seek index is worse than none
    val bogus = java.util.Arrays.copyOf(base, base.length)
    val idxBog = find(bogus, "idx1")
    putLe32(bogus, idxBog + 16, 0x00bada55)
    val (cleanBog, droppedBog) =
      MediaScrub.stripAvi(MediaScrub.insertAviInfo(bogus, "x"))
    assert(droppedBog.toSet == Set("LIST:INFO", "idx1"))
    assert(!cleanBog.containsSlice("idx1".getBytes("US-ASCII")))
    assert(AviCodec.open(cleanBog).numFrames == 2)
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
