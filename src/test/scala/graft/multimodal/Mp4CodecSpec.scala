package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class Mp4CodecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  private def tone(n: Int, freq: Double = 300.0): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = (math.sin(2 * math.Pi * freq * i / 8000) * 8000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    pcm
  }

  private def find(b: Array[Byte], s: String, from: Int = 0): Int =
    (from until b.length - 4).find(i =>
      new String(b, i, 4, "ISO-8859-1") == s).get

  test("writePcm -> extractAudio round-trips exact sample bytes") {
    val pcm = tone(1000)
    val m4a = Mp4Codec.writePcm(pcm, rate = 8000)
    assert(Mp4Codec.isMp4(m4a))
    assert(!AviCodec.isAvi(m4a) && !MediaScrub.isRiffWave(m4a))
    val a = Mp4Codec.extractAudio(m4a).get
    assert(a.channels == 1 && a.rate == 8000 && a.bits == 16)
    assert(java.util.Arrays.equals(a.pcm, pcm))
    // twos (big-endian) storage demuxes to the SAME little-endian bytes
    val be = Mp4Codec.extractAudio(
      Mp4Codec.writePcm(pcm, rate = 8000, format = "twos")).get
    assert(java.util.Arrays.equals(be.pcm, pcm))
    // raw 8-bit round-trips verbatim and normalizes through toMono16
    val eight = Array.tabulate(500)(i => ((i % 256) - 0).toByte)
    val r8 = Mp4Codec.extractAudio(
      Mp4Codec.writePcm(eight, rate = 8000, format = "raw ")).get
    assert(r8.bits == 8 && java.util.Arrays.equals(r8.pcm, eight))
    assert(AviCodec.toMono16(r8).length == 1000)
  }

  test("strip wipes udta in place and removes trailing; offsets survive") {
    val pcm = tone(800)
    val dirty = Mp4Codec.writePcm(pcm, rate = 8000,
      udta = Some("captured at HQ"),
      trailing = "smuggled tail".getBytes("US-ASCII"))
    val (clean, wiped) = Mp4Codec.strip(dirty)
    assert(wiped == Seq("udta", "TRAILING"), wiped)
    // trailing removed; everything else stays at its byte offset (the
    // udta is wiped IN PLACE, never removed — stco offsets are absolute)
    assert(clean.length == dirty.length - "smuggled tail".length)
    val udtaAt = find(dirty, "udta") - 4
    assert(new String(clean, udtaAt + 4, 4, "ISO-8859-1") == "free")
    assert((udtaAt + 8 until udtaAt + 8 + 4).forall(clean(_) == 0))
    // none of the metadata strings survive
    val txt = new String(clean, "ISO-8859-1")
    assert(!txt.contains("captured") && !txt.contains("smuggled") &&
      !txt.contains("122.4194"))
    // the scrubbed container still demuxes BYTE-IDENTICAL audio
    val a = Mp4Codec.extractAudio(clean).get
    assert(java.util.Arrays.equals(a.pcm, pcm))
    // clean payloads return the original array; strip is idempotent
    val plain = Mp4Codec.writePcm(pcm, rate = 8000)
    assert(Mp4Codec.strip(plain)._1 eq plain)
    assert(Mp4Codec.strip(clean)._1 eq clean)
    // dirty free-space padding (a nonzero 'free' box) wipes too
    val padded = java.util.Arrays.copyOf(plain, plain.length)
    System.arraycopy("free".getBytes("US-ASCII"), 0, padded,
      find(padded, "ftyp") - 4 + 16, 0) // no-op, keep padded = plain
    val withFree = {
      val extra = new java.io.ByteArrayOutputStream()
      extra.write(plain)
      // append a free box carrying bytes (encoders leave edits there)
      val body = "leftover edit list".getBytes("US-ASCII")
      extra.write(Array[Byte](0, 0, 0, (8 + body.length).toByte))
      extra.write("free".getBytes("US-ASCII"))
      extra.write(body)
      extra.toByteArray
    }
    val (cleanF, wipedF) = Mp4Codec.strip(withFree)
    assert(wipedF == Seq("free"))
    assert(!new String(cleanF, "ISO-8859-1").contains("leftover"))
    assert(Mp4Codec.strip(cleanF)._1 eq cleanF) // all-zero free = clean
  }

  test("compressed soundtracks, multi-soun files and crafted sizes refuse loudly") {
    val m4a = Mp4Codec.writePcm(tone(500), rate = 8000)
    // stsd entry rewritten to AAC: the walk must refuse, not emit noise
    val aac = java.util.Arrays.copyOf(m4a, m4a.length)
    System.arraycopy("mp4a".getBytes("US-ASCII"), 0, aac,
      find(aac, "sowt"), 4)
    val e = intercept[IllegalArgumentException] {
      Mp4Codec.extractAudio(aac)
    }
    assert(e.getMessage.contains("mp4a"), e.getMessage)
    // a second soun trak: splice a copy of the trak into moov
    def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    def putBe32(b: Array[Byte], o: Int, v: Int): Unit = {
      b(o) = ((v >> 24) & 0xff).toByte; b(o + 1) = ((v >> 16) & 0xff).toByte
      b(o + 2) = ((v >> 8) & 0xff).toByte; b(o + 3) = (v & 0xff).toByte
    }
    val trakOff = find(m4a, "trak") - 4
    val trakLen = be32(m4a, trakOff)
    val moovOff = find(m4a, "moov") - 4
    val moovLen = be32(m4a, moovOff)
    val twoSoun = new Array[Byte](m4a.length + trakLen)
    val moovEnd = moovOff + moovLen
    System.arraycopy(m4a, 0, twoSoun, 0, moovEnd)
    System.arraycopy(m4a, trakOff, twoSoun, moovEnd, trakLen)
    System.arraycopy(m4a, moovEnd, twoSoun, moovEnd + trakLen,
      m4a.length - moovEnd)
    putBe32(twoSoun, moovOff, moovLen + trakLen)
    val e2 = intercept[IllegalArgumentException] {
      Mp4Codec.extractAudio(twoSoun)
    }
    assert(e2.getMessage.contains("2 soun tracks"), e2.getMessage)
    // a crafted moov size must refuse as TRUNCATED, not reclassify the
    // unreadable rest as strippable trailing bytes
    val crafted = java.util.Arrays.copyOf(m4a, m4a.length)
    putBe32(crafted, moovOff, 0x7fffff00)
    val e3 = intercept[IllegalArgumentException] {
      Mp4Codec.strip(crafted)
    }
    assert(e3.getMessage.contains("truncated, not trailing"), e3.getMessage)
    // appended garbage past complete structural boxes IS trailing
    val tail = new java.io.ByteArrayOutputStream()
    tail.write(m4a); tail.write("XX".getBytes("US-ASCII"))
    assert(Mp4Codec.strip(tail.toByteArray)._2 == Seq("TRAILING"))
  }

  test("MJPEG-in-mp4 video lights every face through the unified seam") {
    def gray(seed: Int, w: Int = 32, h: Int = 32) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val g = (seed * 83 + x * 31 + y * 17) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      img
    }
    // write -> open round-trip: frames, VFR µs timing, header dims
    val frames = Seq(gray(1), gray(2), gray(3))
    val mp4 = Mp4Codec.writeMjpeg(frames, Seq(50000L, 100000L, 150000L))
    assert(Mp4Codec.isMp4(mp4) && Mp4Codec.hasMjpegVideo(mp4))
    assert(VideoCodec.isVideo(mp4))
    val v = Mp4Codec.openVideo(mp4)
    assert(v.numFrames == 3 && v.width == 32 && v.height == 32)
    assert(v.frameDelaysUs.toSeq == Seq(50000L, 100000L, 150000L))
    assert(v.frame(1).getWidth == 32)
    // the VFR timing drives videoSignals durations and fps sampling
    val media = Seq((1L, "video", mp4, "video/mp4", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    assert(MediaQuality.videoSignals(media).head()
      .getAs[Long]("duration_ms") == 300L)
    val ticks = VideoScenes.sampleAtFps(media, fps = 10)
      .select("frame_idx").as[Int].collect().toSeq
    assert(ticks == Seq(0, 1, 2), s"ticks $ticks") // 0,50..150,150..300 ms
    // the fps-invariant fold matches a GIF render of the SAME timeline
    // within JPEG re-encode tolerance (5/10/15 cs delays)
    val gif = Multimodal.GifCodec.writeAnimatedVfr(frames, Seq(5, 10, 15))
    val d = java.lang.Long.bitCount(
      VideoDedup.fingerprint64AtFps(mp4, fps = 10) ^
        VideoDedup.fingerprint64AtFps(gif, fps = 10))
    assert(d <= 3, s"cross-container fps-fold distance $d > 3")
    // a video+audio mp4 serves BOTH bridges from one container
    val pcm = tone(800)
    val av = Mp4Codec.writeMjpeg(frames, Seq.fill(3)(100000L),
      audio = Some((pcm, 8000)))
    assert(Mp4Codec.openVideo(av).numFrames == 3)
    assert(java.util.Arrays.equals(
      Mp4Codec.extractAudio(av).get.pcm, pcm))
    // compressed-codec mp4 refuses loudly at every face (avc1 has no
    // JDK codec) — isVideo answers false so faces refuse up front
    val avc1 = java.util.Arrays.copyOf(mp4, mp4.length)
    System.arraycopy("avc1".getBytes("US-ASCII"), 0, avc1,
      find(avc1, "jpeg"), 4)
    assert(!Mp4Codec.hasMjpegVideo(avc1) && !VideoCodec.isVideo(avc1))
    val e = intercept[IllegalArgumentException] {
      Mp4Codec.openVideo(avc1)
    }
    assert(e.getMessage.contains("avc1"), e.getMessage)
    // scrub wipes a dirty video mp4 in place; frames decode identically
    val dirty = Mp4Codec.writeMjpeg(frames, Seq.fill(3)(100000L),
      udta = Some("drone gps"))
    val (clean, wiped) = Mp4Codec.strip(dirty)
    assert(wiped == Seq("udta"))
    assert(Mp4Codec.openVideo(clean).numFrames == 3)
    assert(ImageDedup.dHash64(Mp4Codec.openVideo(clean).frame(0)) ==
      ImageDedup.dHash64(v.frame(0)))
  }

  test("G.711 A-law/µ-law soundtracks expand to the 16-bit norm in mp4 AND AVI") {
    // spec-pinned values: µ-law 0xff is digital zero, A-law 0x55 is -8
    assert(G711.ulawToLinear(0xff.toByte) == 0)
    assert(G711.alawToLinear(0x55.toByte) == -8)
    def le16(b: Array[Byte], i: Int): Int =
      ((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort.toInt
    val pcm = tone(800, freq = 250)
    val alawBytes = Array.tabulate(800)(i =>
      G711.linearToAlaw(le16(pcm, i).toShort))
    val ulawBytes = Array.tabulate(800)(i =>
      G711.linearToUlaw(le16(pcm, i).toShort))
    val aDec = G711.expand(alawBytes, alaw = true)
    val uDec = G711.expand(ulawBytes, alaw = false)
    // companded round-trip stays within the top-segment quantization
    // step for an 8000-amplitude tone
    val maxErrA = (0 until 800).map(i =>
      math.abs(le16(aDec, i) - le16(pcm, i))).max
    val maxErrU = (0 until 800).map(i =>
      math.abs(le16(uDec, i) - le16(pcm, i))).max
    assert(maxErrA <= 300, s"alaw round-trip error $maxErrA")
    assert(maxErrU <= 300, s"ulaw round-trip error $maxErrU")
    // mp4 'alaw'/'ulaw' sample entries demux EXPANDED (bits = 16)
    val aa = Mp4Codec.extractAudio(
      Mp4Codec.writePcm(alawBytes, 8000, format = "alaw")).get
    assert(aa.bits == 16 && java.util.Arrays.equals(aa.pcm, aDec))
    val uu = Mp4Codec.extractAudio(
      Mp4Codec.writePcm(ulawBytes, 8000, format = "ulaw")).get
    assert(java.util.Arrays.equals(uu.pcm, uDec))
    // AVI wFormatTag 6/7 expands through the same tables
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val avi = AviCodec.writeMjpeg(Seq(img), usPerFrame = 100000L,
      audio = Some((ulawBytes, 8000)), audioBits = 8, audioFormatTag = 7)
    val av = AviCodec.extractAudio(avi).get
    assert(av.bits == 16 && java.util.Arrays.equals(av.pcm, uDec))
    // the demuxed telephony track runs the full audio stack
    val media = Seq(
      (1L, "audio", Mp4Codec.writePcm(alawBytes, 8000, format = "alaw"),
        "audio/mp4", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    assert(MediaQuality.audioSignals(Multimodal.demuxMp4Audio(media))
      .head().getAs[Long]("n_frames") == 800L)
    // MP3-in-AVI still refuses loudly (a real codec class)
    val mp3Avi = AviCodec.writeMjpeg(Seq(img), usPerFrame = 100000L,
      audio = Some((ulawBytes, 8000)), audioBits = 8,
      audioFormatTag = 0x55)
    val e = intercept[IllegalArgumentException] {
      AviCodec.extractAudio(mp3Avi)
    }
    assert(e.getMessage.contains("wFormatTag=85"), e.getMessage)
  }

  test("mdhd v1 and co64 layouts read identically; truncated tables refuse") {
    def gray(seed: Int) = {
      val img = new java.awt.image.BufferedImage(24, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 24).foreach(y => (0 until 24).foreach { x =>
        val g = (seed * 83 + x * 31 + y * 17) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      img
    }
    val frames = Seq(gray(4), gray(5))
    val delays = Seq(40000L, 80000L)
    val v0 = Mp4Codec.openVideo(Mp4Codec.writeMjpeg(frames, delays))
    // v1 mdhd (64-bit times) resolves the SAME timescale -> same µs
    val v1 = Mp4Codec.openVideo(
      Mp4Codec.writeMjpeg(frames, delays, mdhdV1 = true))
    assert(v1.frameDelaysUs.toSeq == v0.frameDelaysUs.toSeq)
    // co64 (64-bit chunk offsets) resolves the SAME frame spans
    val c64 = Mp4Codec.openVideo(
      Mp4Codec.writeMjpeg(frames, delays, co64 = true))
    assert(c64.numFrames == 2 &&
      ImageDedup.dHash64(c64.frame(0)) == ImageDedup.dHash64(v0.frame(0)))
    // a TRUNCATED sample table refuses loudly instead of reading the
    // neighboring box (untrusted crawl bytes): shrink stsz's declared
    // box size so its per-sample table overruns it
    val m = Mp4Codec.writeMjpeg(frames, delays)
    val szAt = (0 until m.length - 4).find(i =>
      new String(m, i, 4, "ISO-8859-1") == "stsz").get - 4
    val bad = java.util.Arrays.copyOf(m, m.length)
    bad(szAt + 3) = 16 // box too short for 2 table entries
    val e = intercept[IllegalArgumentException] {
      Mp4Codec.openVideo(bad)
    }
    assert(e.getMessage.contains("truncated table") ||
      e.getMessage.contains("malformed"), e.getMessage)
    // an unknown mdhd version refuses rather than misreading timing
    val vAt = (0 until m.length - 4).find(i =>
      new String(m, i, 4, "ISO-8859-1") == "mdhd").get + 4
    val badV = java.util.Arrays.copyOf(m, m.length)
    badV(vAt) = 7
    val e2 = intercept[IllegalArgumentException] {
      Mp4Codec.openVideo(badV)
    }
    assert(e2.getMessage.contains("mdhd version 7"), e2.getMessage)
  }

  test("mp4 videos run dedup/scenes/pipeline faces; VFR arithmetic holds") {
    val mp4s = Multimodal.syntheticMp4Videos(spark,
      docs.filter(col("doc_id") < 120))
    // quality signals: VFR duration = 25 * n * (n+1), n = 2 + id % 6
    val sig = MediaQuality.videoSignals(mp4s)
    val n = pmod(col("media_id"), lit(6L)) + 2
    assert(sig.filter(col("n_frames") =!= n).count() == 0)
    assert(sig.filter(col("duration_ms") =!= n * (n + 1) * 25).count() == 0)
    // per-frame hashes: one row per frame, real pixels
    assert(VideoDedup.hashFrames(mp4s).groupBy("media_id").count()
      .filter(col("count") =!= pmod(col("media_id"), lit(6L)) + 2)
      .count() == 0)
    // the composed frame card (one decode) agrees
    val card = Multimodal.videoFrameCard(mp4s, every = 2)
    assert(card.filter(col("width") =!=
      pmod(col("media_id"), lit(16L)) + 16).count() == 0)
    assert(card.filter(col("n_sampled") =!=
      floor((pmod(col("media_id"), lit(6L)) + 3) / 2)).count() == 0)
    // the decoder chain serves mp4 through the same mediafeatures seam
    val feats = Multimodal.extractFeatures(
      mp4s, new Multimodal.GifVideoDecoder()).toDF()
    assert(feats.filter(col("n_frames").cast("bigint") =!= n).count() == 0)
    // whole-clip fingerprints group re-renders: an mp4 and an AVI of
    // the same frames (constant rate) land within re-encode tolerance
    val avis = Multimodal.syntheticAviVideos(spark,
      docs.filter(col("doc_id") === 7L))
    val cfrMp4 = Multimodal.syntheticMp4Videos(spark,
      docs.filter(col("doc_id") === 7L))
    val h1 = VideoDedup.hashVideos(avis).select("vhash").as[Long].head()
    val h2 = VideoDedup.hashVideos(cfrMp4).select("vhash").as[Long].head()
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 3)
  }

  test("the demuxed m4a soundtrack runs the full audio stack; scrub integrates") {
    val m4as = Multimodal.syntheticM4aAudio(spark,
      docs.filter(col("doc_id") < 120), plantMetadata = true)
    // demux -> WAV rows -> real audio signals: planted counts hold for
    // BOTH byte orders (sowt on even ids, twos on odd)
    val tracks = Multimodal.demuxMp4Audio(m4as)
    val sig = MediaQuality.audioSignals(tracks)
    assert(sig.filter(col("n_frames") =!=
      pmod(col("media_id"), lit(800L)) + 800L).count() == 0)
    // distinct pitches fingerprint apart
    assert(AudioDedup.hashAudio(tracks).select("ahash").distinct()
      .count() >= 10)
    // scrubReport sees the planted udta (%4=0) and trailing (%4=2)
    val rep = graft.multimodal.MediaScrub.scrubReport(m4as)
    assert(rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0 ||
        pmod(col("media_id"), lit(4L)) === 2)).count() == 0)
    // scrub: output payloads are clean AND demux byte-identically
    val scrubbed = graft.multimodal.MediaScrub.scrub(m4as)
    assert(graft.multimodal.MediaScrub.scrubReport(scrubbed)
      .filter(col("had_metadata")).count() == 0)
    val sig2 = MediaQuality.audioSignals(Multimodal.demuxMp4Audio(scrubbed))
    assert(sig2.filter(col("n_frames") =!=
      pmod(col("media_id"), lit(800L)) + 800L).count() == 0)
    // non-mp4 payloads refuse loudly through the demux face
    val wav = Multimodal.syntheticAudio(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.demuxMp4Audio(wav).collect()
    }
    assert(e.getMessage != null)
  }
}
