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
