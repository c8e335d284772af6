package graft.multimodal

import graft.SparkSpec

/** FLAC codec faces: LOSSLESS round-trips (the format's defining
  * property — decode must equal the source exactly) across bit
  * depths, stereo decorrelations and the LPC wire grammar; CRC
  * verification; metadata block stripping; and the normalized-seam
  * routing that lights up every audio face. */
class FlacSpec extends SparkSpec {

  private def sine(n: Int, freq: Double, rate: Int = 8000,
                   amp: Double = 8000): Array[Int] =
    Array.tabulate(n)(i => (math.sin(2 * math.Pi * freq * i / rate) * amp).toInt)

  test("16-bit mono round-trip is EXACT across frame boundaries") {
    val src = sine(10000, 440.0) // 3 frames at blockSize 4096
    val flac = Flac.encode(src, channels = 1, rate = 8000)
    val (out, ch, rate, bits) = Flac.decode(flac)
    assert(ch == 1 && rate == 8000 && bits == 16)
    assert(out.sameElements(src))
  }

  test("8-bit mono round-trip is exact") {
    val src = sine(900, 300.0, amp = 100)
    val flac = Flac.encode(src, channels = 1, rate = 8000, bits = 8)
    val (out, _, _, bits) = Flac.decode(flac)
    assert(bits == 8 && out.sameElements(src))
  }

  test("stereo round-trips exactly under ALL four channel assignments") {
    val n = 3000
    val l = sine(n, 440.0)
    val r = sine(n, 620.0, amp = 5000)
    val interleaved = Array.tabulate(n * 2)(i =>
      if (i % 2 == 0) l(i / 2) else r(i / 2))
    Seq("independent", "leftside", "rightside", "midside").foreach { st =>
      val flac = Flac.encode(interleaved, channels = 2, rate = 8000,
        stereo = st)
      val (out, ch, _, _) = Flac.decode(flac)
      assert(ch == 2 && out.sameElements(interleaved), st)
    }
  }

  test("LPC subframes decode (order-1 LPC wire grammar round-trips)") {
    val src = sine(5000, 250.0)
    val flac = Flac.encode(src, channels = 1, rate = 8000, mode = "lpc1")
    val (out, _, _, _) = Flac.decode(flac)
    assert(out.sameElements(src))
  }

  test("corrupted frame bytes fail the CRC loudly, never decode to noise") {
    val src = sine(2000, 500.0)
    val flac = Flac.encode(src, channels = 1, rate = 8000)
    val (_, audioStart) = Flac.metaBlocks(flac)
    // flip a bit deep in the first frame's residuals
    val bad = flac.clone()
    bad(audioStart + 40) = (bad(audioStart + 40) ^ 0x10).toByte
    val ex = intercept[IllegalArgumentException] { Flac.decode(bad) }
    assert(ex.getMessage.toLowerCase.contains("crc") ||
      ex.getMessage.contains("sync") || ex.getMessage.contains("corrupt"),
      ex.getMessage)
  }

  test("stripMeta drops VORBIS_COMMENT/PICTURE, keeps STREAMINFO, decode unchanged") {
    val src = sine(1500, 350.0)
    val flac = Flac.encode(src, channels = 1, rate = 8000,
      comment = Some("recorded at 12.34,56.78 by rig-7"),
      picture = Some(Array.fill[Byte](64)(0x42)))
    assert(Flac.metaReport(flac).sorted == Seq("PICTURE", "VORBIS_COMMENT"))
    val (clean, dropped) = Flac.stripMeta(flac)
    assert(dropped.sorted == Seq("PICTURE", "VORBIS_COMMENT"))
    assert(clean.length < flac.length)
    val (out, _, _, _) = Flac.decode(clean)
    assert(out.sameElements(src), "audio frames byte-identical after strip")
    // idempotent: clean payload returns the original array
    val (again, d2) = Flac.stripMeta(clean)
    assert(d2.isEmpty && (again eq clean))
  }

  test("the normalized seam routes FLAC: fingerprint EQUALS the WAV twin's") {
    // lossless decode => identical samples => identical fingerprint,
    // exactly (unlike the lossy ADPCM bound)
    val src = sine(4000, 440.0)
    val flac = Flac.encode(src, channels = 1, rate = 8000)
    val pcm = new Array[Byte](src.length * 2)
    src.indices.foreach { i =>
      pcm(2 * i) = (src(i) & 0xff).toByte
      pcm(2 * i + 1) = ((src(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, src.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
    assert(AudioDedup.fingerprint64(flac) ==
      AudioDedup.fingerprint64(bos.toByteArray))
    val (bytes, ch, rate) = AudioDedup.openNormalized16(flac)
    assert(ch == 1 && rate == 8000f && bytes.length == src.length * 2)
  }

  test("MediaScrub dispatch covers FLAC payloads") {
    import spark.implicits._
    val flacs = Multimodal.syntheticFlacAudio(spark,
      (0L until 8L).toDF("doc_id"), plantMetadata = true)
    val rep = MediaScrub.scrubReport(flacs)
      .select("media_id", "n_stripped").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 8L).foreach { id =>
      val want = if (id % 4 == 0 || id % 4 == 2) 1 else 0
      assert(rep(id) == want, s"id=$id")
    }
    // scrubbed payloads still decode through the audio stack
    val scrubbed = MediaScrub.scrub(flacs)
    val sig = MediaQuality.audioSignals(scrubbed)
    assert(sig.count() == 8)
  }

  test("truncated and non-FLAC payloads refuse loudly") {
    val src = sine(1000, 400.0)
    val flac = Flac.encode(src, channels = 1, rate = 8000)
    intercept[IllegalArgumentException] {
      Flac.decode(java.util.Arrays.copyOfRange(flac, 0, flac.length - 10))
    }
    intercept[IllegalArgumentException] {
      Flac.metaBlocks("not a flac stream at all".getBytes("UTF-8"))
    }
  }
}
