package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** IMA/DVI + Microsoft ADPCM block codecs and their WAV plumbing:
  * encode→decode round-trips track the source within quantization
  * noise, frame counts are exact through the `fact` chunk, stereo
  * interleave decodes per-channel, and the normalized seam
  * ([[AudioDedup.openNormalized16]]) routes ADPCM WAVs here while
  * PCM WAVs still take the JDK path. */
class AdpcmSpec extends AnyFunSuite {

  private def sine(n: Int, freq: Double, rate: Int = 8000,
                   amp: Double = 8000): Array[Int] =
    Array.tabulate(n)(i => (math.sin(2 * math.Pi * freq * i / rate) * amp).toInt)

  private def toSamples(pcm: Array[Byte]): Array[Int] =
    Array.tabulate(pcm.length / 2)(i =>
      ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt)

  private def rmse(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    math.sqrt(a.indices.map(i => { val d = (a(i) - b(i)).toDouble; d * d }).sum
      / a.length)
  }

  test("IMA round-trip: exact frame count, waveform within quantization noise") {
    val src = sine(1234, 440.0)
    val (data, ba) = Adpcm.encodeImaMono(src)
    val pcm = Adpcm.decodeIma(data, channels = 1, blockAlign = ba,
      totalFrames = src.length.toLong)
    val out = toSamples(pcm)
    assert(out.length == src.length)
    // 4-bit differential coding of a smooth 8k-amplitude sine: noise
    // floor well under 3% of full scale once the step adapts
    assert(rmse(src.drop(16), out.drop(16)) < 500.0, rmse(src, out))
  }

  test("MS round-trip: exact frame count, waveform within quantization noise") {
    val src = sine(999, 330.0)
    val (data, ba) = Adpcm.encodeMsMono(src)
    val pcm = Adpcm.decodeMs(data, channels = 1, blockAlign = ba,
      totalFrames = src.length.toLong)
    val out = toSamples(pcm)
    assert(out.length == src.length)
    assert(rmse(src.drop(16), out.drop(16)) < 500.0, rmse(src, out))
  }

  test("IMA multi-block: block boundaries carry no discontinuity") {
    // blockAlign 256 -> 505 samples/block; 1600 spans 4 blocks
    val src = sine(1600, 200.0)
    val (data, ba) = Adpcm.encodeImaMono(src)
    assert(data.length == 4 * ba)
    val out = toSamples(Adpcm.decodeIma(data, 1, ba, src.length.toLong))
    // per-block max error stays in the same band for every block
    (0 until 3).foreach { blk =>
      val from = blk * 505 + 8
      val until = math.min((blk + 1) * 505, src.length)
      val e = rmse(src.slice(from, until), out.slice(from, until))
      assert(e < 500.0, s"block $blk rmse $e")
    }
  }

  test("IMA stereo: channels decode independently (L sine, R constant)") {
    // hand-build one stereo block: blockAlign 16 -> header 8 bytes +
    // 8 data bytes (one 4-byte group per channel) = 9 samples/channel
    val ba = 16
    val bos = new java.io.ByteArrayOutputStream()
    // L header: predictor 1000, index 10; R header: predictor -2000, index 0
    bos.write(1000 & 0xff); bos.write(1000 >> 8); bos.write(10); bos.write(0)
    val rp = (-2000) & 0xffff
    bos.write(rp & 0xff); bos.write(rp >> 8); bos.write(0); bos.write(0)
    // L group: nibble 0 everywhere (smallest positive step)
    (0 until 4).foreach(_ => bos.write(0x00))
    // R group: nibble 9 everywhere (sign + magnitude 1: at small step
    // indices nibble 8's magnitude-0 diff truncates to zero, so 9 is
    // the smallest GUARANTEED-moving negative step)
    (0 until 4).foreach(_ => bos.write(0x99))
    val pcm = Adpcm.decodeIma(bos.toByteArray, channels = 2, blockAlign = ba)
    val s = toSamples(pcm)
    assert(s.length == 18) // 9 frames x 2 channels
    // frame 0 is the headers verbatim
    assert(s(0) == 1000 && s(1) == -2000)
    // L climbs (positive nibbles), R descends (negative nibbles)
    assert(s(16) > 1000 && s(17) < -2000, s"L=${s(16)} R=${s(17)}")
  }

  test("fact truncation: decoder emits exactly the fact frames, not block padding") {
    val src = sine(600, 500.0) // one 256-byte IMA block holds 505; 600 -> 2 blocks
    val (data, ba) = Adpcm.encodeImaMono(src)
    val untruncated = Adpcm.decodeIma(data, 1, ba)
    val truncated = Adpcm.decodeIma(data, 1, ba, 600L)
    assert(toSamples(truncated).length == 600)
    assert(toSamples(untruncated).length == 2 * 505) // padded tail decodes
  }

  test("openNormalized16 routes ADPCM WAVs and keeps rate/channels") {
    val src = sine(800, 250.0)
    val (data, ba) = Adpcm.encodeImaMono(src)
    val wav = Adpcm.wavBytes(0x0011, 1, 8000, ba, 800L, data)
    val (pcm, channels, rate) = AudioDedup.openNormalized16(wav)
    assert(channels == 1 && rate == 8000f && pcm.length == 1600)
    val (dataMs, baMs) = Adpcm.encodeMsMono(src)
    val wavMs = Adpcm.wavBytes(0x0002, 1, 8000, baMs, 800L, dataMs)
    val (pcmMs, _, _) = AudioDedup.openNormalized16(wavMs)
    assert(pcmMs.length == 1600)
  }

  test("PCM WAVs still take the JDK path (sniff returns None)") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
    assert(Adpcm.sniffWav(bos.toByteArray).isEmpty)
    assert(Adpcm.sniffWav("not a wav at all".getBytes("UTF-8")).isEmpty)
  }

  test("broken ADPCM refuses loudly: bad step index, missing data chunk") {
    val src = sine(100, 300.0)
    val (data, ba) = Adpcm.encodeImaMono(src)
    data(2) = 120.toByte // step index 120 > 88
    intercept[IllegalArgumentException] {
      Adpcm.decodeIma(data, 1, ba)
    }
    val headerOnly = Adpcm.wavBytes(0x0011, 1, 8000, 256, 0L,
      Array.emptyByteArray)
    // structurally fine (empty data) — now drop the data chunk itself
    val noData = java.util.Arrays.copyOfRange(headerOnly, 0,
      headerOnly.length - 8)
    intercept[IllegalArgumentException] { Adpcm.sniffWav(noData) }
  }

  test("ADPCM fingerprints stay near-dup-close to the PCM original's") {
    // the 64-bit envelope/ZCR fingerprint is Gray-coded (±1 bucket =
    // 1 Hamming bit); a constant-amplitude sine can straddle one
    // envelope bucket boundary in EVERY segment at once, so the
    // re-coding bound is 8 bits — while a different tone lands far
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val src = sine(4000, 440.0)
    val pcmBytes = new Array[Byte](src.length * 2)
    src.indices.foreach { i =>
      pcmBytes(2 * i) = (src(i) & 0xff).toByte
      pcmBytes(2 * i + 1) = ((src(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBytes), fmt, src.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
    val fpPcm = AudioDedup.fingerprint64(bos.toByteArray)
    val (dIma, baIma) = Adpcm.encodeImaMono(src)
    val fpIma = AudioDedup.fingerprint64(
      Adpcm.wavBytes(0x0011, 1, 8000, baIma, src.length.toLong, dIma))
    val (dMs, baMs) = Adpcm.encodeMsMono(src)
    val fpMs = AudioDedup.fingerprint64(
      Adpcm.wavBytes(0x0002, 1, 8000, baMs, src.length.toLong, dMs))
    assert(hamming(fpPcm, fpIma) <= 8 && hamming(fpPcm, fpMs) <= 8,
      f"pcm=$fpPcm%016x ima=$fpIma%016x ms=$fpMs%016x")
    // discrimination: a different pitch at different amplitude is FAR
    val other = sine(4000, 900.0, amp = 3000)
    val pcm2 = new Array[Byte](other.length * 2)
    other.indices.foreach { i =>
      pcm2(2 * i) = (other(i) & 0xff).toByte
      pcm2(2 * i + 1) = ((other(i) >> 8) & 0xff).toByte
    }
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm2), fmt, other.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos2): Unit
    assert(hamming(fpPcm, AudioDedup.fingerprint64(bos2.toByteArray)) > 8)
  }
}
