package graft.multimodal

/** ADPCM wire codings for WAV payloads — IMA/DVI ADPCM (wFormatTag
  * 0x0011) and Microsoft ADPCM (wFormatTag 0x0002), the 4-bit
  * differential codings that dictation rigs, games and old capture
  * hardware shipped by the terabyte. Pure integer table arithmetic
  * (both codings are table-quantized deltas — no DSP), decoded
  * block-by-block to the pipeline's 16-bit little-endian PCM norm so
  * [[AudioDedup.openNormalized16]] feeds every audio face unchanged.
  *
  * The JDK's WAV reader refuses these format tags, so the RIFF `fmt `
  * parse lives here too ([[sniffWav]]): the seam tries this first and
  * falls through to `AudioSystem` for the codings it does speak.
  *
  * Reference face: the compliance/ingest pipelines treat audio drops as
  * opaque copy payloads (gobblin-data-management/.../copy/
  * CopyableFile.java:68) — decoding them into curation signals is this
  * engine's training-data extension (SURVEY §2.11 media family).
  *
  * Layout notes (both from the original Microsoft WAV coding specs):
  *  - IMA: each block starts with a 4-byte-per-channel header
  *    (predictor int16 LE, step index u8, reserved) whose predictor IS
  *    output sample 0; then 4-byte-per-channel nibble groups, low
  *    nibble first, channels interleaved group-wise.
  *  - MS: per-channel coefficient index u8, then per-channel iDelta
  *    int16, sample1 int16, sample2 int16; sample2 (older) then
  *    sample1 are output first; then one nibble per sample, HIGH
  *    nibble first, channels alternating nibble-wise.
  *  - A non-PCM WAV carries a `fact` chunk with the exact frame count;
  *    the decoder truncates the final block to it, so arbitrary
  *    lengths (not just whole blocks) round-trip exactly.
  */
object Adpcm {

  // ---- IMA/DVI tables ----
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  // ---- MS ADPCM tables ----
  private val MsCoef1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  private val MsCoef2: Array[Int] = Array(0, -256, 64, 64, 0, -208, -232)
  private val MsAdapt: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  private def clamp16(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v

  /** One IMA step: returns the new predictor; mutates nothing (the
    * caller threads predictor + index). */
  @inline private def imaStep(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val step = StepTable(index)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p = clamp16(if ((nibble & 8) != 0) pred - diff else pred + diff)
    var ix = index + IndexTable(nibble & 7)
    if (ix < 0) ix = 0 else if (ix > 88) ix = 88
    (p, ix)
  }

  /** Decode IMA ADPCM `data` chunks to 16-bit LE interleaved PCM.
    * `totalFrames` (the `fact` count; <0 = all present) truncates the
    * tail of the final block. */
  def decodeIma(data: Array[Byte], channels: Int, blockAlign: Int,
                totalFrames: Long = -1L): Array[Byte] = {
    require(channels >= 1 && channels <= 2, s"$channels-channel IMA ADPCM")
    require(blockAlign > 4 * channels && blockAlign % (4 * channels) == 0,
      s"IMA ADPCM blockAlign=$blockAlign invalid for $channels channel(s)")
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    val nBlocks = (data.length + blockAlign - 1) / blockAlign
    val out = new java.io.ByteArrayOutputStream()
    var emitted = 0L
    val lim = if (totalFrames >= 0) totalFrames else Long.MaxValue
    var b = 0
    while (b < nBlocks && emitted < lim) {
      val off = b * blockAlign
      val end = math.min(off + blockAlign, data.length)
      val pred = new Array[Int](channels)
      val index = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        val h = off + 4 * c
        require(h + 3 < end, "truncated IMA ADPCM block header")
        pred(c) = ((data(h) & 0xff) | (data(h + 1) << 8)).toShort.toInt
        index(c) = data(h + 2) & 0xff
        require(index(c) <= 88, s"IMA step index ${index(c)} out of range")
        c += 1
      }
      // header predictors are frame 0
      val frame0 = new Array[Int](channels)
      System.arraycopy(pred, 0, frame0, 0, channels)
      var frames = 1
      val blockFrames = new Array[Int](samplesPerBlock * channels)
      c = 0
      while (c < channels) { blockFrames(c) = frame0(c); c += 1 }
      // nibble groups: 4 bytes per channel, interleaved
      var g = off + 4 * channels
      while (g < end && frames < samplesPerBlock) {
        var cc = 0
        while (cc < channels) {
          val base = g + 4 * cc
          var i = 0
          while (i < 4 && base + i < end) {
            val byte = data(base + i) & 0xff
            var s = frames + 2 * i
            var (p1, x1) = imaStep(byte & 0xf, pred(cc), index(cc))
            pred(cc) = p1; index(cc) = x1
            if (s < samplesPerBlock) blockFrames(s * channels + cc) = p1
            s += 1
            val (p2, x2) = imaStep(byte >> 4, pred(cc), index(cc))
            pred(cc) = p2; index(cc) = x2
            if (s < samplesPerBlock) blockFrames(s * channels + cc) = p2
            i += 1
          }
          cc += 1
        }
        frames += 8
        g += 4 * channels
      }
      val framesInBlock = math.min(
        1 + (math.min(end, off + blockAlign) - off - 4 * channels) * 2 / channels,
        samplesPerBlock)
      var f = 0
      while (f < framesInBlock && emitted < lim) {
        var cc = 0
        while (cc < channels) {
          val v = blockFrames(f * channels + cc)
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
          cc += 1
        }
        emitted += 1
        f += 1
      }
      b += 1
    }
    out.toByteArray
  }

  /** Encode mono 16-bit samples as IMA ADPCM blocks (fixture/sink
    * face). Returns (data bytes, blockAlign). */
  def encodeImaMono(samples: Array[Int], blockAlign: Int = 256): (Array[Byte], Int) = {
    require(blockAlign >= 8 && blockAlign % 4 == 0, s"blockAlign=$blockAlign")
    val samplesPerBlock = (blockAlign - 4) * 2 + 1
    val out = new java.io.ByteArrayOutputStream()
    var index = 0
    var pos = 0
    while (pos < samples.length) {
      val n = math.min(samplesPerBlock, samples.length - pos)
      var pred = samples(pos)
      // header: predictor, step index, reserved
      out.write(pred & 0xff); out.write((pred >> 8) & 0xff)
      out.write(index); out.write(0)
      var i = 1
      var lowNibble = -1
      while (i < n) {
        val target = samples(pos + i)
        // pick the nibble whose decode lands closest to the target
        val step = StepTable(index)
        var diff = target - pred
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        var mask = 4
        var st = step
        while (mask > 0) {
          if (diff >= st) { nib |= mask; diff -= st }
          st >>= 1
          mask >>= 1
        }
        val (p, x) = imaStep(nib, pred, index)
        pred = p; index = x
        if (lowNibble < 0) lowNibble = nib
        else { out.write(lowNibble | (nib << 4)); lowNibble = -1 }
        i += 1
      }
      if (lowNibble >= 0) { out.write(lowNibble); lowNibble = -1 }
      // pad the block to blockAlign (decoders walk fixed-size blocks)
      while (out.size() % blockAlign != 0) out.write(0)
      pos += n
    }
    (out.toByteArray, blockAlign)
  }

  /** Decode MS ADPCM `data` chunks to 16-bit LE interleaved PCM. */
  def decodeMs(data: Array[Byte], channels: Int, blockAlign: Int,
               totalFrames: Long = -1L): Array[Byte] = {
    require(channels >= 1 && channels <= 2, s"$channels-channel MS ADPCM")
    require(blockAlign > 7 * channels,
      s"MS ADPCM blockAlign=$blockAlign invalid for $channels channel(s)")
    val samplesPerBlock = (blockAlign - 7 * channels) * 2 / channels + 2
    val nBlocks = (data.length + blockAlign - 1) / blockAlign
    val out = new java.io.ByteArrayOutputStream()
    var emitted = 0L
    val lim = if (totalFrames >= 0) totalFrames else Long.MaxValue
    var b = 0
    while (b < nBlocks && emitted < lim) {
      val off = b * blockAlign
      val end = math.min(off + blockAlign, data.length)
      require(end - off >= 7 * channels, "truncated MS ADPCM block header")
      val coef1 = new Array[Int](channels)
      val coef2 = new Array[Int](channels)
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels)
      val s2 = new Array[Int](channels)
      var p = off
      var c = 0
      while (c < channels) {
        val pc = data(p) & 0xff; p += 1
        require(pc < MsCoef1.length, s"MS ADPCM predictor index $pc")
        coef1(c) = MsCoef1(pc); coef2(c) = MsCoef2(pc)
        c += 1
      }
      c = 0
      while (c < channels) {
        delta(c) = ((data(p) & 0xff) | (data(p + 1) << 8)).toShort.toInt; p += 2
        c += 1
      }
      c = 0
      while (c < channels) {
        s1(c) = ((data(p) & 0xff) | (data(p + 1) << 8)).toShort.toInt; p += 2
        c += 1
      }
      c = 0
      while (c < channels) {
        s2(c) = ((data(p) & 0xff) | (data(p + 1) << 8)).toShort.toInt; p += 2
        c += 1
      }
      // first two output frames: sample2 (older) then sample1
      var f = 0
      while (f < 2 && emitted < lim) {
        c = 0
        while (c < channels) {
          val v = if (f == 0) s2(c) else s1(c)
          out.write(v & 0xff); out.write((v >> 8) & 0xff)
          c += 1
        }
        emitted += 1
        f += 1
      }
      // nibbles: high first, channels alternating per nibble; a full
      // frame (one nibble per channel) emits as soon as it completes
      var frames = 2
      var chan = 0
      var hi = true
      var byteIdx = p
      val frameVals = new Array[Int](channels)
      while (byteIdx < end && frames < samplesPerBlock && emitted < lim) {
        val cur = data(byteIdx) & 0xff
        val nRaw = if (hi) cur >> 4 else cur & 0xf
        if (!hi) byteIdx += 1
        hi = !hi
        val signed = if (nRaw >= 8) nRaw - 16 else nRaw
        val pred = clamp16(((s1(chan) * coef1(chan) + s2(chan) * coef2(chan)) >> 8)
          + signed * delta(chan))
        s2(chan) = s1(chan); s1(chan) = pred
        delta(chan) = math.max(16, (MsAdapt(nRaw) * delta(chan)) >> 8)
        frameVals(chan) = pred
        chan += 1
        if (chan == channels) {
          chan = 0
          frames += 1
          c = 0
          while (c < channels) {
            out.write(frameVals(c) & 0xff); out.write((frameVals(c) >> 8) & 0xff)
            c += 1
          }
          emitted += 1
        }
      }
      b += 1
    }
    out.toByteArray
  }

  /** Encode mono 16-bit samples as MS ADPCM blocks (fixture/sink face).
    * Uses coefficient pair 0 (pure first-order) — valid MS ADPCM any
    * decoder accepts. Returns (data bytes, blockAlign). */
  def encodeMsMono(samples: Array[Int], blockAlign: Int = 256): (Array[Byte], Int) = {
    require(blockAlign >= 16, s"blockAlign=$blockAlign")
    val samplesPerBlock = (blockAlign - 7) * 2 + 2
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < samples.length) {
      val n = math.min(samplesPerBlock, samples.length - pos)
      var s2 = samples(pos)
      var s1 = if (n > 1) samples(pos + 1) else s2
      var delta = 16
      out.write(0) // predictor 0: coef (256, 0)
      out.write(delta & 0xff); out.write((delta >> 8) & 0xff)
      out.write(s1 & 0xff); out.write((s1 >> 8) & 0xff)
      out.write(s2 & 0xff); out.write((s2 >> 8) & 0xff)
      var i = 2
      var hiNibble = -1
      while (i < n) {
        val target = samples(pos + i)
        val pred = (s1 * 256 + s2 * 0) >> 8
        var err = target - pred
        var nib = err / delta
        if (nib > 7) nib = 7 else if (nib < -8) nib = -8
        val decoded = clamp16(pred + nib * delta)
        val nRaw = nib & 0xf
        s2 = s1; s1 = decoded
        delta = math.max(16, (MsAdapt(nRaw) * delta) >> 8)
        if (hiNibble < 0) hiNibble = nRaw
        else { out.write((hiNibble << 4) | nRaw); hiNibble = -1 }
        i += 1
      }
      if (hiNibble >= 0) { out.write(hiNibble << 4); hiNibble = -1 }
      while (out.size() % blockAlign != 0) out.write(0)
      pos += n
    }
    (out.toByteArray, blockAlign)
  }

  // ---- RIFF/WAVE plumbing ----

  final case class WavAdpcm(formatTag: Int, channels: Int, sampleRate: Int,
                            blockAlign: Int, factFrames: Long,
                            data: Array[Byte])

  /** Parse a RIFF/WAVE payload IF its fmt tag is an ADPCM coding this
    * object decodes (0x0002 MS, 0x0011 IMA); None for every other
    * payload (the seam falls through to the JDK reader). Loud on a
    * structurally broken ADPCM WAV. */
  def sniffWav(payload: Array[Byte]): Option[WavAdpcm] = {
    if (payload.length < 12) return None
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtTag = -1
    var channels = 0
    var rate = 0
    var blockAlign = 0
    var fact = -1L
    var data: Array[Byte] = null
    while (off + 8 <= payload.length) {
      val id = tag(off)
      val len = u32(off + 4)
      val body = off + 8
      val bodyEnd = body + len
      if (bodyEnd > payload.length) return None // truncated: not ours to judge
      if (id == "fmt ") {
        if (len < 16) return None
        fmtTag = u16(body)
        channels = u16(body + 2)
        rate = u32(body + 4).toInt
        blockAlign = u16(body + 12)
      } else if (id == "fact" && len >= 4) {
        fact = u32(body)
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(payload, body,
          math.min(bodyEnd, payload.length.toLong).toInt)
      }
      off = (bodyEnd + (len & 1L)).toInt
    }
    if (fmtTag != 0x0002 && fmtTag != 0x0011) None
    else {
      require(data != null, "ADPCM WAV has no data chunk")
      require(channels >= 1 && rate > 0 && blockAlign > 0,
        s"broken ADPCM fmt: channels=$channels rate=$rate blockAlign=$blockAlign")
      Some(WavAdpcm(fmtTag, channels, rate, blockAlign, fact, data))
    }
  }

  /** Decode a sniffed ADPCM WAV to (16-bit LE PCM bytes, channels,
    * rate) — [[AudioDedup.openNormalized16]]'s contract. */
  def decodeWav(w: WavAdpcm): (Array[Byte], Int, Float) = {
    val pcm = w.formatTag match {
      case 0x0011 => decodeIma(w.data, w.channels, w.blockAlign, w.factFrames)
      case 0x0002 => decodeMs(w.data, w.channels, w.blockAlign, w.factFrames)
      case t => throw new IllegalArgumentException(f"wFormatTag=0x$t%04x")
    }
    (pcm, w.channels, w.sampleRate.toFloat)
  }

  /** Build a complete ADPCM WAV (fmt + fact + data) around encoded
    * blocks — the fixture/sink face. */
  def wavBytes(formatTag: Int, channels: Int, rate: Int, blockAlign: Int,
               frames: Long, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val samplesPerBlock = formatTag match {
      case 0x0011 => (blockAlign - 4 * channels) * 2 / channels + 1
      case 0x0002 => (blockAlign - 7 * channels) * 2 / channels + 2
      case t => throw new IllegalArgumentException(f"wFormatTag=0x$t%04x")
    }
    val fmtExtra = formatTag match {
      case 0x0011 => 4  // cbSize + samplesPerBlock
      case 0x0002 => 4 + 2 + 7 * 4 // cbSize + samplesPerBlock + nCoef + pairs
    }
    val fmtLen = 16 + fmtExtra
    val dataPad = data.length & 1
    val riffLen = 4 + (8 + fmtLen) + (8 + 4) + (8 + data.length + dataPad)
    ascii("RIFF"); w32(riffLen.toLong); ascii("WAVE")
    ascii("fmt "); w32(fmtLen.toLong)
    w16(formatTag); w16(channels); w32(rate.toLong)
    w32(rate.toLong * blockAlign / samplesPerBlock) // avg bytes/sec (approx)
    w16(blockAlign); w16(4) // bitsPerSample
    formatTag match {
      case 0x0011 =>
        w16(2); w16(samplesPerBlock)
      case 0x0002 =>
        w16(32); w16(samplesPerBlock); w16(7)
        var i = 0
        while (i < 7) { w16(MsCoef1(i) & 0xffff); w16(MsCoef2(i) & 0xffff); i += 1 }
    }
    ascii("fact"); w32(4L); w32(frames)
    ascii("data"); w32(data.length.toLong)
    bos.write(data)
    if (dataPad == 1) bos.write(0)
    bos.toByteArray
  }
}
