package graft.multimodal

/** REAL AVI/MJPEG container support with ZERO new dependencies: AVI is
  * a RIFF chunk grammar (the same walk [[MediaScrub]] runs over WAV —
  * `LIST hdrl` holds the `avih` main header and per-stream `strh`/`strf`
  * headers, `LIST movi` holds the frame chunks) and an MJPEG video
  * stream's `00dc` chunks are each a complete JPEG image, which
  * `javax.imageio` decodes natively. That makes AVI/MJPEG — a genuinely
  * common interchange container (old cameras, OpenCV's default writer,
  * scientific capture rigs) — the second video container this engine
  * decodes fully for real in a stock JVM, next to animated GIF; mp4/webm
  * (which need an H.264/VP9 codec the JDK lacks) remain the documented
  * stub seam.
  *
  * Reference scope: the reference is a data-integration framework with
  * no media code at all (`gobblin-core/.../converter` converts records,
  * never containers); both the grammar and the field layout here come
  * from the public RIFF/AVI specification.
  */
/** G.711 companding (ITU-T A-law / µ-law) — the 8-bit logarithmic PCM
  * of telephony and old capture rigs, decodable by pure segment/mantissa
  * arithmetic from the public spec (no codec): both AVI (wFormatTag 6/7)
  * and mp4 (`alaw`/`ulaw` sample entries) soundtracks expand through
  * these to the pipeline's 16-bit norm. The encoder exists for the
  * fixture/producer side. */
private[multimodal] object G711 {

  /** Expand one µ-law byte to a linear 16-bit sample. */
  def ulawToLinear(b: Byte): Short = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** Expand one A-law byte to a linear 16-bit sample. */
  def alawToLinear(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    t += (if (seg == 0) 8 else 0x108)
    if (seg > 1) t <<= seg - 1
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  private def searchSeg(v: Int, table: Array[Int]): Int = {
    var i = 0
    while (i < table.length && v > table(i)) i += 1
    i
  }

  // segment end tables at the companding bit depths (µ-law quantizes a
  // 14-bit magnitude, A-law a 13-bit one — the ITU G.711 layout)
  private val UlawSegEnds =
    Array(0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff)
  private val AlawSegEnds =
    Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)

  /** Compress one linear 16-bit sample to µ-law. */
  def linearToUlaw(s: Short): Byte = {
    var v = s.toInt >> 2 // 16 -> 14 bit
    val mask = if (v < 0) { v = -v; 0x7f } else 0xff
    if (v > 8159) v = 8159 // clip
    v += 33 // bias at 14-bit scale
    val seg = searchSeg(v, UlawSegEnds)
    val u =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((v >> (seg + 1)) & 0x0f)
    ((u ^ mask) & 0xff).toByte
  }

  /** Compress one linear 16-bit sample to A-law. */
  def linearToAlaw(s: Short): Byte = {
    var v = s.toInt >> 3 // 16 -> 13 bit
    val mask = if (v >= 0) 0xd5 else { v = -v - 1; 0x55 }
    val seg = searchSeg(v, AlawSegEnds)
    val a =
      if (seg >= 8) 0x7f
      else (seg << 4) | ((if (seg < 2) v >> 1 else v >> seg) & 0x0f)
    ((a ^ mask) & 0xff).toByte
  }

  /** Expand a whole G.711 byte stream to little-endian 16-bit PCM. */
  def expand(data: Array[Byte], alaw: Boolean): Array[Byte] = {
    val out = new Array[Byte](data.length * 2)
    var i = 0
    while (i < data.length) {
      val s = if (alaw) alawToLinear(data(i)) else ulawToLinear(data(i))
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}

private[multimodal] object AviCodec {

  ImageIoTuning.init // memory-cached ImageIO streams for the JPEG frames


  /** RIFF....AVI<space> magic. */
  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** A parsed AVI: frame CHUNK SPANS (decode is lazy, per frame) plus
    * the main-header timing — `usPerFrame` (dwMicroSecPerFrame) drives
    * the constant frame delay; `width`/`height` come from the header
    * (frame 0's decoded dims are authoritative where pixels matter). */
  final class AviFrames(payload: Array[Byte],
                        frameSpans: Array[(Int, Int)],
                        val usPerFrame: Long,
                        val width: Int, val height: Int) {
    def numFrames: Int = frameSpans.length
    def frame(i: Int): java.awt.image.BufferedImage = {
      val (off, len) = frameSpans(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, off, len))
      require(img != null, s"AVI frame $i is not a decodable JPEG")
      img
    }
  }

  /** Parse the container: walk top-level RIFF chunks, recurse into LIST
    * chunks, pull dwMicroSecPerFrame + dims from `avih`, resolve the
    * `vids` stream's declaration index from the `strl` lists (the
    * two-digit stream number in movi chunk ids IS that order) and
    * collect only THAT stream's `##dc`/`##db` frame chunks under
    * `LIST movi` (including `LIST rec ` groupings) — a second video
    * stream would interleave foreign frames into the sequence, so
    * multi-vids containers refuse loudly, same contract as every codec
    * here. Chunk lengths are untrusted crawl data: all bounds
    * arithmetic runs in Long so a crafted length near Int.MaxValue
    * hits the loud truncated-chunk refusal instead of wrapping. */
  def open(payload: Array[Byte]): AviFrames = {
    require(isAvi(payload), "payload is not a RIFF/AVI container")
    def le32(o: Int): Int = (payload(o) & 0xff) |
      ((payload(o + 1) & 0xff) << 8) | ((payload(o + 2) & 0xff) << 16) |
      ((payload(o + 3) & 0xff) << 24)
    def fourcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    val riffEnd = math.min(payload.length.toLong,
      8L + (le32(4).toLong & 0xffffffffL)).toInt
    var usPerFrame = 0L
    var w = 0
    var h = 0
    var streamIdx = -1
    var vidsIdx = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int, inMovi: Boolean, inStrl: Boolean): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourcc(off)
        val len = le32(off + 4)
        require(len >= 0, s"negative AVI chunk length at $off")
        val end = off.toLong + 8L + len
        require(end <= payload.length, s"truncated $id chunk at $off")
        if (id == "LIST") {
          val listType = fourcc(off + 8)
          if (listType == "strl") streamIdx += 1
          walk(off + 12, (end min to.toLong).toInt,
            listType == "movi" || (inMovi && listType == "rec "),
            listType == "strl")
        } else if (id == "avih") {
          require(len >= 40, s"avih chunk too short ($len bytes)")
          usPerFrame = le32(off + 8).toLong & 0xffffffffL
          w = le32(off + 8 + 32)
          h = le32(off + 8 + 36)
        } else if (inStrl && id == "strh") {
          require(len >= 4, s"strh chunk too short ($len bytes)")
          if (fourcc(off + 8) == "vids") {
            require(vidsIdx < 0,
              "AVI container declares more than one vids stream — " +
                "interleaving both into one frame sequence would corrupt " +
                "counts, timing and fingerprints; refusing loudly")
            vidsIdx = streamIdx
          }
        } else if (inMovi && vidsIdx >= 0 &&
          (id == f"$vidsIdx%02ddc" || id == f"$vidsIdx%02ddb")) {
          frames += ((off + 8, len))
        }
        off = (end + (len & 1)).toInt
      }
    }
    walk(12, riffEnd, inMovi = false, inStrl = false)
    require(vidsIdx >= 0, "AVI header declares no vids stream")
    require(frames.nonEmpty, "AVI container holds no video frames")
    require(usPerFrame > 0,
      "AVI header missing dwMicroSecPerFrame — frame timing unknown")
    new AviFrames(payload, frames.toArray, usPerFrame, w, h)
  }

  /** A demuxed AVI PCM soundtrack: raw little-endian sample bytes plus
    * the WAVEFORMATEX fields needed to re-wrap them as WAV. */
  final case class AviAudio(pcm: Array[Byte], channels: Int, rate: Int,
                            bits: Int)

  /** DEMUX the PCM audio stream of an AVI container: walk `LIST hdrl`'s
    * `strl` lists in declaration order (the stream NUMBER in movi chunk
    * ids is that order), find the `auds` stream and its WAVEFORMATEX
    * `strf`, then concatenate its `##wb` chunks from `LIST movi` in
    * container order. Returns None when the container carries no audio
    * stream; refuses loudly on non-PCM audio (compressed soundtracks
    * need a codec the JDK lacks — the same honest seam as mp4 video). */
  def extractAudio(payload: Array[Byte]): Option[AviAudio] = {
    require(isAvi(payload), "payload is not a RIFF/AVI container")
    def le32(o: Int): Int = (payload(o) & 0xff) |
      ((payload(o + 1) & 0xff) << 8) | ((payload(o + 2) & 0xff) << 16) |
      ((payload(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def fourcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    val riffEnd = math.min(payload.length.toLong,
      8L + (le32(4).toLong & 0xffffffffL)).toInt
    var streamIdx = -1
    var audioIdx = -1
    var tag = 1
    var fmt: Option[AviAudio] = None
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int, inMovi: Boolean, inStrl: Boolean): Unit = {
      var off = from
      var strlType = ""
      while (off + 8 <= to) {
        val id = fourcc(off)
        val len = le32(off + 4)
        require(len >= 0, s"negative AVI chunk length at $off")
        val end = off.toLong + 8L + len
        require(end <= payload.length, s"truncated $id chunk at $off")
        if (id == "LIST") {
          val listType = fourcc(off + 8)
          if (listType == "strl") streamIdx += 1
          walk(off + 12, (end min to.toLong).toInt,
            listType == "movi" || (inMovi && listType == "rec "),
            listType == "strl")
        } else if (inStrl && id == "strh") {
          strlType = fourcc(off + 8)
          if (strlType == "auds") audioIdx = streamIdx
        } else if (inStrl && id == "strf" && strlType == "auds") {
          require(len >= 16, s"auds strf too short ($len bytes)")
          val formatTag = le16(off + 8)
          require(formatTag == 1 || formatTag == 6 || formatTag == 7,
            s"AVI audio stream is wFormatTag=$formatTag — PCM (1) " +
              "demuxes verbatim and G.711 A-law (6) / µ-law (7) expand " +
              "by table arithmetic; other codings refuse loudly rather " +
              "than emit garbage samples")
          tag = formatTag
          fmt = Some(AviAudio(Array.emptyByteArray,
            channels = le16(off + 10), rate = le32(off + 12),
            bits = le16(off + 22)))
        } else if (inMovi && audioIdx >= 0 &&
          id == f"$audioIdx%02dwb") {
          chunks += ((off + 8, len))
        }
        off = (end + (len & 1)).toInt
      }
    }
    walk(12, riffEnd, inMovi = false, inStrl = false)
    fmt.map { f =>
      val raw = new Array[Byte](chunks.map(_._2).sum)
      var pos = 0
      chunks.foreach { case (off, len) =>
        System.arraycopy(payload, off, raw, pos, len)
        pos += len
      }
      // G.711 soundtracks expand to linear 16-bit here, so every
      // consumer sees one PCM norm regardless of the wire coding
      tag match {
        case 1 => f.copy(pcm = raw)
        case t => f.copy(pcm = G711.expand(raw, alaw = t == 6), bits = 16)
      }
    }
  }

  /** Normalize a demuxed PCM soundtrack to the pipeline's 16-bit MONO
    * norm: 8-bit PCM (unsigned by the WAV/AVI convention) re-centers and
    * scales to 16-bit; multi-channel PCM downmixes by per-frame channel
    * average — both exact integer arithmetic, replayable anywhere.
    * 8-bit mono is common in old capture rigs; 24/32-bit float PCM stays
    * a loud refusal (no lossless norm without a resolution policy).
    * Returns little-endian 16-bit mono sample bytes. */
  def toMono16(a: AviAudio): Array[Byte] = {
    require(a.bits == 8 || a.bits == 16,
      s"${a.bits}-bit PCM unsupported (8 and 16-bit normalize to the " +
        "16-bit mono norm; deeper resolutions refuse loudly rather " +
        "than silently truncate)")
    require(a.channels >= 1, s"channels=${a.channels} must be >= 1")
    val bytesPerSample = a.bits / 8
    val frameBytes = bytesPerSample * a.channels
    val nFrames = a.pcm.length / frameBytes
    val out = new Array[Byte](nFrames * 2)
    var f = 0
    while (f < nFrames) {
      var sum = 0L
      var c = 0
      while (c < a.channels) {
        val o = f * frameBytes + c * bytesPerSample
        val s =
          if (a.bits == 16)
            ((a.pcm(o) & 0xff) | (a.pcm(o + 1) << 8)).toShort.toInt
          else ((a.pcm(o) & 0xff) - 128) << 8 // unsigned 8-bit convention
        sum += s
        c += 1
      }
      val v = (sum / a.channels).toInt
      out(f * 2) = (v & 0xff).toByte
      out(f * 2 + 1) = ((v >> 8) & 0xff).toByte
      f += 1
    }
    out
  }

  /** Write frames as one AVI/MJPEG container (the fixture/producer side
    * of [[open]], and a real interchange writer): each frame JPEG-encodes
    * through `javax.imageio`, headers carry the real dims and
    * `usPerFrame` timing, and an `idx1` index (offset/size per frame)
    * makes the container seekable for external players. With `audio`
    * set ((PCM sample bytes, sample rate)), a second `auds` stream
    * (WAVEFORMATEX strf, one `01wb` chunk) interleaves after the video
    * frames — the producer side of [[extractAudio]]. `audioChannels` /
    * `audioBits` shape the PCM layout (interleaved frames; 8-bit is
    * unsigned by the WAV convention) so fixtures can exercise
    * [[toMono16]]'s downmix paths. */
  def writeMjpeg(frames: Seq[java.awt.image.BufferedImage],
                 usPerFrame: Long,
                 audio: Option[(Array[Byte], Int)] = None,
                 audioChannels: Int = 1, audioBits: Int = 16,
                 audioFormatTag: Int = 1): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    require(usPerFrame > 0 && usPerFrame <= 0xffffffffL,
      s"usPerFrame=$usPerFrame out of the header field's range")
    val jpegs = frames.map { img =>
      // the JDK JPEG writer refuses alpha; normalize to RGB
      val rgb =
        if (img.getType == java.awt.image.BufferedImage.TYPE_INT_RGB) img
        else {
          val c = new java.awt.image.BufferedImage(img.getWidth,
            img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = c.createGraphics()
          try g.drawImage(img, 0, 0, null): Unit finally g.dispose()
          c
        }
      val baos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(rgb, "jpg", baos),
        "no JPEG writer available")
      baos.toByteArray
    }
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val maxJpeg = jpegs.map(_.length).max

    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def le16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def fcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))

    // sizes, inner-out (every chunk is even-padded; JPEG lengths vary)
    def padded(n: Int) = n + (n & 1)
    val strhSize = 56
    val strfVSize = 40
    val strfASize = 16 // plain WAVEFORMATEX without cbSize (PCM)
    val strlVSize = 4 + 8 + strhSize + 8 + strfVSize
    val strlASize = 4 + 8 + strhSize + 8 + strfASize
    val avihSize = 56
    val hdrlSize = 4 + 8 + avihSize + 8 + strlVSize +
      audio.fold(0)(_ => 8 + strlASize)
    val moviSize = 4 + jpegs.map(j => 8 + padded(j.length)).sum +
      audio.fold(0) { case (pcm, _) => 8 + padded(pcm.length) }
    val idx1Size = 16 * (jpegs.length + audio.size)
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize + 8 + idx1Size

    fcc("RIFF"); le32(riffSize.toLong); fcc("AVI ")
    fcc("LIST"); le32(hdrlSize.toLong); fcc("hdrl")
    fcc("avih"); le32(avihSize.toLong)
    le32(usPerFrame)                    // dwMicroSecPerFrame
    le32(0L); le32(0L); le32(0L)        // maxBytesPerSec, padding, flags
    le32(jpegs.length.toLong)           // dwTotalFrames
    le32(0L)                            // dwInitialFrames
    le32(1L + audio.size)               // dwStreams
    le32(maxJpeg.toLong)                // dwSuggestedBufferSize
    le32(w.toLong); le32(h.toLong)
    le32(0L); le32(0L); le32(0L); le32(0L) // dwReserved[4]
    fcc("LIST"); le32(strlVSize.toLong); fcc("strl")
    fcc("strh"); le32(strhSize.toLong)
    fcc("vids"); fcc("MJPG")            // fccType, fccHandler
    le32(0L)                            // dwFlags
    le16(0); le16(0)                    // wPriority, wLanguage
    le32(0L)                            // dwInitialFrames
    le32(usPerFrame)                    // dwScale
    le32(1000000L)                      // dwRate (frames/s = rate/scale)
    le32(0L)                            // dwStart
    le32(jpegs.length.toLong)           // dwLength
    le32(maxJpeg.toLong)                // dwSuggestedBufferSize
    le32(0xffffffffL)                   // dwQuality (default)
    le32(0L)                            // dwSampleSize
    le16(0); le16(0); le16(w); le16(h)  // rcFrame
    fcc("strf"); le32(strfVSize.toLong)
    le32(40L)                           // biSize
    le32(w.toLong); le32(h.toLong)
    le16(1); le16(24)                   // biPlanes, biBitCount
    fcc("MJPG")                         // biCompression
    le32(w.toLong * h * 3)              // biSizeImage
    le32(0L); le32(0L); le32(0L); le32(0L) // pels/meter, clr used/important
    audio.foreach { case (pcm, rate) =>
      val blockAlign = audioChannels * audioBits / 8
      fcc("LIST"); le32(strlASize.toLong); fcc("strl")
      fcc("strh"); le32(strhSize.toLong)
      fcc("auds"); le32(0L)             // fccType, fccHandler (0 = PCM)
      le32(0L)                          // dwFlags
      le16(0); le16(0)                  // wPriority, wLanguage
      le32(0L)                          // dwInitialFrames
      le32(1L)                          // dwScale
      le32(rate.toLong)                 // dwRate (samples/s)
      le32(0L)                          // dwStart
      le32(pcm.length.toLong / blockAlign) // dwLength (samples)
      le32(pcm.length.toLong)           // dwSuggestedBufferSize
      le32(0xffffffffL)                 // dwQuality
      le32(blockAlign.toLong)           // dwSampleSize
      le16(0); le16(0); le16(0); le16(0) // rcFrame (unused for audio)
      fcc("strf"); le32(strfASize.toLong)
      le16(audioFormatTag)              // PCM (1) / A-law (6) / µ-law (7)
      le16(audioChannels)               // nChannels
      le32(rate.toLong)                 // nSamplesPerSec
      le32(rate.toLong * blockAlign)    // nAvgBytesPerSec
      le16(blockAlign)                  // nBlockAlign
      le16(audioBits)                   // wBitsPerSample
    }
    fcc("LIST"); le32(moviSize.toLong); fcc("movi")
    val offsets = new Array[Int](jpegs.length) // relative to 'movi' fourcc
    var rel = 4
    jpegs.zipWithIndex.foreach { case (j, i) =>
      offsets(i) = rel
      fcc("00dc"); le32(j.length.toLong)
      out.write(j)
      if ((j.length & 1) == 1) out.write(0)
      rel += 8 + padded(j.length)
    }
    val audioOffset = rel
    audio.foreach { case (pcm, _) =>
      fcc("01wb"); le32(pcm.length.toLong)
      out.write(pcm)
      if ((pcm.length & 1) == 1) out.write(0)
    }
    fcc("idx1"); le32(idx1Size.toLong)
    jpegs.zipWithIndex.foreach { case (j, i) =>
      fcc("00dc"); le32(0x10L)          // AVIIF_KEYFRAME
      le32(offsets(i).toLong); le32(j.length.toLong)
    }
    audio.foreach { case (pcm, _) =>
      fcc("01wb"); le32(0x10L)
      le32(audioOffset.toLong); le32(pcm.length.toLong)
    }
    out.toByteArray
  }
}

/** The unified VIDEO-CONTAINER seam: every video-path face (scene cuts,
  * frame fingerprints, fps sampling, quality gates, composed pipelines)
  * reads frames through [[withFrames]], which dispatches on container
  * magic — animated GIF through the JDK's frame-indexed reader, AVI/MJPEG
  * through [[AviCodec]], MJPEG-in-mp4 through [[Mp4Codec.openVideo]]'s
  * sample-table walk — so a new real container lights up EVERY face at
  * once. Compressed-codec containers (avc1/hev1/vp09 mp4, webm — the
  * JDK ships no codec) refuse loudly, the documented stub seam. */
private[multimodal] object VideoCodec {

  /** Frame access + per-frame timing in MICROSECONDS — the finest unit
    * any served container states (AVI's dwMicroSecPerFrame), so no
    * consumer quantizes: a 60 fps AVI reports 16666 µs exactly instead
    * of a truncated centisecond.
    *
    * Two timing views, because the containers differ in WHO owns the
    * ambiguity: [[delayUs]] is the container's RAW stated delay (GIF's
    * GCE centiseconds × 10000; AVI's header µs verbatim) — duration
    * sums and quality gates read this, so a stated-zero GIF really sums
    * to zero. [[renderedDelayUs]] is the WALL-CLOCK display time the
    * fps-invariant faces sample against: GIF delays <= 1 cs mean
    * "unspecified" by the format's browser convention and render as
    * 10 cs; AVI timing is EXPLICIT in its header, so it passes through
    * exactly — a 100 fps AVI ticks at 10000 µs, never stretched to the
    * GIF fallback. */
  trait Frames {
    def numFrames: Int
    def frame(i: Int): java.awt.image.BufferedImage
    /** Raw container-stated per-frame delay in µs. */
    def delayUs(i: Int): Long
    /** Wall-clock display delay in µs (GIF-only unspecified-delay
      * convention applied; explicit AVI timing verbatim). */
    def renderedDelayUs(i: Int): Long
    /** Frame i as (luminance plane, width, height) — value-identical to
      * `Pixels.lumaPlane(frame(i))` + dims (unit-pinned). The
      * decode-to-hash faces read THIS: palette containers (GIF) decode
      * indices straight to luma through a 256-entry LUT, skipping the
      * BufferedImage + ARGB round-trip the hash never needed. */
    def lumaFrame(i: Int): (Array[Int], Int, Int) = {
      val img = frame(i)
      (Pixels.lumaPlane(img), img.getWidth, img.getHeight)
    }
  }

  def isVideo(b: Array[Byte]): Boolean =
    Multimodal.GifCodec.isGif(b) || AviCodec.isAvi(b) ||
      Mp4Codec.hasMjpegVideo(b) || MkvCodec.hasMjpegVideo(b)

  def withFrames[T](payload: Array[Byte])(f: Frames => T): T =
    if (Multimodal.GifCodec.isGif(payload)) {
      // the in-JVM LZW decoder ([[GifDecode]]): one parse records all
      // frame spans + GCE timing, each frame is one tight LZW loop —
      // no per-frame XML metadata trees, no stream re-walks
      val gif = GifDecode.parse(payload)
      f(new Frames {
        def numFrames: Int = gif.numFrames
        def frame(i: Int): java.awt.image.BufferedImage = gif.frame(i)
        override def lumaFrame(i: Int): (Array[Int], Int, Int) = {
          val fr = gif.frames(i)
          (gif.lumaFrame(i), fr.width, fr.height)
        }
        def delayUs(i: Int): Long = gif.frames(i).delayCs.toLong * 10000L
        def renderedDelayUs(i: Int): Long = {
          // zero/absent GCE delays are common in wild GIFs; browsers
          // render delay <= 1 cs as 10 cs — the format's convention
          val cs = gif.frames(i).delayCs
          (if (cs <= 1) 10L else cs.toLong) * 10000L
        }
      })
    }
    else if (AviCodec.isAvi(payload)) {
      val avi = AviCodec.open(payload)
      f(new Frames {
        def numFrames: Int = avi.numFrames
        def frame(i: Int): java.awt.image.BufferedImage = avi.frame(i)
        def delayUs(i: Int): Long = avi.usPerFrame
        // AVI timing is explicit in the header — no unspecified-delay
        // convention; a 100 fps clip ticks at 10000 µs, not 100000
        def renderedDelayUs(i: Int): Long = avi.usPerFrame
      })
    } else if (Mp4Codec.hasMjpegVideo(payload)) {
      val mp4 = Mp4Codec.openVideo(payload)
      f(new Frames {
        def numFrames: Int = mp4.numFrames
        def frame(i: Int): java.awt.image.BufferedImage = mp4.frame(i)
        // mp4 stts timing is explicit AND per-frame (natively VFR),
        // already in µs through the mdhd timescale
        def delayUs(i: Int): Long = mp4.frameDelaysUs(i)
        def renderedDelayUs(i: Int): Long = mp4.frameDelaysUs(i)
      })
    } else if (MkvCodec.hasMjpegVideo(payload)) {
      val mkv = MkvCodec.openVideo(payload)
      f(new Frames {
        def numFrames: Int = mkv.numFrames
        def frame(i: Int): java.awt.image.BufferedImage = mkv.frame(i)
        // Matroska block timestamps are explicit and per-frame
        // (natively VFR), in µs through the TimestampScale
        def delayUs(i: Int): Long = mkv.delaysUs(i)
        def renderedDelayUs(i: Int): Long = mkv.delaysUs(i)
      })
    } else throw new IllegalArgumentException(
      "payload is not a decodable video container (animated GIF, " +
        "AVI/MJPEG, MJPEG-in-mp4 and MJPEG-in-Matroska decode in-JVM; " +
        "compressed codecs — avc1/hev1/vp09, VP8/VP9 webm — need a " +
        "codec the JDK lacks)")
}
