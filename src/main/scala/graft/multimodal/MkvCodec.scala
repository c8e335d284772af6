package graft.multimodal

/** Matroska/WebM (EBML) container walk — the FOURTH video container
  * family, by the same honest rules as AVI and mp4: everything the
  * bytes state (structure, timing, track layout, PCM samples, MJPEG
  * frames) is parsed in-JVM with zero native codecs, and compressed
  * codings the JDK cannot decode (VP8/VP9/AVC video, Vorbis/Opus
  * audio — the typical webm) refuse loudly instead of guessing.
  *
  * Served faces:
  *  - [[openVideo]]: `V_MJPEG` (and `V_MS/VFW/FOURCC` with an MJPG
  *    BITMAPINFOHEADER) tracks decode frame-by-frame through the JDK
  *    JPEG codec; per-block timestamps give NATIVE VFR timing in µs
  *    through the segment's TimestampScale, like mp4's stts.
  *  - [[extractAudio]]: `A_PCM/INT/LIT` tracks (16-bit signed /
  *    8-bit unsigned by the convention ffmpeg and players apply)
  *    demux to the same [[AviCodec.AviAudio]] carrier the AVI/mp4
  *    demuxes feed, so the whole audio stack lights up at once.
  *  - [[strip]]/[[wipeReport]]: `Tags` and `Attachments` — where
  *    muxers stash author/location strings and arbitrary smuggled
  *    files — are WIPED IN PLACE with a same-size `Void` element
  *    (Matroska's own mechanism for exactly this: SeekHead and Cues
  *    hold segment-relative OFFSETS, so removal would corrupt every
  *    pointer); bytes past the Segment's declared end strip as the
  *    `TRAILING` pseudo-element.
  *
  * Layout notes (Matroska spec / RFC 8794 EBML): every element is
  * (vint id, vint size, payload); ids keep their marker bit on the
  * wire, sizes drop it; an all-ones size means "unknown" (streamed
  * files) and is accepted for Segment only (extends to EOF — wild
  * stream dumps end that way). SimpleBlock payload: track-number
  * vint, s16 big-endian timestamp relative to the cluster's, flags
  * (lacing refused loudly), frame bytes.
  *
  * Untrusted-bytes hardening: all offset arithmetic in Long before
  * bounds checks, so a crafted size near 2^63 fails the loud
  * `require` instead of wrapping.
  */
private[multimodal] object MkvCodec {

  ImageIoTuning.init // memory-cached ImageIO streams for the JPEG frames


  // element ids as they appear on the wire (marker bit included)
  private val IdEbml = 0x1A45DFA3L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecID = 0x86L
  private val IdCodecPrivate = 0x63A2L
  private val IdDefaultDuration = 0x23E383L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdBitDepth = 0x6264L
  private val IdCluster = 0x1F43B675L
  private val IdClusterTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdTags = 0x1254C367L
  private val IdAttachments = 0x1941A469L
  private val IdVoid = 0xECL

  def isMkv(b: Array[Byte]): Boolean =
    b.length > 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  /** One parsed element: wire id, payload offset, payload length
    * (resolved; unknown-size only ever reaches callers for Segment),
    * total length including the header. */
  private final case class El(id: Long, body: Int, len: Int, total: Int)

  /** Read the vint ELEMENT ID at `off` (marker kept). */
  private def readId(b: Array[Byte], off: Int): (Long, Int) = {
    require(off < b.length, s"EBML id past end at $off")
    val first = b(off) & 0xff
    val n = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(n >= 1 && n <= 4, f"invalid EBML id lead byte 0x$first%02x at $off")
    require(off + n <= b.length, s"truncated EBML id at $off")
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    (v, n)
  }

  /** Read the vint SIZE at `off` (marker dropped); -1 = unknown. */
  private def readSize(b: Array[Byte], off: Int): (Long, Int) = {
    require(off < b.length, s"EBML size past end at $off")
    val first = b(off) & 0xff
    require(first != 0, s"invalid EBML size lead byte 0x00 at $off")
    val n = Integer.numberOfLeadingZeros(first) - 24 + 1
    require(n >= 1 && n <= 8, s"invalid EBML size length $n at $off")
    require(off + n <= b.length, s"truncated EBML size at $off")
    var v = (first & (0xff >>> n)).toLong
    var allOnes = (first & (0xff >>> n)) == (0xff >>> n)
    var i = 1
    while (i < n) {
      val x = b(off + i) & 0xff
      if (x != 0xff) allOnes = false
      v = (v << 8) | x
      i += 1
    }
    (if (allOnes) -1L else v, n)
  }

  /** Children of the span [from, until): flat walk, loud on overflow
    * or truncation. Unknown-size children refuse (only the top-level
    * Segment may be unknown-size). */
  private def children(b: Array[Byte], from: Int, until: Int): Seq[El] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[El]
    var off = from
    while (off < until) {
      val (id, idLen) = readId(b, off)
      val (size, szLen) = readSize(b, off + idLen)
      require(size >= 0, f"unknown-size element 0x$id%x at $off — only " +
        "the Segment may be unknown-size")
      val body = off.toLong + idLen + szLen
      val end = body + size
      require(end <= until, f"element 0x$id%x at $off overruns its parent " +
        s"($end > $until)")
      out += El(id, body.toInt, size.toInt, (end - off).toInt)
      off = end.toInt
    }
    out.toSeq
  }

  /** (segment body span, trailing-bytes offset): walks the EBML header
    * + Segment at the top level. */
  private def segmentSpan(b: Array[Byte]): (Int, Int, Int) = {
    require(isMkv(b), "payload is not an EBML/Matroska container")
    val (_, hIdLen) = readId(b, 0)
    val (hSize, hSzLen) = readSize(b, hIdLen)
    require(hSize >= 0, "EBML header with unknown size")
    var off = (hIdLen + hSzLen + hSize).toInt
    require(off.toLong + 4 <= b.length, "no Segment after the EBML header")
    val (segId, segIdLen) = readId(b, off)
    require(segId == IdSegment, f"expected Segment, found 0x$segId%x at $off")
    val (segSize, segSzLen) = readSize(b, off + segIdLen)
    val body = off + segIdLen + segSzLen
    val end =
      if (segSize < 0) b.length.toLong // streamed: extends to EOF
      else body.toLong + segSize
    require(end <= b.length, s"Segment overruns the payload ($end > ${b.length})")
    (body, end.toInt, end.toInt)
  }

  private def uint(b: Array[Byte], e: El): Long = {
    require(e.len <= 8, s"EBML uint of ${e.len} bytes")
    var v = 0L
    var i = 0
    while (i < e.len) { v = (v << 8) | (b(e.body + i) & 0xffL); i += 1 }
    v
  }

  private def float64(b: Array[Byte], e: El): Double = e.len match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, e))
    case n => throw new IllegalArgumentException(s"EBML float of $n bytes")
  }

  private def str(b: Array[Byte], e: El): String =
    new String(b, e.body, e.len, "UTF-8")

  private final case class Track(number: Long, trackType: Long,
                                 codec: String, codecPrivate: Array[Byte],
                                 defaultDurationNs: Long,
                                 width: Int, height: Int,
                                 rate: Double, channels: Int, bits: Int)

  private def parseTracks(b: Array[Byte], tracksEl: El): Seq[Track] =
    children(b, tracksEl.body, tracksEl.body + tracksEl.len)
      .filter(_.id == IdTrackEntry).map { te =>
        var number = -1L; var tt = -1L; var codec = ""
        var priv: Array[Byte] = Array.emptyByteArray
        var defDur = -1L
        var w = 0; var h = 0
        var rate = 8000.0; var ch = 1; var bits = 16
        children(b, te.body, te.body + te.len).foreach { e =>
          e.id match {
            case IdTrackNumber => number = uint(b, e)
            case IdTrackType => tt = uint(b, e)
            case IdCodecID => codec = str(b, e)
            case IdCodecPrivate =>
              priv = java.util.Arrays.copyOfRange(b, e.body, e.body + e.len)
            case IdDefaultDuration => defDur = uint(b, e)
            case IdVideo =>
              children(b, e.body, e.body + e.len).foreach { v =>
                if (v.id == IdPixelWidth) w = uint(b, v).toInt
                else if (v.id == IdPixelHeight) h = uint(b, v).toInt
              }
            case IdAudio =>
              children(b, e.body, e.body + e.len).foreach { a =>
                if (a.id == IdSamplingFrequency) rate = float64(b, a)
                else if (a.id == IdChannels) ch = uint(b, a).toInt
                else if (a.id == IdBitDepth) bits = uint(b, a).toInt
              }
            case _ => ()
          }
        }
        require(number > 0, "TrackEntry without a TrackNumber")
        Track(number, tt, codec, priv, defDur, w, h, rate, ch, bits)
      }

  /** All SimpleBlocks of `trackNumber` in cluster order:
    * (absolute timestamp in TimestampScale ticks, payload bytes). */
  private def blocksOf(b: Array[Byte], segFrom: Int, segUntil: Int,
                       trackNumber: Long): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
    children(b, segFrom, segUntil).filter(_.id == IdCluster).foreach { cl =>
      var clusterTs = 0L
      children(b, cl.body, cl.body + cl.len).foreach { e =>
        if (e.id == IdClusterTimestamp) clusterTs = uint(b, e)
        else if (e.id == IdSimpleBlock) {
          val (tn, tnLen) = readSize(b, e.body) // track vint: marker dropped
          require(tn >= 0, "SimpleBlock with unknown-size track number")
          if (tn == trackNumber) {
            val p = e.body + tnLen
            require(p + 3 <= e.body + e.len, "truncated SimpleBlock header")
            val rel = (((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)).toShort.toLong
            val flags = b(p + 2) & 0xff
            require((flags & 0x06) == 0,
              "laced SimpleBlock — lacing is not served (refusing loudly)")
            out += ((clusterTs + rel,
              java.util.Arrays.copyOfRange(b, p + 3, e.body + e.len)))
          }
        }
      }
    }
    out.toSeq
  }

  private def timestampScaleNs(b: Array[Byte], segFrom: Int, segUntil: Int): Long =
    children(b, segFrom, segUntil).find(_.id == IdInfo)
      .flatMap(info => children(b, info.body, info.body + info.len)
        .find(_.id == IdTimestampScale).map(uint(b, _)))
      .getOrElse(1000000L) // spec default: 1 ms

  private def isMjpegCodec(t: Track): Boolean =
    t.codec == "V_MJPEG" ||
      (t.codec == "V_MS/VFW/FOURCC" && t.codecPrivate.length >= 20 &&
        new String(t.codecPrivate, 16, 4, "US-ASCII") == "MJPG")

  /** Does the container hold an in-JVM-decodable (MJPEG) video track?
    * Cheap walk, no decode — the [[VideoCodec]] dispatch gate. */
  def hasMjpegVideo(b: Array[Byte]): Boolean =
    isMkv(b) && (try {
      val (from, until, _) = segmentSpan(b)
      children(b, from, until).find(_.id == IdTracks)
        .exists(t => parseTracks(b, t).exists(tr =>
          tr.trackType == 1 && isMjpegCodec(tr)))
    } catch { case _: IllegalArgumentException => false })

  final case class MkvFrames(jpegs: IndexedSeq[Array[Byte]],
                             delaysUs: IndexedSeq[Long],
                             width: Int, height: Int) {
    def numFrames: Int = jpegs.length
    def frame(i: Int): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpegs(i)))
      require(img != null, s"frame $i is not a decodable JPEG")
      img
    }
  }

  /** Open the single MJPEG video track: per-frame JPEG bytes plus VFR
    * delays in µs (consecutive block timestamps; the LAST frame takes
    * the track's DefaultDuration, else the preceding delay — a
    * timestamped container states when frames START, not how long the
    * final one lingers). */
  def openVideo(payload: Array[Byte]): MkvFrames = {
    val (from, until, _) = segmentSpan(payload)
    val tracksEl = children(payload, from, until).find(_.id == IdTracks)
      .getOrElse(throw new IllegalArgumentException(
        "Matroska segment has no Tracks element"))
    val vids = parseTracks(payload, tracksEl).filter(_.trackType == 1)
    require(vids.nonEmpty, "Matroska container declares no video track")
    require(vids.size == 1,
      "Matroska container declares more than one video track — " +
        "refusing instead of interleaving foreign frames")
    val v = vids.head
    require(isMjpegCodec(v),
      s"video codec ${v.codec} needs a decoder the JDK lacks (VP8/VP9/" +
        "AVC webm frames cannot decode in-JVM; MJPEG tracks do)")
    val scaleNs = timestampScaleNs(payload, from, until)
    val blocks = blocksOf(payload, from, until, v.number)
    require(blocks.nonEmpty, "MJPEG track has no SimpleBlocks")
    val ts = blocks.map(_._1)
    require(ts == ts.sorted, "video block timestamps out of order")
    val delays = Array.ofDim[Long](blocks.length)
    var i = 0
    while (i < blocks.length - 1) {
      delays(i) = (ts(i + 1) - ts(i)) * scaleNs / 1000L
      i += 1
    }
    delays(blocks.length - 1) =
      if (v.defaultDurationNs > 0) v.defaultDurationNs / 1000L
      else if (blocks.length > 1) delays(blocks.length - 2)
      else 0L
    MkvFrames(blocks.map(_._2).toIndexedSeq, delays.toIndexedSeq,
      v.width, v.height)
  }

  /** Demux the PCM audio track (`A_PCM/INT/LIT`) into the shared
    * [[AviCodec.AviAudio]] carrier; None when no audio track exists,
    * loud refusal on compressed codings. */
  def extractAudio(payload: Array[Byte]): Option[AviCodec.AviAudio] = {
    val (from, until, _) = segmentSpan(payload)
    val tracksEl = children(payload, from, until).find(_.id == IdTracks)
      .getOrElse(return None)
    val auds = parseTracks(payload, tracksEl).filter(_.trackType == 2)
    if (auds.isEmpty) return None
    require(auds.size == 1, "more than one audio track — refusing")
    val a = auds.head
    require(a.codec == "A_PCM/INT/LIT",
      s"audio codec ${a.codec} needs a decoder the JDK lacks " +
        "(A_PCM/INT/LIT demuxes; Vorbis/Opus/AAC refuse loudly)")
    require(a.bits == 8 || a.bits == 16, s"${a.bits}-bit PCM unsupported")
    val blocks = blocksOf(payload, from, until, a.number)
    val pcm = new java.io.ByteArrayOutputStream()
    blocks.foreach { case (_, bytes) => pcm.write(bytes) }
    Some(AviCodec.AviAudio(pcm.toByteArray, a.channels,
      math.round(a.rate).toInt, a.bits))
  }

  // ---- scrub faces ----

  /** Wipe `Tags`/`Attachments` in place (same-size Void) and strip
    * trailing bytes: (clean payload, dropped element names). A clean
    * payload returns the original array. */
  def strip(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val (from, until, trail) = segmentSpan(payload)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    val targets = children(payload, from, until).filter(e =>
      e.id == IdTags || e.id == IdAttachments)
    val trailing = trail < payload.length
    if (targets.isEmpty && !trailing) return (payload, Nil)
    val out = java.util.Arrays.copyOfRange(payload, 0,
      if (trailing) trail else payload.length)
    if (trailing) dropped += "TRAILING"
    targets.foreach { e =>
      val start = e.body + e.len - e.total // element start offset
      voidOver(out, start, e.total)
      dropped += (if (e.id == IdTags) "Tags" else "Attachments")
    }
    (out, dropped.toSeq)
  }

  /** What [[strip]] would drop — the audit face. */
  def wipeReport(payload: Array[Byte]): Seq[String] = {
    val (from, until, trail) = segmentSpan(payload)
    val names = children(payload, from, until).collect {
      case e if e.id == IdTags => "Tags"
      case e if e.id == IdAttachments => "Attachments"
    }
    if (trail < payload.length) names :+ "TRAILING" else names
  }

  /** Overwrite [start, start+total) with a Void element of exactly
    * that size. */
  private def voidOver(b: Array[Byte], start: Int, total: Int): Unit = {
    require(total >= 2, s"cannot Void a $total-byte span")
    // Void = 0xEC + size vint + zero payload; pick the size-field
    // length so header + payload == total
    var szLen = 1
    while (szLen < 8 && !fits(total, szLen)) szLen += 1
    require(fits(total, szLen), s"cannot encode Void of $total bytes")
    val payloadLen = total - 1 - szLen
    b(start) = 0xec.toByte
    var v = payloadLen.toLong | (1L << (7 * szLen)) // marker bit
    var i = szLen - 1
    while (i >= 0) {
      b(start + 1 + i) = (v & 0xff).toByte
      v >>= 8
      i -= 1
    }
    java.util.Arrays.fill(b, start + 1 + szLen, start + total, 0.toByte)
  }

  private def fits(total: Int, szLen: Int): Boolean = {
    val payloadLen = total.toLong - 1 - szLen
    payloadLen >= 0 && payloadLen < (1L << (7 * szLen)) - 1
  }

  // ---- writer (fixture/producer face) ----

  private def encodeId(id: Long): Array[Byte] = {
    val n = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
    else if (id <= 0xffffffL) 3 else 4
    Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def encodeSize(size: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && size >= (1L << (7 * n)) - 1) n += 1
    val v = size | (1L << (7 * n))
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    encodeId(id) ++ encodeSize(body.length.toLong) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  private def floatBody(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate(8)(i => ((bits >> (8 * (7 - i))) & 0xff).toByte)
  }

  /** Write a Matroska container with one MJPEG video track (frame
    * JPEGs + per-frame start timestamps in ms) and optionally one
    * PCM audio track, a Tags element and trailing bytes — the
    * producer/adversary side of every read face here. */
  def writeMkv(jpegs: Seq[Array[Byte]], frameTsMs: Seq[Long],
               width: Int, height: Int,
               defaultDurationMs: Long = 0L,
               audio: Option[AviCodec.AviAudio] = None,
               tags: Option[String] = None,
               trailing: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(jpegs.length == frameTsMs.length, "one timestamp per frame")
    val ebml = el(IdEbml,
      el(0x4286L, uintBody(1L)) ++ // EBMLVersion
        el(0x42F7L, uintBody(1L)) ++ // EBMLReadVersion
        el(0x42F2L, uintBody(4L)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintBody(8L)) ++ // EBMLMaxSizeLength
        el(0x4282L, "matroska".getBytes("US-ASCII")) ++ // DocType
        el(0x4287L, uintBody(2L)) ++ // DocTypeVersion
        el(0x4285L, uintBody(2L))) // DocTypeReadVersion
    val info = el(IdInfo, el(IdTimestampScale, uintBody(1000000L)))
    val videoTrack = if (jpegs.isEmpty) Array.emptyByteArray else el(IdTrackEntry,
      el(IdTrackNumber, uintBody(1L)) ++
        el(0x73C5L, uintBody(1L)) ++ // TrackUID
        el(IdTrackType, uintBody(1L)) ++
        el(IdCodecID, "V_MJPEG".getBytes("US-ASCII")) ++
        (if (defaultDurationMs > 0)
          el(IdDefaultDuration, uintBody(defaultDurationMs * 1000000L))
        else Array.emptyByteArray) ++
        el(IdVideo,
          el(IdPixelWidth, uintBody(width.toLong)) ++
            el(IdPixelHeight, uintBody(height.toLong))))
    val audioTrack = audio.fold(Array.emptyByteArray) { a =>
      el(IdTrackEntry,
        el(IdTrackNumber, uintBody(2L)) ++
          el(0x73C5L, uintBody(2L)) ++
          el(IdTrackType, uintBody(2L)) ++
          el(IdCodecID, "A_PCM/INT/LIT".getBytes("US-ASCII")) ++
          el(IdAudio,
            el(IdSamplingFrequency, floatBody(a.rate.toDouble)) ++
              el(IdChannels, uintBody(a.channels.toLong)) ++
              el(IdBitDepth, uintBody(a.bits.toLong))))
    }
    val tracks = el(IdTracks, videoTrack ++ audioTrack)
    def simpleBlock(track: Int, relTs: Int, data: Array[Byte]): Array[Byte] =
      el(IdSimpleBlock,
        Array((0x80 | track).toByte, ((relTs >> 8) & 0xff).toByte,
          (relTs & 0xff).toByte, 0x80.toByte) ++ data)
    val videoBlocks = jpegs.zip(frameTsMs).map { case (j, ts) =>
      require(ts >= 0 && ts <= 0x7fff, s"frame timestamp $ts out of s16")
      simpleBlock(1, ts.toInt, j)
    }
    val audioBlocks = audio.toSeq.map(a => simpleBlock(2, 0, a.pcm))
    val cluster = el(IdCluster,
      el(IdClusterTimestamp, uintBody(0L)) ++
        (videoBlocks ++ audioBlocks).foldLeft(Array.emptyByteArray)(_ ++ _))
    val tagsEl = tags.fold(Array.emptyByteArray)(t =>
      el(IdTags, el(0x7373L, // Tag
        el(0x67C8L, // SimpleTag
          el(0x45A3L, "COMMENT".getBytes("UTF-8")) ++ // TagName
            el(0x4487L, t.getBytes("UTF-8")))))) // TagString
    val segment = el(IdSegment, info ++ tracks ++ cluster ++ tagsEl)
    ebml ++ segment ++ trailing
  }
}
