package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Multimodal.MediaRecord

/** Media METADATA scrubbing — the compliance face for binary payloads
  * (the reference's purge/retention domain applies to rows; crawled
  * media smuggles PII in container metadata instead): strip every
  * non-essential PNG chunk — tEXt/iTXt/zTXt comments, tIME, eXIf GPS
  * blocks — while leaving the pixel stream BYTE-IDENTICAL (IHDR/PLTE/
  * IDAT and the color-interpretation chunks are kept, so decode output
  * is unchanged by construction).
  *
  * Six containers are walked: PNG (tEXt/iTXt/zTXt/tIME/eXIf chunks),
  * JPEG (APP1 Exif/XMP — where crawled photos carry GPS — APP13 IPTC
  * and COM segments; JFIF APP0, ICC APP2 and the Adobe APP14 color
  * flag stay), RIFF/WAVE (LIST/INFO, id3, bext), RIFF/AVI (LIST INFO,
  * JUNK padding), GIF (comment/plain-text extensions) and ISO-BMFF
  * mp4/m4a/mov ([[Mp4Codec]]: udta/meta/uuid boxes and dirty free-space
  * padding, wiped IN PLACE because stco sample offsets are
  * file-absolute). Bytes smuggled AFTER a container's declared end
  * (past PNG's IEND, after JPEG's EOI, beyond the RIFF size, after the
  * GIF trailer, past mp4's last top-level box) are stripped and
  * reported as a `TRAILING` pseudo-chunk — decoders never read them, so
  * they are pure metadata carriage.
  *
  * Scale shape: map-only byte-level chunk walk — NO decode, no codec
  * init; the pass reads each payload once and rewrites only offending
  * containers (clean payloads pass through reference-identical, no
  * re-encode drift). Other container formats pass through untouched.
  */
object MediaScrub {

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Chunks that stay: structural (IHDR/PLTE/IDAT/IEND), transparency
    * and color interpretation — everything needed to reproduce pixels
    * exactly. Everything else (tEXt, zTXt, iTXt, tIME, eXIf, private
    * chunks) is metadata and is dropped. */
  private val Keep = Set("IHDR", "PLTE", "IDAT", "IEND", "tRNS", "gAMA",
    "cHRM", "sRGB", "iCCP", "sBIT", "pHYs", "acTL", "fcTL", "fdAT")

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && PngSig.indices.forall(i => b(i) == PngSig(i))

  /** Walk the chunk stream: (type, offset, totalLen) per chunk.
    * Malformed containers refuse loudly — silently passing one through
    * would ship the very metadata this pass exists to remove. Bytes
    * AFTER the IEND chunk (the classic smuggling spot — decoders stop at
    * IEND, so appended data survives any per-chunk scrub) surface as a
    * `TRAILING` pseudo-chunk, which no Keep set contains: they are
    * stripped and reported like any metadata chunk. */
  private def chunkSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(isPng(b), "payload is not a PNG container")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = 8
    var sawEnd = false
    while (!sawEnd) {
      require(off + 8 <= b.length, s"truncated PNG chunk header at $off")
      val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      require(len >= 0, s"negative chunk length at $off")
      val tpe = new String(b, off + 4, 4, "US-ASCII")
      val total = 12 + len
      require(off + total <= b.length, s"truncated $tpe chunk at $off")
      out += ((tpe, off, total))
      if (tpe == "IEND") sawEnd = true
      off += total
    }
    if (off < b.length) out += (("TRAILING", off, b.length - off))
    out.toSeq
  }

  /** Strip metadata chunks from one PNG payload: (scrubbed bytes,
    * dropped chunk types). A clean payload returns the ORIGINAL array
    * (reference equality — zero copies on the common path). */
  def stripPng(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = chunkSpans(payload)
    val dropped = spans.filterNot(s => Keep(s._1))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = spans.filter(s => Keep(s._1))
      val outLen = 8 + keep.map(_._3).sum
      val out = new Array[Byte](outLen)
      System.arraycopy(payload, 0, out, 0, 8)
      var pos = 8
      keep.foreach { case (_, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  // ---- WAV (RIFF) containers ----

  /** RIFF/WAVE chunks that stay: the format header, the sample data and
    * the compressed-frame count. LIST/INFO comment blocks, id3 tags and
    * broadcast-extension (bext) blocks — where recorders stash device
    * serials, locations and operator names — are dropped. */
  private val KeepWav = Set("fmt ", "data", "fact")

  def isRiffWave(b: Array[Byte]): Boolean =
    b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Walk the RIFF chunk list: (id, offset, totalLen incl. pad byte).
    * Little-endian sizes, word alignment honored. Malformed containers
    * refuse loudly. Bytes beyond the DECLARED RIFF size (players honor
    * the header, so appended data survives any per-chunk scrub) surface
    * as a `TRAILING` pseudo-chunk — stripped and reported. */
  private def wavChunkSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(isRiffWave(b), "payload is not a RIFF/WAVE container")
    riffFlatSpans(b)
  }

  /** The flat RIFF walk shared by WAVE and WEBP forms (AVI needs the
    * LIST-aware walk instead): caller has validated the form type. */
  private def riffFlatSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    val riffEnd = math.min(b.length.toLong,
      12L + (((b(4) & 0xffL)) | ((b(5) & 0xffL) << 8) |
        ((b(6) & 0xffL) << 16) | ((b(7) & 0xffL) << 24)) - 4L).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = 12
    while (off < riffEnd) {
      require(off + 8 <= b.length, s"truncated RIFF chunk header at $off")
      val id = new String(b, off, 4, "US-ASCII")
      val len = ((b(off + 4) & 0xff)) | ((b(off + 5) & 0xff) << 8) |
        ((b(off + 6) & 0xff) << 16) | ((b(off + 7) & 0xff) << 24)
      require(len >= 0, s"negative RIFF chunk length at $off")
      val total = 8 + len + (len & 1)
      require(off + 8 + len <= b.length, s"truncated $id chunk at $off")
      out += ((id, off, math.min(total, b.length - off)))
      off += total
    }
    if (off < b.length) out += (("TRAILING", off, b.length - off))
    out.toSeq
  }

  /** Strip metadata chunks from one WAV payload: (scrubbed bytes,
    * dropped chunk ids), RIFF size field rewritten. A clean payload
    * returns the original array. */
  def stripWav(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = wavChunkSpans(payload)
    val dropped = spans.filterNot(s => KeepWav(s._1))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = spans.filter(s => KeepWav(s._1))
      val body = keep.map(_._3).sum
      val out = new Array[Byte](12 + body)
      System.arraycopy(payload, 0, out, 0, 12)
      val riffSize = 4 + body
      out(4) = (riffSize & 0xff).toByte
      out(5) = ((riffSize >> 8) & 0xff).toByte
      out(6) = ((riffSize >> 16) & 0xff).toByte
      out(7) = ((riffSize >> 24) & 0xff).toByte
      var pos = 12
      keep.foreach { case (_, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  // ---- WebP containers ----

  /** WebP chunks that stay: the image/animation data and the COLOR
    * profile (ICCP is rendering info, like JPEG's ICC APP2). `EXIF`
    * and `XMP ` — where cameras and editors stash GPS coordinates,
    * device serials and author strings — are dropped. */
  private val KeepWebp =
    Set("VP8 ", "VP8L", "VP8X", "ALPH", "ANIM", "ANMF", "ICCP")

  def isRiffWebp(b: Array[Byte]): Boolean =
    b.length > 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  private def webpChunkSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(isRiffWebp(b), "payload is not a RIFF/WEBP container")
    riffFlatSpans(b)
  }

  /** Strip metadata chunks from one WebP payload: (scrubbed bytes,
    * dropped chunk ids), RIFF size rewritten, and the VP8X header's
    * EXIF/XMP presence flags CLEARED (readers trust the flags; a set
    * flag pointing at a removed chunk is a spec violation some
    * parsers refuse). A clean payload returns the original array. */
  def stripWebp(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = webpChunkSpans(payload)
    val dropped = spans.filterNot(s => KeepWebp(s._1))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = spans.filter(s => KeepWebp(s._1))
      val body = keep.map(_._3).sum
      val out = new Array[Byte](12 + body)
      System.arraycopy(payload, 0, out, 0, 12)
      val riffSize = 4 + body
      out(4) = (riffSize & 0xff).toByte
      out(5) = ((riffSize >> 8) & 0xff).toByte
      out(6) = ((riffSize >> 16) & 0xff).toByte
      out(7) = ((riffSize >> 24) & 0xff).toByte
      var pos = 12
      keep.foreach { case (id, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        if (id == "VP8X" && total >= 9) {
          // flags byte: |Rsv|Rsv|ICC|Alpha|EXIF|XMP|Anim|Rsv|
          out(pos + 8) = (out(pos + 8) & ~0x0c).toByte
        }
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  /** Insert EXIF/XMP metadata chunks (and set the matching VP8X flags
    * when present) — the fixture/adversary side of [[stripWebp]]. */
  private[multimodal] def insertWebpMetadata(payload: Array[Byte],
                                             exif: Array[Byte],
                                             xmp: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    val spans = webpChunkSpans(payload)
    require(!spans.exists(_._1 == "TRAILING"),
      "fixture payload already has trailing bytes")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = data.length & 1
      val out = new Array[Byte](8 + data.length + pad)
      System.arraycopy(id.getBytes("US-ASCII"), 0, out, 0, 4)
      out(4) = (data.length & 0xff).toByte
      out(5) = ((data.length >> 8) & 0xff).toByte
      out(6) = ((data.length >> 16) & 0xff).toByte
      out(7) = ((data.length >> 24) & 0xff).toByte
      System.arraycopy(data, 0, out, 8, data.length)
      out
    }
    val extra = chunk("EXIF", exif) ++
      (if (xmp.nonEmpty) chunk("XMP ", xmp) else Array.emptyByteArray)
    val out = new Array[Byte](payload.length + extra.length)
    System.arraycopy(payload, 0, out, 0, payload.length)
    System.arraycopy(extra, 0, out, payload.length, extra.length)
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    spans.find(_._1 == "VP8X").foreach { case (_, off, total) =>
      if (total >= 9)
        out(off + 8) = (out(off + 8) |
          (if (xmp.nonEmpty) 0x0c else 0x08)).toByte
    }
    out
  }

  // ---- MP3 (ID3-tagged) payloads ----

  /** MP3 bitstreams themselves need a codec the JDK lacks — but the
    * metadata wrapping them is pure structure: an ID3v2 block BEFORE
    * the audio (syncsafe-sized, where crawled music carries artist /
    * geotag / embedded-image frames), an ID3v1 trailer (the fixed
    * 128-byte `TAG` block) and an APEv2 trailer after it. The scrub
    * drops all three and leaves the audio frames byte-identical. */
  def isMp3(b: Array[Byte]): Boolean = {
    if (b.length < 4) return false
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') return true
    // bare frame sync: 11 set bits, MPEG audio version != reserved
    (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0 && (b(1) & 0x18) != 0x08
  }

  private def id3v2Length(b: Array[Byte], off: Int): Int = {
    // "ID3" maj min flags size(4 x 7-bit syncsafe)
    require(off + 10 <= b.length, "truncated ID3v2 header")
    val flags = b(off + 5) & 0xff
    val size = ((b(off + 6) & 0x7f) << 21) | ((b(off + 7) & 0x7f) << 14) |
      ((b(off + 8) & 0x7f) << 7) | (b(off + 9) & 0x7f)
    val footer = if ((flags & 0x10) != 0) 10 else 0
    val total = 10 + size + footer
    require(off + total <= b.length, "ID3v2 size overruns the payload")
    total
  }

  /** Strip ID3v2/ID3v1/APEv2 tag blocks from an MP3 payload:
    * (clean bytes, dropped block names). The audio frames are
    * UNTOUCHED — this is a byte-exact slice, not a re-encode. */
  def stripMp3(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    require(isMp3(payload), "payload is not an MP3 stream")
    val dropped = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start + 3 <= payload.length && payload(start) == 'I' &&
      payload(start + 1) == 'D' && payload(start + 2) == '3') {
      start += id3v2Length(payload, start)
      dropped += "ID3v2"
    }
    var end = payload.length
    if (end - start >= 128 && payload(end - 128) == 'T' &&
      payload(end - 127) == 'A' && payload(end - 126) == 'G') {
      end -= 128
      dropped += "ID3v1"
    }
    // APEv2 footer: 32 bytes ending the tag, "APETAGEX" + version +
    // size (LE, includes items + footer, not the optional header)
    if (end - start >= 32 &&
      new String(payload, end - 32, 8, "US-ASCII") == "APETAGEX") {
      val size = (payload(end - 20) & 0xff) | ((payload(end - 19) & 0xff) << 8) |
        ((payload(end - 18) & 0xff) << 16) | ((payload(end - 17) & 0xff) << 24)
      val flags = (payload(end - 8) & 0xff) | ((payload(end - 7) & 0xff) << 8) |
        ((payload(end - 6) & 0xff) << 16) | ((payload(end - 5) & 0xff) << 24)
      val header = if ((flags & 0x80000000) != 0) 32 else 0
      require(size + header <= end - start, "APEv2 size overruns the payload")
      end -= size + header
      dropped += "APEv2"
    }
    if (dropped.isEmpty) (payload, Nil)
    else (java.util.Arrays.copyOfRange(payload, start, end), dropped.toSeq)
  }

  /** What [[stripMp3]] would drop — the audit face. */
  def mp3Report(payload: Array[Byte]): Seq[String] = stripMp3(payload)._2

  /** Build a tagged MP3 payload around fake-but-sync-valid audio
    * frames — the fixture/adversary side of [[stripMp3]]. */
  private[multimodal] def insertMp3Tags(audio: Array[Byte],
                                        id3v2: Option[String],
                                        id3v1: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    id3v2.foreach { text =>
      // one TXXX-ish frame body; content is opaque to the scrub
      val body = s"TPE1${text}".getBytes("ISO-8859-1")
      bos.write('I'); bos.write('D'); bos.write('3')
      bos.write(4); bos.write(0); bos.write(0) // v2.4, no flags
      bos.write((body.length >> 21) & 0x7f)
      bos.write((body.length >> 14) & 0x7f)
      bos.write((body.length >> 7) & 0x7f)
      bos.write(body.length & 0x7f)
      bos.write(body)
    }
    bos.write(audio)
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      val t = "planted title".getBytes("US-ASCII")
      System.arraycopy(t, 0, tag, 3, t.length)
      bos.write(tag)
    }
    bos.toByteArray
  }

  // ---- GIF containers ----

  /** GIF block walk: (kind, offset, totalLen) with kinds HDR (header +
    * logical screen descriptor + global color table), IMG (image
    * descriptor + local color table + LZW data), GCE/APP/COM/TXT
    * extensions, TRL trailer. Malformed containers refuse loudly. */
  private def gifSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(Multimodal.GifCodec.isGif(b), "payload is not a GIF container")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    require(b.length >= 13, "truncated GIF header")
    val packed = b(10) & 0xff
    val gct = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
    out += (("HDR", 0, 13 + gct))
    var off = 13 + gct
    def subBlocks(start: Int): Int = { // bytes consumed incl. terminator
      var o = start
      while ({
        require(o < b.length, s"truncated GIF sub-blocks at $o")
        val len = b(o) & 0xff
        o += 1 + len
        len != 0
      }) ()
      o - start
    }
    var sawTrailer = false
    while (!sawTrailer) {
      require(off < b.length, s"GIF ended without trailer at $off")
      (b(off) & 0xff) match {
        case 0x3b =>
          out += (("TRL", off, 1)); sawTrailer = true
          // bytes after the trailer: viewers stop at 0x3b, so appended
          // data survives any per-block scrub — strip and report
          if (off + 1 < b.length)
            out += (("TRAILING", off + 1, b.length - off - 1))
        case 0x2c =>
          require(off + 10 <= b.length, s"truncated image descriptor at $off")
          val p = b(off + 9) & 0xff
          val lct = if ((p & 0x80) != 0) 3 * (1 << ((p & 7) + 1)) else 0
          val dataStart = off + 10 + lct + 1 // + LZW min-code byte
          val total = dataStart - off + subBlocks(dataStart)
          out += (("IMG", off, total))
          off += total
        case 0x21 =>
          require(off + 2 <= b.length, s"truncated extension at $off")
          val kind = (b(off + 1) & 0xff) match {
            case 0xf9 => "GCE"
            case 0xff => "APP"
            case 0xfe => "COM"
            case 0x01 => "TXT"
            case other => f"EXT$other%02x"
          }
          val total = 2 + subBlocks(off + 2)
          out += ((kind, off, total))
          off += total
        case other =>
          throw new IllegalArgumentException(
            f"unknown GIF block 0x$other%02x at $off")
      }
    }
    out.toSeq
  }

  /** GIF blocks that stay: structure, frames, timing (GCE) and the
    * NETSCAPE looping block (APP). Comment and plain-text extensions —
    * where encoders stash tool/author/source strings — are dropped. */
  private val KeepGif = Set("HDR", "IMG", "GCE", "APP", "TRL")

  /** Strip comment/plain-text extensions from one GIF payload:
    * (scrubbed bytes, dropped kinds). A clean payload returns the
    * original array. */
  def stripGif(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = gifSpans(payload)
    val dropped = spans.filterNot(s => KeepGif(s._1))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = spans.filter(s => KeepGif(s._1))
      val out = new Array[Byte](keep.map(_._3).sum)
      var pos = 0
      keep.foreach { case (_, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  // ---- JPEG (JFIF) containers ----

  def isJpeg(b: Array[Byte]): Boolean =
    b != null && b.length > 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** JPEG marker-segment walk: (kind, offset, totalLen) with kinds SOI,
    * APPn (`APP0`..`APP15`), COM, coding segments (`SEGxx` for DQT/DHT/
    * SOF/DRI/...), SOS (the scan HEADER + its entropy-coded data up to
    * the next real marker — restart markers and byte-stuffed FF00 are
    * part of the scan, progressive multi-scan files keep walking), EOI,
    * and TRAILING for bytes smuggled after EOI (decoders stop there).
    * Malformed streams refuse loudly. */
  private def jpegSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(isJpeg(b), "payload is not a JPEG stream")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    out += (("SOI", 0, 2))
    var off = 2
    var sawEoi = false
    while (!sawEoi) {
      require(off + 2 <= b.length, s"truncated JPEG marker at $off")
      require((b(off) & 0xff) == 0xff, s"lost JPEG marker sync at $off")
      // the spec allows 0xFF fill bytes before any marker — step past
      // them (semantic no-ops; a scrub that drops segments re-tiles
      // without them)
      while (off + 2 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      require(off + 2 <= b.length, s"truncated JPEG marker at $off")
      val marker = b(off + 1) & 0xff
      marker match {
        case 0xd9 =>
          out += (("EOI", off, 2)); sawEoi = true
          if (off + 2 < b.length)
            out += (("TRAILING", off + 2, b.length - off - 2))
        case m if m >= 0xe0 && m <= 0xef => // APPn
          require(off + 4 <= b.length, s"truncated APP segment at $off")
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          require(len >= 2 && off + 2 + len <= b.length,
            s"truncated APP${m - 0xe0} segment at $off")
          out += ((s"APP${m - 0xe0}", off, 2 + len))
          off += 2 + len
        case 0xfe => // COM
          require(off + 4 <= b.length, s"truncated COM segment at $off")
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          require(len >= 2 && off + 2 + len <= b.length,
            s"truncated COM segment at $off")
          out += (("COM", off, 2 + len))
          off += 2 + len
        case 0xda => // SOS: header + entropy data to the next real marker
          require(off + 4 <= b.length, s"truncated SOS header at $off")
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          require(len >= 2 && off + 2 + len <= b.length,
            s"truncated SOS header at $off")
          var p = off + 2 + len
          var done = false
          while (!done) {
            require(p + 1 < b.length, s"JPEG scan ran past the stream at $p")
            if ((b(p) & 0xff) == 0xff) {
              val m2 = b(p + 1) & 0xff
              // 00 = byte-stuffed FF, D0-D7 = restart markers: scan data
              if (m2 != 0 && !(m2 >= 0xd0 && m2 <= 0xd7)) done = true
              else p += 2
            } else p += 1
          }
          out += (("SOS", off, p - off))
          off = p
        case m =>
          // every remaining marker with a length field (DQT/DHT/SOF/DRI
          // /DNL/...) — coding-essential, kept verbatim
          require(off + 4 <= b.length, s"truncated JPEG segment at $off")
          val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          require(len >= 2 && off + 2 + len <= b.length,
            f"truncated JPEG segment 0x$m%02x at $off")
          out += ((f"SEG$m%02x", off, 2 + len))
          off += 2 + len
      }
    }
    out.toSeq
  }

  /** JPEG segments that stay: structure (SOI/EOI), every coding segment
    * (SEGxx: quant/huffman tables, frame headers, restart interval),
    * the scans, JFIF APP0 (density/aspect), APP2 (ICC color profiles)
    * and APP14 (the Adobe color-transform flag — dropping it changes
    * CMYK/YCCK decode colors). Dropped: APP1 (Exif — GPS, device
    * serials, timestamps — and XMP), APP13 (Photoshop/IPTC bylines),
    * every other APPn, COM comments, trailing smuggled bytes. */
  private val KeepJpeg: String => Boolean = k =>
    k == "SOI" || k == "EOI" || k == "SOS" || k.startsWith("SEG") ||
      k == "APP0" || k == "APP2" || k == "APP14"

  /** Strip metadata segments from one JPEG payload: (scrubbed bytes,
    * dropped kinds). The entropy-coded scans are kept byte-identical —
    * decode output is unchanged by construction. A clean payload
    * returns the original array. */
  def stripJpeg(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = jpegSpans(payload)
    val dropped = spans.filterNot(s => KeepJpeg(s._1))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = spans.filter(s => KeepJpeg(s._1))
      val out = new Array[Byte](keep.map(_._3).sum)
      var pos = 0
      keep.foreach { case (_, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  /** Insert an APP1 (Exif-shaped) segment after SOI — the
    * fixture/adversary side of [[stripJpeg]]. */
  private[multimodal] def insertJpegExif(payload: Array[Byte],
                                         text: String): Array[Byte] = {
    require(isJpeg(payload), "payload is not a JPEG stream")
    val body = ("Exif  " + text).getBytes("ISO-8859-1")
    val len = body.length + 2
    val seg = new Array[Byte](4 + body.length)
    seg(0) = 0xff.toByte; seg(1) = 0xe1.toByte
    seg(2) = ((len >> 8) & 0xff).toByte; seg(3) = (len & 0xff).toByte
    System.arraycopy(body, 0, seg, 4, body.length)
    val out = new Array[Byte](payload.length + seg.length)
    System.arraycopy(payload, 0, out, 0, 2)
    System.arraycopy(seg, 0, out, 2, seg.length)
    System.arraycopy(payload, 2, out, 2 + seg.length, payload.length - 2)
    out
  }

  // ---- AVI containers ----

  /** Top-level AVI chunk walk: (id, offset, totalLen incl. pad), LIST
    * chunks keyed as `LIST:<type>`. Bytes beyond the declared RIFF size
    * surface as `TRAILING`, like every walk here. */
  private def aviChunkSpans(b: Array[Byte]): Seq[(String, Int, Int)] = {
    require(AviCodec.isAvi(b), "payload is not a RIFF/AVI container")
    def le32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val riffEnd = math.min(b.length.toLong,
      8L + (le32(4).toLong & 0xffffffffL)).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var off = 12
    while (off + 8 <= riffEnd) {
      val id = new String(b, off, 4, "US-ASCII")
      val len = le32(off + 4)
      require(len >= 0, s"negative AVI chunk length at $off")
      // Long bounds: a crafted length near Int.MaxValue must hit this
      // refusal, not wrap the offset negative (untrusted crawl bytes)
      val end = off.toLong + 8L + len
      require(end <= b.length, s"truncated $id chunk at $off")
      val key =
        if (id == "LIST" && off + 12 <= b.length)
          s"LIST:${new String(b, off + 8, 4, "US-ASCII")}"
        else id
      val total = (end + (len & 1) min b.length.toLong).toInt - off
      out += ((key, off, total))
      off += total
    }
    if (off < b.length) out += (("TRAILING", off, b.length - off))
    out.toSeq
  }

  /** AVI chunks that stay: the header list (`hdrl`), the frame data
    * (`movi`), the seek index (`idx1`) and the OpenDML extension list
    * (`odml`). `LIST INFO` blocks (IART/ISFT/ICMT... — where encoders
    * stash author/tool/location strings), `JUNK` padding (a classic
    * smuggling spot: players skip it unread) and unknown chunks are
    * dropped. idx1 entry offsets come in TWO conventions in the wild —
    * movi-relative (common encoders, [[AviCodec.writeMjpeg]]) and
    * file-absolute (another real encoder class; players sniff which):
    * [[stripAvi]] detects the convention by checking which
    * interpretation of the first entry actually lands on its chunk id,
    * rewrites absolute offsets when bytes before `movi` were removed,
    * and DROPS an idx1 whose convention it cannot verify — a silently
    * corrupt seek index is worse for external players than none. */
  private val KeepAvi = Set("LIST:hdrl", "LIST:movi", "LIST:odml", "idx1")

  /** Strip metadata chunks from one AVI payload: (scrubbed bytes,
    * dropped keys), RIFF size rewritten, idx1 offsets kept valid (see
    * [[KeepAvi]]'s convention note). A clean payload returns the
    * original array. */
  def stripAvi(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val spans = aviChunkSpans(payload)
    val dropped0 = spans.filterNot(s => KeepAvi(s._1))
    if (dropped0.isEmpty) (payload, Nil)
    else {
      def le32(o: Int): Int = (payload(o) & 0xff) |
        ((payload(o + 1) & 0xff) << 8) | ((payload(o + 2) & 0xff) << 16) |
        ((payload(o + 3) & 0xff) << 24)
      val moviOff = spans.collectFirst { case ("LIST:movi", o, _) => o }
      // bytes removed BEFORE movi shift every in-movi position; only a
      // FILE-ABSOLUTE index needs its entries rebased by that delta
      val deltaBeforeMovi = moviOff.fold(0)(m =>
        dropped0.filter(_._2 < m).map(_._3).sum)
      // detect the idx1 offset convention by dereferencing entry 0:
      // whichever interpretation lands on the entry's own chunk id wins
      sealed trait IdxFate
      case object KeepAsIs extends IdxFate
      case class Rebase(delta: Int) extends IdxFate
      case object Drop extends IdxFate
      val idxFate = spans.collectFirst { case ("idx1", o, t) => (o, t) }
        .fold[IdxFate](KeepAsIs) { case (idxOff, idxTotal) =>
          if (idxTotal < 8 + 16) KeepAsIs // empty index points nowhere
          else {
            val ckid = new String(payload, idxOff + 8, 4, "US-ASCII")
            val entryOff = le32(idxOff + 16)
            def idAt(p: Long): Boolean = p >= 0 && p + 4 <= payload.length &&
              new String(payload, p.toInt, 4, "US-ASCII") == ckid
            val moviFourcc = moviOff.fold(-1L)(_.toLong + 8L)
            if (moviFourcc >= 0 && idAt(moviFourcc + entryOff)) KeepAsIs
            else if (idAt(entryOff.toLong)) {
              if (deltaBeforeMovi == 0) KeepAsIs
              else Rebase(deltaBeforeMovi)
            } else Drop
          }
        }
      val keep0 = spans.filter(s => KeepAvi(s._1))
      val keep = idxFate match {
        case Drop => keep0.filterNot(_._1 == "idx1")
        case _ => keep0
      }
      val dropped = idxFate match {
        case Drop => dropped0 ++ spans.filter(_._1 == "idx1")
        case _ => dropped0
      }
      val body = keep.map(_._3).sum
      val out = new Array[Byte](12 + body)
      System.arraycopy(payload, 0, out, 0, 12)
      val riffSize = 4 + body
      out(4) = (riffSize & 0xff).toByte
      out(5) = ((riffSize >> 8) & 0xff).toByte
      out(6) = ((riffSize >> 16) & 0xff).toByte
      out(7) = ((riffSize >> 24) & 0xff).toByte
      var pos = 12
      keep.foreach { case (key, off, total) =>
        System.arraycopy(payload, off, out, pos, total)
        (idxFate, key) match {
          case (Rebase(delta), "idx1") =>
            // rewrite each entry's dwChunkOffset (entry layout: ckid,
            // flags, offset, size — 16 bytes) down by the removed span
            var e = pos + 8
            while (e + 16 <= pos + total) {
              val old = (out(e + 8) & 0xff) | ((out(e + 9) & 0xff) << 8) |
                ((out(e + 10) & 0xff) << 16) | ((out(e + 11) & 0xff) << 24)
              val nw = old - delta
              out(e + 8) = (nw & 0xff).toByte
              out(e + 9) = ((nw >> 8) & 0xff).toByte
              out(e + 10) = ((nw >> 16) & 0xff).toByte
              out(e + 11) = ((nw >> 24) & 0xff).toByte
              e += 16
            }
          case _ =>
        }
        pos += total
      }
      (out, dropped.map(_._1))
    }
  }

  /** Insert a LIST/INFO block (ISFT software tag) after the header list —
    * the fixture/adversary side of [[stripAvi]]. */
  private[multimodal] def insertAviInfo(payload: Array[Byte],
                                        comment: String): Array[Byte] = {
    val spans = aviChunkSpans(payload)
    val (_, hdrlOff, hdrlTotal) = spans.find(_._1 == "LIST:hdrl").get
    val insertAt = hdrlOff + hdrlTotal
    val text = comment.getBytes("US-ASCII")
    val textPadded = text.length + (text.length & 1)
    val listBody = 4 + 8 + textPadded
    val chunk = new Array[Byte](8 + listBody)
    System.arraycopy("LIST".getBytes("US-ASCII"), 0, chunk, 0, 4)
    chunk(4) = (listBody & 0xff).toByte
    chunk(5) = ((listBody >> 8) & 0xff).toByte
    chunk(6) = ((listBody >> 16) & 0xff).toByte
    chunk(7) = ((listBody >> 24) & 0xff).toByte
    System.arraycopy("INFO".getBytes("US-ASCII"), 0, chunk, 8, 4)
    System.arraycopy("ISFT".getBytes("US-ASCII"), 0, chunk, 12, 4)
    chunk(16) = (text.length & 0xff).toByte
    chunk(17) = ((text.length >> 8) & 0xff).toByte
    chunk(18) = ((text.length >> 16) & 0xff).toByte
    chunk(19) = ((text.length >> 24) & 0xff).toByte
    System.arraycopy(text, 0, chunk, 20, text.length)
    val out = new Array[Byte](payload.length + chunk.length)
    System.arraycopy(payload, 0, out, 0, insertAt)
    System.arraycopy(chunk, 0, out, insertAt, chunk.length)
    System.arraycopy(payload, insertAt, out, insertAt + chunk.length,
      payload.length - insertAt)
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    out
  }

  /** Scrub a media table: PNG, JPEG, WAV, WebP, GIF, AVI and mp4
    * payloads lose their metadata chunks, everything else passes
    * through byte-untouched. Map-only, zero decodes; output keeps the
    * media schema. */
  def scrub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      val stripped =
        if (isPng(r.payload)) Some(stripPng(r.payload))
        else if (isJpeg(r.payload)) Some(stripJpeg(r.payload))
        else if (isRiffWave(r.payload)) Some(stripWav(r.payload))
        else if (isRiffWebp(r.payload)) Some(stripWebp(r.payload))
        else if (AviCodec.isAvi(r.payload)) Some(stripAvi(r.payload))
        else if (Mp4Codec.isMp4(r.payload)) Some(Mp4Codec.strip(r.payload))
        else if (MkvCodec.isMkv(r.payload)) Some(MkvCodec.strip(r.payload))
        else if (Flac.isFlac(r.payload)) Some(Flac.stripMeta(r.payload))
        else if (Tiff.isTiff(r.payload)) Some(Tiff.strip(r.payload))
        else if (isMp3(r.payload)) Some(stripMp3(r.payload))
        else if (Multimodal.GifCodec.isGif(r.payload))
          Some(stripGif(r.payload))
        else None
      stripped match {
        case Some((clean, dropped)) if dropped.nonEmpty =>
          r.copy(payload = clean)
        case _ => r
      }
    }).toDF()
  }

  /** The scrub audit: (media_id, n_stripped, stripped_types,
    * had_metadata) per record — what a compliance run reports (and the
    * gate a strict ingest refuses on instead of scrubbing). PNG, WAV,
    * AVI, mp4 and GIF containers are walked (including trailing-byte
    * smuggling); container formats without a scrubber report 0
    * stripped. */
  def scrubReport(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      val dropped =
        if (isPng(r.payload))
          chunkSpans(r.payload).map(_._1).filterNot(Keep)
        else if (isJpeg(r.payload))
          jpegSpans(r.payload).map(_._1).filterNot(s => KeepJpeg(s))
        else if (isRiffWave(r.payload))
          wavChunkSpans(r.payload).map(_._1).filterNot(KeepWav)
        else if (isRiffWebp(r.payload))
          webpChunkSpans(r.payload).map(_._1).filterNot(KeepWebp)
        else if (AviCodec.isAvi(r.payload))
          aviChunkSpans(r.payload).map(_._1).filterNot(KeepAvi)
        else if (Mp4Codec.isMp4(r.payload))
          Mp4Codec.wipeReport(r.payload)
        else if (MkvCodec.isMkv(r.payload))
          MkvCodec.wipeReport(r.payload)
        else if (Flac.isFlac(r.payload))
          Flac.metaReport(r.payload)
        else if (Tiff.isTiff(r.payload))
          Tiff.wipeReport(r.payload)
        else if (isMp3(r.payload))
          mp3Report(r.payload)
        else if (Multimodal.GifCodec.isGif(r.payload))
          gifSpans(r.payload).map(_._1).filterNot(KeepGif)
        else Nil
      (r.media_id, dropped.length, dropped.sorted.distinct)
    }).toDF("media_id", "n_stripped", "stripped_types")
      .withColumn("had_metadata", col("n_stripped") > 0)
  }

  /** Insert a comment extension before the GIF trailer — the
    * fixture/adversary side of [[stripGif]]. */
  private[multimodal] def insertGifComment(payload: Array[Byte],
                                           comment: String): Array[Byte] = {
    val spans = gifSpans(payload)
    val (_, trlOff, _) = spans.find(_._1 == "TRL").get
    val text = comment.getBytes("US-ASCII")
    require(text.length <= 255, "one sub-block: comment must fit 255 bytes")
    val chunk = new Array[Byte](2 + 1 + text.length + 1)
    chunk(0) = 0x21.toByte
    chunk(1) = 0xfe.toByte
    chunk(2) = text.length.toByte
    System.arraycopy(text, 0, chunk, 3, text.length)
    chunk(chunk.length - 1) = 0 // sub-block terminator
    val out = new Array[Byte](payload.length + chunk.length)
    System.arraycopy(payload, 0, out, 0, trlOff)
    System.arraycopy(chunk, 0, out, trlOff, chunk.length)
    System.arraycopy(payload, trlOff, out, trlOff + chunk.length,
      payload.length - trlOff)
    out
  }

  /** Insert a LIST/INFO comment chunk at the RIFF tail — the
    * fixture/adversary side of [[stripWav]]. */
  private[multimodal] def insertWavInfo(payload: Array[Byte],
                                        comment: String): Array[Byte] = {
    require(isRiffWave(payload), "payload is not a RIFF/WAVE container")
    val text = comment.getBytes("US-ASCII")
    val textPadded = text.length + (text.length & 1)
    // LIST chunk: "INFO" + ICMT subchunk
    val listBody = 4 + 8 + textPadded
    val chunk = new Array[Byte](8 + listBody)
    System.arraycopy("LIST".getBytes("US-ASCII"), 0, chunk, 0, 4)
    chunk(4) = (listBody & 0xff).toByte
    chunk(5) = ((listBody >> 8) & 0xff).toByte
    chunk(6) = ((listBody >> 16) & 0xff).toByte
    chunk(7) = ((listBody >> 24) & 0xff).toByte
    System.arraycopy("INFO".getBytes("US-ASCII"), 0, chunk, 8, 4)
    System.arraycopy("ICMT".getBytes("US-ASCII"), 0, chunk, 12, 4)
    chunk(16) = (text.length & 0xff).toByte
    chunk(17) = ((text.length >> 8) & 0xff).toByte
    chunk(18) = ((text.length >> 16) & 0xff).toByte
    chunk(19) = ((text.length >> 24) & 0xff).toByte
    System.arraycopy(text, 0, chunk, 20, text.length)
    val out = new Array[Byte](payload.length + chunk.length)
    System.arraycopy(payload, 0, out, 0, payload.length)
    System.arraycopy(chunk, 0, out, payload.length, chunk.length)
    val riffSize = out.length - 8
    out(4) = (riffSize & 0xff).toByte
    out(5) = ((riffSize >> 8) & 0xff).toByte
    out(6) = ((riffSize >> 16) & 0xff).toByte
    out(7) = ((riffSize >> 24) & 0xff).toByte
    out
  }

  /** Insert a tEXt chunk before IEND — the fixture/adversary side of
    * [[stripPng]] (also how a provenance stamp WOULD be written). */
  private[multimodal] def insertPngText(payload: Array[Byte], key: String,
                                        value: String): Array[Byte] = {
    val spans = chunkSpans(payload)
    val (_, endOff, _) = spans.find(_._1 == "IEND").get
    val data = (key + "\u0000" + value).getBytes("ISO-8859-1")
    val chunk = new Array[Byte](12 + data.length)
    chunk(0) = ((data.length >> 24) & 0xff).toByte
    chunk(1) = ((data.length >> 16) & 0xff).toByte
    chunk(2) = ((data.length >> 8) & 0xff).toByte
    chunk(3) = (data.length & 0xff).toByte
    System.arraycopy("tEXt".getBytes("US-ASCII"), 0, chunk, 4, 4)
    System.arraycopy(data, 0, chunk, 8, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(chunk, 4, 4 + data.length)
    val c = crc.getValue
    chunk(8 + data.length) = ((c >> 24) & 0xff).toByte
    chunk(9 + data.length) = ((c >> 16) & 0xff).toByte
    chunk(10 + data.length) = ((c >> 8) & 0xff).toByte
    chunk(11 + data.length) = (c & 0xff).toByte
    val out = new Array[Byte](payload.length + chunk.length)
    System.arraycopy(payload, 0, out, 0, endOff)
    System.arraycopy(chunk, 0, out, endOff, chunk.length)
    System.arraycopy(payload, endOff, out, endOff + chunk.length,
      payload.length - endOff)
    out
  }
}
