package graft.multimodal

/** ISO-BMFF (mp4/m4a/mov) container support with ZERO new dependencies
  * — the AVI playbook applied to the dominant crawl container. The box
  * grammar ([size: u32 BE][type: 4cc][payload...]; size 1 = u64
  * largesize follows, size 0 = box extends to the end; container boxes
  * nest) parses in a stock JVM, which buys the two passes that need NO
  * codec at all:
  *
  *  - METADATA SCRUBBING: `udta` (where encoders stash `©xyz` GPS
  *    coordinates, `©too` tool tags, Apple `ilst` comment atoms via
  *    `meta`), standalone `meta`, vendor `uuid` boxes and dirty
  *    `free`/`skip`/`wide` padding. Unlike RIFF, the boxes are WIPED IN
  *    PLACE (type rewritten to `free`, payload zeroed) instead of
  *    removed: `stco`/`co64` chunk offsets inside `moov` are
  *    FILE-ABSOLUTE, so deleting any byte before `mdat` would corrupt
  *    every sample pointer in the file. Wiping destroys the metadata
  *    without moving a byte. Bytes smuggled after the last top-level
  *    box strip as a `TRAILING` pseudo-box — but only when `ftyp`,
  *    `moov` and `mdat` all parsed complete (an unreachable tail);
  *    otherwise the container is truncated and refuses loudly.
  *
  *  - PCM SOUNDTRACK DEMUX: the `moov/trak/mdia/minf/stbl` sample-table
  *    walk (`stsd` typed `sowt`/`twos`/`raw ` PCM, `stsc` sample-to-
  *    chunk, `stsz` sizes, `stco`/`co64` chunk offsets) concatenates
  *    the raw sample bytes out of `mdat` — zero video decode, the
  *    mp4 face of [[AviCodec.extractAudio]]. Compressed soundtracks
  *    (`mp4a` AAC etc.) refuse loudly rather than emit garbage.
  *
  * VIDEO frames stay the honest refusal seam: H.264/VP9 need a codec
  * the JDK lacks ([[VideoCodec.withFrames]] documents it).
  *
  * Reference scope: the reference is a data-integration framework with
  * no media code at all; both the grammar and every field layout here
  * come from the public ISO/IEC 14496-12 specification.
  */
private[multimodal] object Mp4Codec {

  ImageIoTuning.init // memory-cached ImageIO streams for the JPEG frames


  /** `ftyp` at offset 4 — every ISO-BMFF file leads with it. */
  def isMp4(b: Array[Byte]): Boolean =
    b != null && b.length > 12 &&
      b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String = {
    // © in Apple atoms is byte 0xA9 — decode as ISO-8859-1 so the
    // fourcc round-trips
    new String(b, o, 4, "ISO-8859-1")
  }

  /** One parsed box: type, offset of its header, total length
    * (header + payload), and the offset where its PAYLOAD starts
    * (8 for compact sizes, 16 after a largesize). */
  final case class Box(tpe: String, off: Int, total: Int, payloadOff: Int)

  /** Walk one level of boxes over [from, to). Malformed sizes refuse
    * loudly — all arithmetic in Long, untrusted crawl bytes. When
    * `allowTrailing` (top level only) an unparseable TAIL surfaces as a
    * `TRAILING` pseudo-box INSTEAD of a refusal — the caller decides
    * whether the structural boxes are complete enough for that to be
    * safe. */
  private def walk(b: Array[Byte], from: Int, to: Int,
                   allowTrailing: Boolean = false): Seq[Box] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Box]
    var off = from
    var bad = -1 // first offset that failed to parse
    while (off < to && bad < 0) {
      if (off + 8 > to) bad = off
      else {
        val size32 = be32(b, off)
        if (size32 == 1L && off + 16 > to) bad = off
        else {
          val (total, payloadOff) =
            if (size32 == 0L) ((to - off).toLong, 8)
            else if (size32 == 1L) (be64(b, off + 8), 16)
            else (size32, 8)
          if (total < payloadOff || total > to.toLong - off) bad = off
          else {
            out += Box(fourcc(b, off + 4), off, total.toInt, payloadOff)
            off += total.toInt
          }
        }
      }
    }
    if (bad >= 0) {
      require(allowTrailing,
        s"malformed ISO-BMFF box at $bad (size overruns the container)")
      out += Box("TRAILING", bad, to - bad, 0)
    }
    out.toSeq
  }

  /** Top-level boxes, trailing bytes allowed ONLY past complete
    * structural boxes (ftyp + moov + mdat all parsed whole) — a
    * truncated mdat must refuse, not silently reclassify as trailing. */
  private[multimodal] def topBoxes(b: Array[Byte]): Seq[Box] = {
    require(isMp4(b), "payload is not an ISO-BMFF (mp4) container")
    val boxes = walk(b, 0, b.length, allowTrailing = true)
    if (boxes.exists(_.tpe == "TRAILING")) {
      val seen = boxes.map(_.tpe).toSet
      require(Seq("ftyp", "moov", "mdat").forall(seen),
        "malformed ISO-BMFF container: unparseable bytes before the " +
          "structural boxes completed (truncated, not trailing)")
    }
    boxes
  }

  private def children(b: Array[Byte], box: Box): Seq[Box] =
    walk(b, box.off + box.payloadOff, box.off + box.total)

  // ---- metadata scrub ----

  /** Box types that are pure metadata wherever they appear at the
    * walked levels (top, moov, trak): user data (`udta` — GPS, tool
    * tags, Apple ilst), standalone `meta`, vendor `uuid`. */
  private val WipeAlways = Set("udta", "meta", "uuid")

  /** Padding types that are CLEAN when all-zero and a smuggling spot
    * when not ("free atoms" carry whatever the encoder left there). */
  private val PaddingTypes = Set("free", "skip", "wide")

  private def hasNonZeroPayload(b: Array[Byte], box: Box): Boolean = {
    var i = box.off + box.payloadOff
    val end = box.off + box.total
    while (i < end) {
      if (b(i) != 0) return true
      i += 1
    }
    false
  }

  /** The wipe plan: every box (at top level, inside moov, inside each
    * trak) that carries metadata — plus the TRAILING pseudo-box. */
  private def wipeTargets(b: Array[Byte]): Seq[Box] = {
    val top = topBoxes(b)
    def targetsIn(boxes: Seq[Box]): Seq[Box] = boxes.flatMap { box =>
      if (WipeAlways(box.tpe)) Seq(box)
      else if (PaddingTypes(box.tpe) && hasNonZeroPayload(b, box)) Seq(box)
      else if (box.tpe == "moov" || box.tpe == "trak")
        targetsIn(children(b, box))
      else Nil
    }
    targetsIn(top) ++ top.filter(_.tpe == "TRAILING")
  }

  /** Strip metadata from one mp4 payload: (scrubbed bytes, wiped box
    * types). Metadata boxes are wiped IN PLACE (type -> `free`, payload
    * zeroed — stco's absolute offsets stay valid because no byte
    * moves); trailing bytes are removed. A clean payload returns the
    * ORIGINAL array (reference equality — zero copies on the common
    * path). Idempotent: a wiped box is an all-zero `free`, which is
    * clean by definition. */
  def strip(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val targets = wipeTargets(payload)
    if (targets.isEmpty) (payload, Nil)
    else {
      val keepLen = targets.collectFirst {
        case Box("TRAILING", off, _, _) => off
      }.getOrElse(payload.length)
      val out = java.util.Arrays.copyOf(payload, keepLen)
      targets.filter(_.tpe != "TRAILING").foreach { box =>
        out(box.off + 4) = 'f'; out(box.off + 5) = 'r'
        out(box.off + 6) = 'e'; out(box.off + 7) = 'e'
        java.util.Arrays.fill(out, box.off + box.payloadOff,
          box.off + box.total, 0.toByte)
      }
      (out, targets.map(_.tpe))
    }
  }

  /** Report-only face of [[strip]]: the wiped box types, no copy. */
  def wipeReport(payload: Array[Byte]): Seq[String] =
    wipeTargets(payload).map(_.tpe)

  // ---- sample-table walk (shared by audio demux and video decode) ----

  /** Bounds-checked field read guard: reading `need` bytes at relative
    * offset `at` inside `box` must stay inside the box — these are
    * untrusted crawl bytes, so a truncated table refuses loudly instead
    * of reading the neighboring box (or past the array). */
  private def inBox(box: Box, at: Int, need: Int): Unit =
    require(box.payloadOff + at + need <= box.total,
      s"${box.tpe} box too short (${box.total} bytes) for a field at " +
        s"payload offset $at — truncated table")

  /** Resolve a trak's handler type (`soun`/`vide`/...) from mdia/hdlr. */
  private def handlerOf(payload: Array[Byte], trak: Box): Option[String] =
    for {
      mdia <- children(payload, trak).find(_.tpe == "mdia")
      hdlr <- children(payload, mdia).find(_.tpe == "hdlr")
      // hdlr payload: version/flags(4) + pre_defined(4) + handler(4)
      _ = inBox(hdlr, 8, 4)
    } yield fourcc(payload, hdlr.off + hdlr.payloadOff + 8)

  /** The trak's mdhd timescale (ticks per second of its stts deltas).
    * mdhd version 0 carries 32-bit times (timescale at payload offset
    * 12); version 1 widens creation/modification to 64-bit (timescale
    * at offset 20) — modern muxers write either. */
  private def timescaleOf(payload: Array[Byte], trak: Box): Long =
    (for {
      mdia <- children(payload, trak).find(_.tpe == "mdia")
      mdhd <- children(payload, mdia).find(_.tpe == "mdhd")
    } yield {
      inBox(mdhd, 0, 4)
      val version = payload(mdhd.off + mdhd.payloadOff) & 0xff
      val at = version match {
        case 0 => 12 // vf(4) cre(4) mod(4) timescale(4)
        case 1 => 20 // vf(4) cre(8) mod(8) timescale(4)
        case v => throw new IllegalArgumentException(
          s"mdhd version $v unknown — refusing rather than misread " +
            "the timescale")
      }
      inBox(mdhd, at, 4)
      be32(payload, mdhd.off + mdhd.payloadOff + at)
    }).getOrElse(throw new IllegalArgumentException(
      "trak has no mdhd — timescale unknown"))

  private def stblOf(payload: Array[Byte], trak: Box): Box =
    (for {
      mdia <- children(payload, trak).find(_.tpe == "mdia")
      minf <- children(payload, mdia).find(_.tpe == "minf")
      stbl <- children(payload, minf).find(_.tpe == "stbl")
    } yield stbl).getOrElse(throw new IllegalArgumentException(
      "trak has no stbl sample table"))

  /** Per-sample (offset, size) spans in sample order, resolved from the
    * stsc sample-to-chunk runs, stsz sizes and stco/co64 chunk offsets.
    * Every span is bounds-checked against the container — corrupt
    * tables refuse loudly. */
  private def sampleSpans(payload: Array[Byte],
                          stbl: Box): Array[(Long, Long)] = {
    val tables = children(payload, stbl)
    def table(t: String): Box = tables.find(_.tpe == t).getOrElse(
      throw new IllegalArgumentException(s"stbl has no $t box"))
    val stsz = table("stsz")
    val szOff = stsz.off + stsz.payloadOff
    inBox(stsz, 0, 12)
    val constSize = be32(payload, szOff + 4)
    val sampleCount = be32(payload, szOff + 8).toInt
    require(sampleCount >= 0, s"stsz sample count $sampleCount negative")
    if (constSize == 0L) inBox(stsz, 12, 4 * sampleCount)
    def sampleSize(i: Int): Long =
      if (constSize != 0L) constSize else be32(payload, szOff + 12 + 4 * i)
    val stsc = table("stsc")
    val scOff = stsc.off + stsc.payloadOff
    inBox(stsc, 0, 8)
    val scCount = be32(payload, scOff + 4).toInt
    require(scCount >= 0, s"stsc entry count $scCount negative")
    inBox(stsc, 8, 12 * scCount)
    val runs = (0 until scCount).map { i =>
      (be32(payload, scOff + 8 + 12 * i).toInt,        // first_chunk (1-based)
        be32(payload, scOff + 8 + 12 * i + 4).toInt)   // samples_per_chunk
    }
    val (chunkCount, chunkOffset) = tables.find(_.tpe == "stco") match {
      case Some(stco) =>
        val o = stco.off + stco.payloadOff
        inBox(stco, 0, 8)
        val n = be32(payload, o + 4).toInt
        require(n >= 0, s"stco chunk count $n negative")
        inBox(stco, 8, 4 * n)
        (n, (i: Int) => be32(payload, o + 8 + 4 * i))
      case None =>
        val co64 = table("co64")
        val o = co64.off + co64.payloadOff
        inBox(co64, 0, 8)
        val n = be32(payload, o + 4).toInt
        require(n >= 0, s"co64 chunk count $n negative")
        inBox(co64, 8, 8 * n)
        (n, (i: Int) => be64(payload, o + 8 + 8 * i))
    }
    def samplesInChunk(c: Int): Int =
      runs.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0)
    val spans = new Array[(Long, Long)](sampleCount)
    var sample = 0
    var c = 1
    while (c <= chunkCount && sample < sampleCount) {
      var off = chunkOffset(c - 1)
      var i = 0
      val inChunk = samplesInChunk(c)
      while (i < inChunk && sample < sampleCount) {
        val len = sampleSize(sample)
        require(off >= 0 && off + len <= payload.length,
          s"sample $sample of chunk $c points past the container " +
            s"(offset $off, length $len) — corrupt sample table")
        spans(sample) = (off, len)
        off += len
        i += 1
        sample += 1
      }
      c += 1
    }
    require(sample == sampleCount,
      s"sample table declares $sampleCount samples but chunks cover " +
        s"$sample — corrupt stsc/stco")
    spans
  }

  /** Per-sample durations in MICROSECONDS from the stts run-length
    * table, converted through the trak's mdhd timescale. */
  private def sampleDurationsUs(payload: Array[Byte], stbl: Box,
                                timescale: Long,
                                sampleCount: Int): Array[Long] = {
    require(timescale > 0, s"mdhd timescale $timescale must be positive")
    val stts = children(payload, stbl).find(_.tpe == "stts").getOrElse(
      throw new IllegalArgumentException("stbl has no stts box"))
    val o = stts.off + stts.payloadOff
    inBox(stts, 0, 8)
    val entryCount = be32(payload, o + 4).toInt
    require(entryCount >= 0, s"stts entry count $entryCount negative")
    inBox(stts, 8, 8 * entryCount)
    val out = new Array[Long](sampleCount)
    var s = 0
    var e = 0
    while (e < entryCount && s < sampleCount) {
      val count = be32(payload, o + 8 + 8 * e).toInt
      val delta = be32(payload, o + 8 + 8 * e + 4)
      var i = 0
      while (i < count && s < sampleCount) {
        out(s) = delta * 1000000L / timescale
        s += 1
        i += 1
      }
      e += 1
    }
    require(s == sampleCount,
      s"stts covers $s samples but the table declares $sampleCount — " +
        "corrupt timing table")
    out
  }

  // ---- PCM audio demux ----

  /** DEMUX the PCM soundtrack: find the single `soun` track, read its
    * `stsd` sample entry (PCM formats `sowt` LE16 / `twos` BE16 /
    * `raw ` unsigned 8-bit; compressed formats refuse loudly), then
    * concatenate its chunks from `stco`/`co64` + `stsc` + `stsz`.
    * Returns None when the container carries no audio track; the
    * returned pcm bytes are normalized to LITTLE-endian order
    * (`twos` byte-swaps) so [[AviCodec.toMono16]] consumes them
    * directly. */
  def extractAudio(payload: Array[Byte]): Option[AviCodec.AviAudio] = {
    val top = topBoxes(payload)
    val moov = top.find(_.tpe == "moov").getOrElse(
      throw new IllegalArgumentException(
        "ISO-BMFF container has no moov box — no sample tables"))
    val traks = children(payload, moov).filter(_.tpe == "trak")
    val sounTraks = traks.filter(t =>
      handlerOf(payload, t).contains("soun"))
    if (sounTraks.isEmpty) return None
    require(sounTraks.size == 1,
      s"ISO-BMFF container declares ${sounTraks.size} soun tracks — " +
        "interleaving them would corrupt the sample stream; refusing " +
        "loudly")
    val stbl = stblOf(payload, sounTraks.head)
    // stsd: FullBox, entry_count, then sample entries
    val stsd = children(payload, stbl).find(_.tpe == "stsd").getOrElse(
      throw new IllegalArgumentException("soun track stbl has no stsd box"))
    inBox(stsd, 0, 8)
    val entryCount = be32(payload, stsd.off + stsd.payloadOff + 4)
    require(entryCount == 1L,
      s"stsd declares $entryCount sample descriptions — mixed-format " +
        "tracks are out of demux scope; refusing loudly")
    inBox(stsd, 8, 36) // one full AudioSampleEntry
    val entry = stsd.off + stsd.payloadOff + 8
    val format = fourcc(payload, entry + 4)
    require(format == "sowt" || format == "twos" || format == "raw " ||
      format == "alaw" || format == "ulaw",
      s"audio sample entry is '$format' — raw PCM (sowt/twos/raw ) " +
        "demuxes verbatim and G.711 (alaw/ulaw) expands by table " +
        "arithmetic; compressed soundtracks refuse loudly rather than " +
        "emit garbage samples")
    val channels = (be32(payload, entry + 24) >> 16).toInt
    val sampleBits = (be32(payload, entry + 24) & 0xffff).toInt
    val rate = (be32(payload, entry + 32) >> 16).toInt
    val bits =
      if (format == "raw " || format == "alaw" || format == "ulaw") 8
      else sampleBits
    val spans = sampleSpans(payload, stbl)
    val out = new java.io.ByteArrayOutputStream()
    spans.foreach { case (off, len) =>
      out.write(payload, off.toInt, len.toInt)
    }
    val pcm = out.toByteArray
    // normalize twos (big-endian 16-bit) to the little-endian norm
    if (format == "twos" && bits == 16) {
      var i = 0
      while (i + 1 < pcm.length) {
        val t = pcm(i); pcm(i) = pcm(i + 1); pcm(i + 1) = t
        i += 2
      }
    }
    // G.711 expands to linear 16-bit here — one PCM norm downstream
    if (format == "alaw" || format == "ulaw")
      Some(AviCodec.AviAudio(
        G711.expand(pcm, alaw = format == "alaw"), channels, rate, 16))
    else Some(AviCodec.AviAudio(pcm, channels, rate, bits))
  }

  // ---- MJPEG video decode ----

  /** A parsed MJPEG-in-mp4 video track: per-frame JPEG spans (decode is
    * lazy, per frame) plus per-frame stts-derived timing in µs and the
    * sample-entry header dims. */
  final class Mp4Frames(payload: Array[Byte],
                        frameSpans: Array[(Long, Long)],
                        val frameDelaysUs: Array[Long],
                        val width: Int, val height: Int) {
    def numFrames: Int = frameSpans.length
    def frame(i: Int): java.awt.image.BufferedImage = {
      val (off, len) = frameSpans(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, off.toInt, len.toInt))
      require(img != null, s"mp4 video sample $i is not a decodable JPEG")
      img
    }
  }

  /** Whether the container carries a DECODABLE (MJPEG `jpeg`-typed)
    * video track — the [[VideoCodec.isVideo]] predicate for mp4: an
    * avc1/hev1/vp09 mp4 answers false (no JDK codec), so every video
    * face refuses it loudly rather than decoding garbage. Malformed
    * containers also answer false (the face's decode path reports the
    * real refusal). */
  def hasMjpegVideo(b: Array[Byte]): Boolean =
    isMp4(b) && (try videoFormat(b).contains("jpeg")
    catch { case _: IllegalArgumentException => false })

  /** The single vide trak's stsd sample-entry fourcc, if any. */
  private def videoFormat(payload: Array[Byte]): Option[String] = {
    val top = topBoxes(payload)
    val moov = top.find(_.tpe == "moov").getOrElse(return None)
    val videTraks = children(payload, moov).filter(_.tpe == "trak")
      .filter(t => handlerOf(payload, t).contains("vide"))
    if (videTraks.isEmpty) return None
    require(videTraks.size == 1,
      s"ISO-BMFF container declares ${videTraks.size} vide tracks — " +
        "interleaving them would corrupt the frame sequence; refusing " +
        "loudly")
    val stsd = children(payload, stblOf(payload, videTraks.head))
      .find(_.tpe == "stsd").getOrElse(
        throw new IllegalArgumentException(
          "vide track stbl has no stsd box"))
    inBox(stsd, 8, 8) // entry header (size + format)
    Some(fourcc(payload, stsd.off + stsd.payloadOff + 8 + 4))
  }

  /** Open the MJPEG video track: per-frame JPEG spans from the sample
    * tables, per-frame µs timing from stts through the mdhd timescale —
    * mp4 is a natively VFR container (stts runs), so the timing chain
    * is per-frame like GIF's, at µs precision like AVI's. Compressed
    * video formats refuse loudly with the codec-seam message. */
  def openVideo(payload: Array[Byte]): Mp4Frames = {
    val fmt = videoFormat(payload).getOrElse(
      throw new IllegalArgumentException(
        "ISO-BMFF container has no video track"))
    require(fmt == "jpeg",
      s"mp4 video sample entry is '$fmt' — only MJPEG ('jpeg') decodes " +
        "in a stock JVM; avc1/hev1/vp09 need a codec the JDK lacks")
    val top = topBoxes(payload)
    val moov = top.find(_.tpe == "moov").get
    val trak = children(payload, moov).filter(_.tpe == "trak")
      .find(t => handlerOf(payload, t).contains("vide")).get
    val stbl = stblOf(payload, trak)
    val stsd = children(payload, stbl).find(_.tpe == "stsd").get
    inBox(stsd, 8, 36) // through the dims fields of a VisualSampleEntry
    val entry = stsd.off + stsd.payloadOff + 8
    // VisualSampleEntry: ... pre_defined(2) reserved(2) pre_defined(12)
    // then width(2) height(2) at entry offsets 32/34
    val w = ((payload(entry + 32) & 0xff) << 8) | (payload(entry + 33) & 0xff)
    val h = ((payload(entry + 34) & 0xff) << 8) | (payload(entry + 35) & 0xff)
    val spans = sampleSpans(payload, stbl)
    require(spans.nonEmpty, "mp4 video track holds no frames")
    val delays = sampleDurationsUs(payload, stbl,
      timescaleOf(payload, trak), spans.length)
    new Mp4Frames(payload, spans, delays, w, h)
  }

  // ---- fixture/producer side ----

  private def boxBytes(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val len = 8 + parts.map(_.length).sum
    val out = new Array[Byte](len)
    out(0) = ((len >> 24) & 0xff).toByte
    out(1) = ((len >> 16) & 0xff).toByte
    out(2) = ((len >> 8) & 0xff).toByte
    out(3) = (len & 0xff).toByte
    val t = tpe.getBytes("ISO-8859-1")
    System.arraycopy(t, 0, out, 4, 4)
    var pos = 8
    parts.foreach { p =>
      System.arraycopy(p, 0, out, pos, p.length)
      pos += p.length
    }
    out
  }

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)

  private val Matrix = Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L,
    0L, 0L, 0x40000000L).flatMap(u32)

  private def dinfBox: Array[Byte] =
    boxBytes("dinf", boxBytes("dref", u32(0L), u32(1L),
      boxBytes("url ", u32(1L)))) // self-contained flag

  /** A complete `soun` trak for one PCM chunk at `dataOffset`. */
  private def pcmTrak(nFrames: Int, rate: Int, channels: Int, bits: Int,
                      format: String, blockAlign: Int, dataOffset: Long,
                      trackId: Long): Array[Byte] = {
    val stsd = boxBytes("stsd", u32(0L), u32(1L),
      boxBytes(format,
        new Array[Byte](6), u16(1),          // reserved, data_ref_index
        u16(0), u16(0), u32(0L),             // version, revision, vendor
        u16(channels), u16(bits),
        u16(0), u16(0),                      // compression_id, packet size
        u32(rate.toLong << 16)))             // 16.16 fixed sample rate
    val stts = boxBytes("stts", u32(0L), u32(1L),
      u32(nFrames.toLong), u32(1L))
    val stsc = boxBytes("stsc", u32(0L), u32(1L),
      u32(1L), u32(nFrames.toLong), u32(1L))
    val stsz = boxBytes("stsz", u32(0L), u32(blockAlign.toLong),
      u32(nFrames.toLong))
    val stco = boxBytes("stco", u32(0L), u32(1L), u32(dataOffset))
    val stbl = boxBytes("stbl", stsd, stts, stsc, stsz, stco)
    val smhd = boxBytes("smhd", u32(0L), u16(0), u16(0))
    val minf = boxBytes("minf", smhd, dinfBox, stbl)
    val hdlr = boxBytes("hdlr", u32(0L), u32(0L),
      "soun".getBytes("US-ASCII"), new Array[Byte](12),
      Array(0.toByte)) // empty null-terminated name
    val mdhd = boxBytes("mdhd", u32(0L), u32(0L), u32(0L),
      u32(rate.toLong), u32(nFrames.toLong), u16(0x55c4), u16(0)) // und
    val mdia = boxBytes("mdia", mdhd, hdlr, minf)
    val tkhd = boxBytes("tkhd", u32(7L), // v0, flags: enabled+in movie
      u32(0L), u32(0L), u32(trackId), u32(0L), u32(nFrames.toLong),
      new Array[Byte](8), u16(0), u16(0), u16(0x0100), u16(0),
      Matrix, u32(0L), u32(0L))
    boxBytes("trak", tkhd, mdia)
  }

  /** A complete MJPEG `vide` trak: per-frame sizes in one chunk at
    * `dataOffset`, per-frame stts timing in µs (timescale 1000000, so
    * the deltas ARE the µs values — run-length-compressed like any
    * real muxer writes them). */
  private def mjpegTrak(jpegSizes: Seq[Int], delaysUs: Seq[Long],
                        w: Int, h: Int, dataOffset: Long,
                        trackId: Long, mdhdV1: Boolean = false,
                        co64: Boolean = false): Array[Byte] = {
    val n = jpegSizes.length
    val durationUs = delaysUs.sum
    val stsd = boxBytes("stsd", u32(0L), u32(1L),
      boxBytes("jpeg",
        new Array[Byte](6), u16(1),          // reserved, data_ref_index
        u16(0), u16(0), new Array[Byte](12), // pre_defined/reserved
        u16(w), u16(h),
        u32(0x00480000L), u32(0x00480000L),  // 72 dpi horiz/vert
        u32(0L), u16(1),                     // reserved, frame_count
        new Array[Byte](32),                 // compressorname
        u16(24), u16(0xffff)))               // depth, pre_defined (-1)
    // stts: run-length compress consecutive equal µs deltas
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    delaysUs.foreach { d =>
      if (runs.nonEmpty && runs.last._2 == d)
        runs(runs.length - 1) = (runs.last._1 + 1, d)
      else runs += ((1, d))
    }
    val stts = boxBytes("stts", u32(0L), u32(runs.length.toLong),
      runs.toArray.flatMap { case (c, d) => u32(c.toLong) ++ u32(d) })
    val stsc = boxBytes("stsc", u32(0L), u32(1L),
      u32(1L), u32(n.toLong), u32(1L))
    val stsz = boxBytes("stsz", u32(0L), u32(0L), u32(n.toLong),
      jpegSizes.toArray.flatMap(s => u32(s.toLong)))
    val stco =
      if (co64) boxBytes("co64", u32(0L), u32(1L), u64(dataOffset))
      else boxBytes("stco", u32(0L), u32(1L), u32(dataOffset))
    val stbl = boxBytes("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = boxBytes("vmhd", u32(1L), u16(0),
      u16(0), u16(0), u16(0)) // graphicsmode copy, opcolor
    val minf = boxBytes("minf", vmhd, dinfBox, stbl)
    val hdlr = boxBytes("hdlr", u32(0L), u32(0L),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      Array(0.toByte))
    // v1 mdhd widens creation/modification/duration to 64-bit — modern
    // muxers write either version, so the reader's branch needs a
    // producer to exercise it
    val mdhd =
      if (mdhdV1) boxBytes("mdhd", u32(0x01000000L), u64(0L), u64(0L),
        u32(1000000L), u64(durationUs), u16(0x55c4), u16(0))
      else boxBytes("mdhd", u32(0L), u32(0L), u32(0L),
        u32(1000000L), u32(durationUs), u16(0x55c4), u16(0))
    val mdia = boxBytes("mdia", mdhd, hdlr, minf)
    val tkhd = boxBytes("tkhd", u32(7L),
      u32(0L), u32(0L), u32(trackId), u32(0L), u32(durationUs),
      new Array[Byte](8), u16(0), u16(0), u16(0), u16(0),
      Matrix, u32(w.toLong << 16), u32(h.toLong << 16))
    boxBytes("trak", tkhd, mdia)
  }

  private def udtaBoxOf(text: String): Array[Byte] =
    boxBytes("udta",
      boxBytes("©cmt", text.getBytes("UTF-8")),
      boxBytes("©xyz", "+37.7749-122.4194/".getBytes("US-ASCII")))

  /** Write a PCM audio-only mp4 (an .m4a-shaped ISO-BMFF file): ftyp +
    * mdat (one chunk of interleaved PCM frames) + moov (full sample
    * tables). The fixture/producer side of [[extractAudio]] AND a real
    * interchange writer — the sample tables are spec-correct, the
    * `stco` offset points into THIS file's mdat. `udta` plants an
    * Apple-style user-data box (`©cmt` comment + `©xyz` GPS string)
    * inside moov — the adversary side of [[strip]]; `trailing` appends
    * raw bytes after the last box (the smuggling spot). `format` is
    * `sowt` (LE16), `twos` (BE16) or `raw ` (unsigned 8-bit; pcm bytes
    * are taken verbatim). */
  def writePcm(pcm: Array[Byte], rate: Int, channels: Int = 1,
               format: String = "sowt",
               udta: Option[String] = None,
               trailing: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(format == "sowt" || format == "twos" || format == "raw " ||
      format == "alaw" || format == "ulaw",
      s"unsupported PCM format '$format'")
    val bits =
      if (format == "raw " || format == "alaw" || format == "ulaw") 8
      else 16
    val blockAlign = channels * bits / 8
    require(pcm.length % blockAlign == 0,
      s"pcm length ${pcm.length} is not a multiple of frame size $blockAlign")
    val nFrames = pcm.length / blockAlign
    val data =
      if (format != "twos") pcm
      else { // store big-endian
        val d = java.util.Arrays.copyOf(pcm, pcm.length)
        var i = 0
        while (i + 1 < d.length) {
          val t = d(i); d(i) = d(i + 1); d(i + 1) = t
          i += 2
        }
        d
      }
    val ftyp = boxBytes("ftyp", "isom".getBytes("US-ASCII"), u32(0x200L),
      "isom".getBytes("US-ASCII"))
    val mdat = boxBytes("mdat", data)
    val dataOffset = ftyp.length + 8L // first sample byte inside mdat
    val trak = pcmTrak(nFrames, rate, channels, bits, format, blockAlign,
      dataOffset, trackId = 1L)
    val mvhd = boxBytes("mvhd", u32(0L), u32(0L), u32(0L),
      u32(rate.toLong), u32(nFrames.toLong), u32(0x00010000L),
      u16(0x0100), u16(0), new Array[Byte](8), Matrix,
      new Array[Byte](24), u32(2L))
    val moov = boxBytes("moov",
      Seq(mvhd, trak) ++ udta.map(udtaBoxOf).toSeq: _*)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.write(trailing)
    out.toByteArray
  }

  /** Write an MJPEG video mp4 (optionally with a mono 16-bit PCM
    * soundtrack): each frame JPEG-encodes through `javax.imageio` into
    * one mdat chunk, the vide trak's stts carries PER-FRAME µs timing
    * (timescale 1000000 — mp4 is natively VFR, so `delaysUs` may vary
    * frame to frame), and the optional soun trak's chunk follows the
    * frames. The fixture/producer side of [[openVideo]] AND a real
    * interchange writer; `udta`/`trailing` plant scrub adversaries like
    * [[writePcm]]'s. */
  def writeMjpeg(frames: Seq[java.awt.image.BufferedImage],
                 delaysUs: Seq[Long],
                 audio: Option[(Array[Byte], Int)] = None,
                 udta: Option[String] = None,
                 trailing: Array[Byte] = Array.emptyByteArray,
                 mdhdV1: Boolean = false,
                 co64: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "an mp4 video needs at least one frame")
    require(frames.length == delaysUs.length,
      s"${frames.length} frames but ${delaysUs.length} delays")
    require(delaysUs.forall(d => d > 0 && d <= 0xffffffffL),
      "per-frame delays must be positive u32 µs ticks")
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
    val ftyp = boxBytes("ftyp", "isom".getBytes("US-ASCII"), u32(0x200L),
      "isom".getBytes("US-ASCII"))
    val mdatBody = new java.io.ByteArrayOutputStream()
    jpegs.foreach(mdatBody.write)
    audio.foreach { case (pcm, _) => mdatBody.write(pcm) }
    val mdat = boxBytes("mdat", mdatBody.toByteArray)
    val videoOffset = ftyp.length + 8L
    val audioOffset = videoOffset + jpegs.map(_.length.toLong).sum
    val vTrak = mjpegTrak(jpegs.map(_.length), delaysUs,
      frames.head.getWidth, frames.head.getHeight, videoOffset,
      trackId = 1L, mdhdV1 = mdhdV1, co64 = co64)
    val aTrak = audio.map { case (pcm, rate) =>
      pcmTrak(pcm.length / 2, rate, channels = 1, bits = 16,
        format = "sowt", blockAlign = 2, audioOffset, trackId = 2L)
    }
    val mvhd = boxBytes("mvhd", u32(0L), u32(0L), u32(0L),
      u32(1000000L), u32(delaysUs.sum), u32(0x00010000L),
      u16(0x0100), u16(0), new Array[Byte](8), Matrix,
      new Array[Byte](24), u32(3L))
    val moov = boxBytes("moov",
      Seq(mvhd, vTrak) ++ aTrak.toSeq ++ udta.map(udtaBoxOf).toSeq: _*)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.write(trailing)
    out.toByteArray
  }
}
