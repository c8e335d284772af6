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
    val sounTraks = traks.filter { t =>
      (for {
        mdia <- children(payload, t).find(_.tpe == "mdia")
        hdlr <- children(payload, mdia).find(_.tpe == "hdlr")
        // hdlr payload: version/flags(4) + pre_defined(4) + handler(4)
      } yield fourcc(payload, hdlr.off + hdlr.payloadOff + 8) == "soun")
        .getOrElse(false)
    }
    if (sounTraks.isEmpty) return None
    require(sounTraks.size == 1,
      s"ISO-BMFF container declares ${sounTraks.size} soun tracks — " +
        "interleaving them would corrupt the sample stream; refusing " +
        "loudly")
    val stbl = (for {
      mdia <- children(payload, sounTraks.head).find(_.tpe == "mdia")
      minf <- children(payload, mdia).find(_.tpe == "minf")
      stbl <- children(payload, minf).find(_.tpe == "stbl")
    } yield stbl).getOrElse(throw new IllegalArgumentException(
      "soun track has no stbl sample table"))
    val tables = children(payload, stbl)
    def table(t: String): Box = tables.find(_.tpe == t).getOrElse(
      throw new IllegalArgumentException(s"soun track stbl has no $t box"))
    // stsd: FullBox, entry_count, then sample entries
    val stsd = table("stsd")
    val entryCount = be32(payload, stsd.off + stsd.payloadOff + 4)
    require(entryCount == 1L,
      s"stsd declares $entryCount sample descriptions — mixed-format " +
        "tracks are out of demux scope; refusing loudly")
    val entry = stsd.off + stsd.payloadOff + 8
    val format = fourcc(payload, entry + 4)
    require(format == "sowt" || format == "twos" || format == "raw ",
      s"audio sample entry is '$format' — only raw PCM (sowt/twos/raw ) " +
        "demuxes without a codec; compressed soundtracks refuse loudly " +
        "rather than emit garbage samples")
    val channels = (be32(payload, entry + 24) >> 16).toInt
    val sampleBits = (be32(payload, entry + 24) & 0xffff).toInt
    val rate = (be32(payload, entry + 32) >> 16).toInt
    val bits = if (format == "raw ") 8 else sampleBits
    // stsz: constant sample_size or per-sample table
    val stsz = table("stsz")
    val szOff = stsz.off + stsz.payloadOff
    val constSize = be32(payload, szOff + 4)
    val sampleCount = be32(payload, szOff + 8).toInt
    def sampleSize(i: Int): Long =
      if (constSize != 0L) constSize else be32(payload, szOff + 12 + 4 * i)
    // stsc: (first_chunk, samples_per_chunk, _) runs
    val stsc = table("stsc")
    val scOff = stsc.off + stsc.payloadOff
    val scCount = be32(payload, scOff + 4).toInt
    val runs = (0 until scCount).map { i =>
      (be32(payload, scOff + 8 + 12 * i).toInt,        // first_chunk (1-based)
        be32(payload, scOff + 8 + 12 * i + 4).toInt)   // samples_per_chunk
    }
    // stco / co64: chunk offsets (file-absolute)
    val (chunkCount, chunkOffset) = tables.find(_.tpe == "stco") match {
      case Some(stco) =>
        val o = stco.off + stco.payloadOff
        (be32(payload, o + 4).toInt,
          (i: Int) => be32(payload, o + 8 + 4 * i))
      case None =>
        val co64 = table("co64")
        val o = co64.off + co64.payloadOff
        (be32(payload, o + 4).toInt,
          (i: Int) => be64(payload, o + 8 + 8 * i))
    }
    // samples per chunk c (1-based): the last stsc run with
    // first_chunk <= c
    def samplesInChunk(c: Int): Int =
      runs.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0)
    val out = new java.io.ByteArrayOutputStream()
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
        out.write(payload, off.toInt, len.toInt)
        off += len
        i += 1
        sample += 1
      }
      c += 1
    }
    require(sample == sampleCount,
      s"sample table declares $sampleCount samples but chunks cover " +
        s"$sample — corrupt stsc/stco")
    val pcm = out.toByteArray
    // normalize twos (big-endian 16-bit) to the little-endian norm
    if (format == "twos" && bits == 16) {
      var i = 0
      while (i + 1 < pcm.length) {
        val t = pcm(i); pcm(i) = pcm(i + 1); pcm(i + 1) = t
        i += 2
      }
    }
    Some(AviCodec.AviAudio(pcm, channels, rate, bits))
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
    require(format == "sowt" || format == "twos" || format == "raw ",
      s"unsupported PCM format '$format'")
    val bits = if (format == "raw ") 8 else 16
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
    val dinf = boxBytes("dinf", boxBytes("dref", u32(0L), u32(1L),
      boxBytes("url ", u32(1L)))) // self-contained flag
    val minf = boxBytes("minf", smhd, dinf, stbl)
    val hdlr = boxBytes("hdlr", u32(0L), u32(0L),
      "soun".getBytes("US-ASCII"), new Array[Byte](12),
      Array(0.toByte)) // empty null-terminated name
    val mdhd = boxBytes("mdhd", u32(0L), u32(0L), u32(0L),
      u32(rate.toLong), u32(nFrames.toLong), u16(0x55c4), u16(0)) // und
    val mdia = boxBytes("mdia", mdhd, hdlr, minf)
    val matrix = Array(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
      0x40000000L).flatMap(u32)
    val tkhd = boxBytes("tkhd", u32(7L), // v0, flags: enabled+in movie
      u32(0L), u32(0L), u32(1L), u32(0L), u32(nFrames.toLong),
      new Array[Byte](8), u16(0), u16(0), u16(0x0100), u16(0),
      matrix, u32(0L), u32(0L))
    val trak = boxBytes("trak", tkhd, mdia)
    val mvhd = boxBytes("mvhd", u32(0L), u32(0L), u32(0L),
      u32(rate.toLong), u32(nFrames.toLong), u32(0x00010000L),
      u16(0x0100), u16(0), new Array[Byte](8), matrix,
      new Array[Byte](24), u32(2L))
    val udtaBox = udta.map { text =>
      val t = text.getBytes("UTF-8")
      boxBytes("udta",
        boxBytes("©cmt", t),
        boxBytes("©xyz", "+37.7749-122.4194/".getBytes("US-ASCII")))
    }
    val moov = boxBytes("moov",
      Seq(mvhd, trak) ++ udtaBox.toSeq: _*)
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(mdat); out.write(moov)
    out.write(trailing)
    out.toByteArray
  }
}
