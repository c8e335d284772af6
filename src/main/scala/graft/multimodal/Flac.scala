package graft.multimodal

/** FLAC — the first COMPRESSED audio coding served in-JVM, by pure
  * integer arithmetic (FLAC is losslessly integer-predictive: fixed /
  * LPC polynomial predictors plus Rice-coded residuals — no DSP, no
  * native codec). Archival corpora and music datasets ship FLAC by
  * the petabyte; decoding it feeds the same normalized seam
  * ([[AudioDedup.openNormalized16]]) every audio face shares.
  *
  * Served:
  *  - [[decode]]: full subframe coverage — CONSTANT, VERBATIM, FIXED
  *    orders 0-4, LPC orders 1-32 (64-bit accumulators), Rice methods
  *    0/1 with partitioning and raw-escape, wasted bits, all four
  *    channel assignments (independent, left/side, right/side,
  *    mid/side), frame-header CRC-8 and frame CRC-16 VERIFIED (a
  *    corrupt archival file fails loudly, never decodes to noise).
  *  - [[stripMeta]]/[[metaReport]]: `VORBIS_COMMENT` (artist/location
  *    strings), `PICTURE` (embedded images — a smuggling channel) and
  *    `APPLICATION` (arbitrary third-party bytes) metadata blocks are
  *    REMOVED; STREAMINFO/SEEKTABLE/CUESHEET/PADDING stay. Safe as
  *    byte removal: FLAC seek points are offsets from the FIRST FRAME
  *    byte, not the file start, so dropping metadata blocks shifts
  *    nothing they reference.
  *  - [[encode]]: fixed-order-2 + Rice encoder (the fixture/sink
  *    face) producing spec-conformant files any decoder reads.
  *
  * 16-bit and 8-bit streams normalize to the pipeline's 16-bit LE
  * norm; other depths (20/24/32) refuse loudly for now.
  */
object Flac {

  def isFlac(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---- CRCs (FLAC frame integrity) ----
  private val Crc8Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var j = 0
      while (j < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; j += 1 }
      t(i) = c
      i += 1
    }
    t
  }
  private val Crc16Table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var j = 0
      while (j < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; j += 1 }
      t(i) = c
      i += 1
    }
    t
  }
  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc8Table(c ^ (b(i) & 0xff)); i += 1 }
    c
  }
  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) { c = Crc16Table(((c >> 8) ^ (b(i) & 0xff)) & 0xff) ^ ((c << 8) & 0xffff); i += 1 }
    c
  }

  // ---- bit reader (MSB-first) ----
  private final class BitReader(val b: Array[Byte], startByte: Int) {
    var bitPos: Long = startByte.toLong * 8
    def bytePos: Int = (bitPos >> 3).toInt
    def readBit(): Int = {
      val i = (bitPos >> 3).toInt
      require(i < b.length, "FLAC stream truncated mid-frame")
      val v = (b(i) >> (7 - (bitPos & 7)).toInt) & 1
      bitPos += 1
      v
    }
    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 57, s"readBits($n)")
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L else if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q < (1 << 24), "runaway unary code — corrupt FLAC residual")
      }
      q
    }
    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7L
  }

  // ---- metadata blocks ----
  final case class MetaBlock(blockType: Int, offset: Int, length: Int,
                             last: Boolean) {
    def name: String = blockType match {
      case 0 => "STREAMINFO"
      case 1 => "PADDING"
      case 2 => "APPLICATION"
      case 3 => "SEEKTABLE"
      case 4 => "VORBIS_COMMENT"
      case 5 => "CUESHEET"
      case 6 => "PICTURE"
      case t => s"RESERVED_$t"
    }
  }

  /** Walk the metadata chain: (blocks, first audio-frame offset). */
  def metaBlocks(b: Array[Byte]): (Seq[MetaBlock], Int) = {
    require(isFlac(b), "payload is not a FLAC stream")
    val out = scala.collection.mutable.ArrayBuffer.empty[MetaBlock]
    var off = 4
    var last = false
    while (!last) {
      require(off + 4 <= b.length, s"truncated FLAC metadata header at $off")
      last = (b(off) & 0x80) != 0
      val bt = b(off) & 0x7f
      require(bt != 127, "invalid FLAC metadata block type 127")
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      require(off.toLong + 4 + len <= b.length,
        s"truncated FLAC metadata block at $off")
      out += MetaBlock(bt, off, 4 + len, last)
      off += 4 + len
    }
    require(out.nonEmpty && out.head.blockType == 0,
      "FLAC stream does not start with STREAMINFO")
    (out.toSeq, off)
  }

  final case class StreamInfo(sampleRate: Int, channels: Int, bits: Int,
                              totalSamples: Long)

  def streamInfo(b: Array[Byte]): StreamInfo = {
    val (blocks, _) = metaBlocks(b)
    val si = blocks.head
    val r = new BitReader(b, si.offset + 4)
    r.readBits(16): Unit // min block size
    r.readBits(16): Unit // max block size
    r.readBits(24): Unit // min frame size
    r.readBits(24): Unit // max frame size
    val rate = r.readBits(20).toInt
    val ch = r.readBits(3).toInt + 1
    val bits = r.readBits(5).toInt + 1
    val total = r.readBits(36)
    require(rate > 0, "FLAC STREAMINFO states sample rate 0")
    StreamInfo(rate, ch, bits, total)
  }

  // blocked metadata: where muxers stash author/location strings,
  // embedded pictures and arbitrary third-party payloads
  private val DropTypes = Set(2, 4, 6) // APPLICATION, VORBIS_COMMENT, PICTURE

  /** Remove metadata blocks a compliance pass must not publish:
    * (clean bytes, dropped block names). Keeps the chain's last-block
    * flag correct; a clean payload returns the original array. */
  def stripMeta(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    val (blocks, audioStart) = metaBlocks(payload)
    val dropped = blocks.filter(m => DropTypes(m.blockType))
    if (dropped.isEmpty) (payload, Nil)
    else {
      val keep = blocks.filterNot(m => DropTypes(m.blockType))
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(payload, 0, 4)
      keep.zipWithIndex.foreach { case (m, i) =>
        val hdr = (payload(m.offset) & 0x7f) |
          (if (i == keep.length - 1) 0x80 else 0)
        bos.write(hdr)
        bos.write(payload, m.offset + 1, m.length - 1)
      }
      bos.write(payload, audioStart, payload.length - audioStart)
      (bos.toByteArray, dropped.map(_.name))
    }
  }

  /** What [[stripMeta]] would drop — the audit face. */
  def metaReport(payload: Array[Byte]): Seq[String] =
    metaBlocks(payload)._1.filter(m => DropTypes(m.blockType)).map(_.name)

  // ---- frame decode ----

  private val RateTable = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)
  private val SizeTable = Array(0, 8, 12, 0, 16, 20, 24, 32)

  /** Decode the whole stream to interleaved samples (per-channel
    * arrays concatenated frame-wise). Returns (samples interleaved,
    * channels, rate, bits). */
  def decode(payload: Array[Byte]): (Array[Int], Int, Int, Int) = {
    val si = streamInfo(payload)
    val (_, audioStart) = metaBlocks(payload)
    require(si.bits == 16 || si.bits == 8,
      s"${si.bits}-bit FLAC unsupported (16/8-bit decode; 20/24/32-bit " +
        "streams refuse loudly)")
    val samples = scala.collection.mutable.ArrayBuilder.make[Int]
    if (si.totalSamples > 0)
      samples.sizeHint((si.totalSamples * si.channels).toInt)
    var off = audioStart
    var decoded = 0L
    while (off < payload.length &&
      (si.totalSamples == 0 || decoded < si.totalSamples)) {
      val (frame, nextOff, blockSize) = decodeFrame(payload, off, si)
      var i = 0
      val keep =
        if (si.totalSamples > 0)
          math.min(blockSize.toLong, si.totalSamples - decoded).toInt
        else blockSize
      while (i < keep) {
        var c = 0
        while (c < si.channels) { samples += frame(c)(i); c += 1 }
        i += 1
      }
      decoded += keep
      off = nextOff
    }
    require(si.totalSamples == 0 || decoded == si.totalSamples,
      s"FLAC stream ended at $decoded of ${si.totalSamples} samples")
    (samples.result(), si.channels, si.sampleRate, si.bits)
  }

  /** Decode one frame at `off`: (per-channel samples, next offset,
    * block size). */
  private def decodeFrame(b: Array[Byte], off: Int,
                          si: StreamInfo): (Array[Array[Int]], Int, Int) = {
    val r = new BitReader(b, off)
    val sync = r.readBits(14)
    require(sync == 0x3ffe, f"lost FLAC frame sync at $off (0x$sync%x)")
    r.readBit(): Unit // reserved
    r.readBit(): Unit // blocking strategy
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chCode = r.readBits(4).toInt
    val szCode = r.readBits(3).toInt
    r.readBit(): Unit // reserved
    // UTF-8-coded frame/sample number: lead byte defines length
    val lead = r.readBits(8).toInt
    val extra =
      if (lead < 0x80) 0
      else { var n = 0; var m = lead; while ((m & 0x40) != 0) { n += 1; m <<= 1 }; n }
    require(extra <= 6, s"invalid coded number lead byte 0x$lead%02x")
    var k = 0
    while (k < extra) {
      val c = r.readBits(8).toInt
      require((c & 0xc0) == 0x80, "malformed coded frame number")
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size code")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    val rate = srCode match {
      case 0 => si.sampleRate
      case n if n <= 11 => RateTable(n)
      case 12 => r.readBits(8).toInt * 1000
      case 13 => r.readBits(16).toInt
      case 14 => r.readBits(16).toInt * 10
      case _ => throw new IllegalArgumentException("invalid sample rate code")
    }
    require(rate == si.sampleRate, "frame rate differs from STREAMINFO")
    val bits = szCode match {
      case 0 => si.bits
      case 3 => throw new IllegalArgumentException("reserved sample size code")
      case n => SizeTable(n)
    }
    require(bits == si.bits, "frame sample size differs from STREAMINFO")
    val channels = if (chCode < 8) chCode + 1 else 2
    require(chCode <= 10, s"reserved channel assignment $chCode")
    require(channels == si.channels, "frame channels differ from STREAMINFO")
    // header CRC-8 covers sync through the fields just read
    r.alignByte()
    val crcPos = r.bytePos
    val stated = r.readBits(8).toInt
    require(crc8(b, off, crcPos) == stated,
      s"FLAC frame header CRC mismatch at $off")
    // subframes
    val chans = Array.ofDim[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val sideBps = chCode match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bits + sideBps)
      c += 1
    }
    // undo inter-channel decorrelation
    chCode match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: left = right + side
        var i = 0
        while (i < blockSize) {
          val l = chans(1)(i) + chans(0)(i)
          chans(0)(i) = l
          i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    r.alignByte()
    val frameCrcPos = r.bytePos
    val statedCrc = r.readBits(16).toInt
    require(crc16(b, off, frameCrcPos) == statedCrc,
      s"FLAC frame CRC-16 mismatch at $off")
    (chans, r.bytePos, blockSize)
  }

  private def decodeSubframe(r: BitReader, blockSize: Int,
                             bps0: Int): Array[Int] = {
    require(r.readBit() == 0, "subframe padding bit set — corrupt stream")
    val t = r.readBits(6).toInt
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val bps = bps0 - wasted
    val out = new Array[Int](blockSize)
    if (t == 0) { // CONSTANT
      val v = r.readSigned(bps).toInt
      java.util.Arrays.fill(out, v)
    } else if (t == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = r.readSigned(bps).toInt; i += 1 }
    } else if ((t & 0x38) == 0x08 && (t & 0x07) <= 4) { // FIXED
      val order = t & 0x07
      require(order <= blockSize, "predictor order exceeds block size")
      var i = 0
      while (i < order) { out(i) = r.readSigned(bps).toInt; i += 1 }
      readResidual(r, blockSize, order, out)
      i = order
      while (i < blockSize) {
        val p = order match {
          case 0 => 0L
          case 1 => out(i - 1).toLong
          case 2 => 2L * out(i - 1) - out(i - 2)
          case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
          case 4 => 4L * out(i - 1) - 6L * out(i - 2) + 4L * out(i - 3) - out(i - 4)
        }
        out(i) = (out(i) + p).toInt
        i += 1
      }
    } else if ((t & 0x20) != 0) { // LPC
      val order = (t & 0x1f) + 1
      require(order <= blockSize, "predictor order exceeds block size")
      var i = 0
      while (i < order) { out(i) = r.readSigned(bps).toInt; i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, "invalid LPC precision 16")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, "negative LPC shift")
      val coefs = Array.ofDim[Long](order)
      i = 0
      while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
      readResidual(r, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * out(i - 1 - j); j += 1 }
        out(i) = (out(i) + (acc >> shift)).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(f"reserved subframe type 0x$t%02x")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into out[order, blockSize). */
  private def readResidual(r: BitReader, blockSize: Int, order: Int,
                           out: Array[Int]): Unit = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val po = r.readBits(4).toInt
    val partitions = 1 << po
    require(blockSize % partitions == 0,
      "block size not divisible by rice partitions")
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (blockSize >> po) - (if (p == 0) order else 0)
      require(count >= 0, "rice partition smaller than predictor order")
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.readSigned(raw).toInt; idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val rem = r.readBits(param)
          val u = (q.toLong << param) | rem
          out(idx) = ((u >> 1) ^ -(u & 1L)).toInt // zigzag
          idx += 1
          i += 1
        }
      }
      p += 1
    }
  }

  // ---- encoder (fixture/sink face) ----

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { bos.write(cur); cur = 0; nBits = 0 }
        k -= 1
      }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignByte(): Unit = if (nBits > 0) writeBits(0, 8 - nBits)
    def toBytes: Array[Byte] = { alignByte(); bos.toByteArray }
  }

  /** Encode interleaved samples as a spec-conformant FLAC stream:
    * fixed-order-2 prediction (or order-1 LPC with `mode = "lpc1"` —
    * same residuals, the LPC wire grammar), single-partition Rice
    * residuals, and for stereo an optional inter-channel
    * decorrelation (`stereo` = "independent" | "leftside" |
    * "rightside" | "midside"). One VORBIS_COMMENT when `comment` is
    * set, one PICTURE when `picture` is set (the adversary faces for
    * [[stripMeta]]). */
  def encode(samples: Array[Int], channels: Int, rate: Int,
             bits: Int = 16, comment: Option[String] = None,
             picture: Option[Array[Byte]] = None,
             stereo: String = "independent",
             mode: String = "fixed"): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    require(bits == 16 || bits == 8)
    val total = samples.length / channels
    val blockSize = 4096
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO
    val siw = new BitWriter
    siw.writeBits(blockSize.toLong, 16); siw.writeBits(blockSize.toLong, 16)
    siw.writeBits(0, 24); siw.writeBits(0, 24)
    siw.writeBits(rate.toLong, 20)
    siw.writeBits((channels - 1).toLong, 3)
    siw.writeBits((bits - 1).toLong, 5)
    siw.writeBits(total.toLong, 36)
    (0 until 16).foreach(_ => siw.writeBits(0, 8)) // md5 unset
    val siBytes = siw.toBytes
    val extras = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    comment.foreach { c =>
      val vendor = "graft".getBytes("UTF-8")
      val entry = s"COMMENT=$c".getBytes("UTF-8")
      val vb = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        vb.write(v & 0xff); vb.write((v >> 8) & 0xff)
        vb.write((v >> 16) & 0xff); vb.write((v >> 24) & 0xff)
      }
      le32(vendor.length); vb.write(vendor)
      le32(1); le32(entry.length); vb.write(entry)
      extras += ((4, vb.toByteArray))
    }
    picture.foreach(p => extras += ((6, p)))
    def writeBlock(bt: Int, data: Array[Byte], last: Boolean): Unit = {
      bos.write((if (last) 0x80 else 0) | bt)
      bos.write((data.length >> 16) & 0xff)
      bos.write((data.length >> 8) & 0xff)
      bos.write(data.length & 0xff)
      bos.write(data)
    }
    writeBlock(0, siBytes, last = extras.isEmpty)
    extras.zipWithIndex.foreach { case ((bt, data), i) =>
      writeBlock(bt, data, last = i == extras.length - 1)
    }
    require(stereo == "independent" || channels == 2,
      "stereo decorrelation needs exactly 2 channels")
    // frames
    var pos = 0
    var frameNo = 0L
    while (pos < total) {
      val n = math.min(blockSize, total - pos)
      bos.write(encodeFrame(samples, channels, pos, n, bits, frameNo,
        stereo, mode))
      pos += n
      frameNo += 1
    }
    bos.toByteArray
  }

  private def encodeFrame(samples: Array[Int], channels: Int, pos: Int,
                          n: Int, bits: Int, frameNo: Long,
                          stereo: String, mode: String): Array[Byte] = {
    val chCode = stereo match {
      case "independent" => channels - 1
      case "leftside" => 8
      case "rightside" => 9
      case "midside" => 10
      case other => throw new IllegalArgumentException(
        s"unknown stereo mode '$other'")
    }
    val w = new BitWriter
    w.writeBits(0x3ffe, 14)
    w.writeBits(0, 1) // reserved
    w.writeBits(0, 1) // fixed blocking
    w.writeBits(7, 4) // block size: 16-bit at end of header
    w.writeBits(0, 4) // rate: from STREAMINFO
    w.writeBits(chCode.toLong, 4)
    w.writeBits(if (bits == 16) 4L else 1L, 3)
    w.writeBits(0, 1)
    // frame number, UTF-8 coded (supports < 2^31 frames here)
    if (frameNo < 0x80) w.writeBits(frameNo, 8)
    else if (frameNo < 0x800) {
      w.writeBits(0xc0L | (frameNo >> 6), 8)
      w.writeBits(0x80L | (frameNo & 0x3f), 8)
    } else {
      require(frameNo < 0x10000, "fixture encoder caps at 2^16 frames")
      w.writeBits(0xe0L | (frameNo >> 12), 8)
      w.writeBits(0x80L | ((frameNo >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (frameNo & 0x3f), 8)
    }
    w.writeBits((n - 1).toLong, 16)
    val headerBytes = w.toBytes // aligned: all fields above are whole bytes
    val crc8v = crc8(headerBytes, 0, headerBytes.length)
    val w2 = new BitWriter
    headerBytes.foreach(x => w2.writeBits((x & 0xff).toLong, 8))
    w2.writeBits(crc8v.toLong, 8)
    // per-channel signals after the chosen decorrelation (side = +1 bit)
    def raw(c: Int) = Array.tabulate(n)(i => samples((pos + i) * channels + c))
    val chans: Seq[(Array[Int], Int)] = chCode match {
      case 8 => // left, side = L - R
        val l = raw(0); val r0 = raw(1)
        Seq((l, bits), (Array.tabulate(n)(i => l(i) - r0(i)), bits + 1))
      case 9 => // side = L - R, right
        val l = raw(0); val r0 = raw(1)
        Seq((Array.tabulate(n)(i => l(i) - r0(i)), bits + 1), (r0, bits))
      case 10 => // mid = (L+R)>>1, side = L - R
        val l = raw(0); val r0 = raw(1)
        Seq((Array.tabulate(n)(i => (l(i) + r0(i)) >> 1), bits),
          (Array.tabulate(n)(i => l(i) - r0(i)), bits + 1))
      case _ => (0 until channels).map(c => (raw(c), bits))
    }
    chans.foreach { case (ch, bps) =>
      val order = math.min(if (mode == "lpc1") 1 else 2, n - 1)
      w2.writeBits(0, 1)
      if (mode == "lpc1" && order == 1) {
        // LPC order 1, coeff 16, shift 4: predicts prev exactly —
        // fixed-order-1 residuals through the LPC wire grammar
        w2.writeBits(0x20L, 6) // 100000 = LPC order 1
      } else {
        w2.writeBits((0x08 | order).toLong, 6)
      }
      w2.writeBits(0, 1) // no wasted bits
      var i = 0
      while (i < order) { w2.writeBits(ch(i).toLong & ((1L << bps) - 1), bps); i += 1 }
      if (mode == "lpc1" && order == 1) {
        w2.writeBits(5L, 4)  // precision 6 (-1 coded; 16 needs 6 signed bits)
        w2.writeBits(4L, 5)  // shift 4
        w2.writeBits(16L, 6) // coeff 16 -> prediction prev*16>>4 = prev
      }
      val res = new Array[Long](n - order)
      i = order
      while (i < n) {
        val p =
          if (mode == "lpc1" && order == 1) ch(i - 1).toLong
          else order match {
            case 0 => 0L
            case 1 => ch(i - 1).toLong
            case _ => 2L * ch(i - 1) - ch(i - 2)
          }
        res(i - order) = ch(i) - p
        i += 1
      }
      // single-partition Rice; parameter from the mean magnitude
      val mean = if (res.isEmpty) 0L
        else res.map(v => math.abs(v)).sum / math.max(1, res.length)
      var param = 0
      while (param < 14 && (1L << param) < mean + 1) param += 1
      w2.writeBits(0, 2) // method 0
      w2.writeBits(0, 4) // partition order 0
      w2.writeBits(param.toLong, 4)
      res.foreach { v =>
        val u = (v << 1) ^ (v >> 63) // zigzag
        w2.writeUnary((u >>> param).toInt)
        w2.writeBits(u & ((1L << param) - 1), param)
      }
    }
    w2.alignByte()
    val body = w2.toBytes
    val crc16v = crc16(body, 0, body.length)
    val w3 = new BitWriter
    body.foreach(x => w3.writeBits((x & 0xff).toLong, 8))
    w3.writeBits(crc16v.toLong, 16)
    w3.toBytes
  }
}
