package graft.multimodal

/** TIFF container faces — the scanned-document / scientific-capture
  * format (and the carrier of EXIF itself). Pixel DECODE comes free
  * (the JDK ships a TIFF ImageIO plugin since Java 9), so what's
  * served here is the compliance walk ImageIO doesn't do:
  *
  *  - [[strip]]/[[wipeReport]]: identifying metadata is WIPED IN
  *    PLACE — TIFF is offset-riddled (strip offsets, sub-IFD
  *    pointers are absolute file positions), so byte removal would
  *    corrupt every pointer; instead dropped IFD entries are removed
  *    from the directory (kept entries shift up, the tail zero-fills
  *    — readers walk the entry COUNT, dead bytes are unreachable)
  *    and their OUT-OF-LINE values are zeroed, so the GPS rationals
  *    and artist strings are gone from the bytes, not just
  *    unreferenced. EXIF/GPS sub-IFDs (tags 0x8769/0x8825) are
  *    zeroed entry-by-entry before their pointer entry drops.
  *  - [[dims]]: ImageWidth/ImageLength (tags 256/257) from the IFD —
  *    the zero-decode path for aspect bucketing.
  *
  * Both endians (`II`/`MM`) and multi-page next-IFD chains are
  * walked; offsets are bounds-checked in Long against crafted files.
  */
object Tiff {

  def isTiff(b: Array[Byte]): Boolean =
    b.length > 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  /** Tags a compliance pass must not publish: free-text identifying
    * strings, device identity, timestamps, and the EXIF/GPS/IPTC/XMP
    * metadata blocks. */
  private val DropTags: Map[Int, String] = Map(
    270 -> "ImageDescription", 271 -> "Make", 272 -> "Model",
    305 -> "Software", 306 -> "DateTime", 315 -> "Artist",
    316 -> "HostComputer", 700 -> "XMP", 33723 -> "IPTC",
    0x8769 -> "ExifIFD", 0x8825 -> "GpsIFD")

  private val TypeSize =
    Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)

  private final class Rd(b: Array[Byte], le: Boolean) {
    def u16(o: Int): Int = {
      require(o >= 0 && o + 2 <= b.length, s"TIFF read past end at $o")
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(o: Int): Long = {
      require(o >= 0 && o + 4 <= b.length, s"TIFF read past end at $o")
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }
  }

  private final case class Entry(tag: Int, typ: Int, count: Long,
                                 valueOff: Int, inline: Boolean,
                                 dataOff: Long, dataLen: Long)

  /** Parse one IFD at `off`: (entries, next-IFD offset). */
  private def readIfd(b: Array[Byte], r: Rd, off: Int): (Seq[Entry], Long) = {
    val n = r.u16(off)
    require(n > 0 && n < 4096, s"IFD entry count $n at $off")
    val entries = (0 until n).map { i =>
      val e = off + 2 + 12 * i
      val tag = r.u16(e)
      val typ = r.u16(e + 2)
      val count = r.u32(e + 4)
      val size = if (typ >= 1 && typ <= 12) TypeSize(typ) else 1
      val dataLen = size.toLong * count
      val inline = dataLen <= 4
      val dataOff = if (inline) (e + 8).toLong else r.u32(e + 8)
      require(inline || dataOff + dataLen <= b.length,
        s"TIFF tag $tag data overruns the file")
      Entry(tag, typ, count, e + 8, inline, dataOff, dataLen)
    }
    (entries, r.u32(off + 2 + 12 * n))
  }

  private def ifdChain(b: Array[Byte], r: Rd): Seq[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var off = r.u32(4)
    var hops = 0
    while (off != 0) {
      require(off > 0 && off + 2 <= b.length, s"IFD offset $off out of range")
      require(hops < 64, "runaway IFD chain")
      out += off.toInt
      off = readIfd(b, r, off.toInt)._2
      hops += 1
    }
    out.toSeq
  }

  /** (width, height) from the first IFD — zero pixel decode. */
  def dims(b: Array[Byte]): (Int, Int) = {
    require(isTiff(b), "payload is not a TIFF")
    val r = new Rd(b, b(0) == 'I')
    val (entries, _) = readIfd(b, r, r.u32(4).toInt)
    def short(e: Entry): Int =
      if (e.typ == 3) r.u16(e.valueOff) else r.u32(e.valueOff).toInt
    val w = entries.find(_.tag == 256).map(short)
    val h = entries.find(_.tag == 257).map(short)
    require(w.isDefined && h.isDefined, "TIFF IFD lacks ImageWidth/Length")
    (w.get, h.get)
  }

  /** What [[strip]] would wipe, across the whole IFD chain. */
  def wipeReport(payload: Array[Byte]): Seq[String] = {
    require(isTiff(payload), "payload is not a TIFF")
    val r = new Rd(payload, payload(0) == 'I')
    ifdChain(payload, r).flatMap { off =>
      readIfd(payload, r, off)._1
        .filter(e => DropTags.contains(e.tag))
        .map(e => DropTags(e.tag))
    }
  }

  /** Wipe identifying metadata in place: (clean bytes, wiped names).
    * A clean payload returns the original array. File length and
    * every surviving offset are untouched. */
  def strip(payload: Array[Byte]): (Array[Byte], Seq[String]) = {
    require(isTiff(payload), "payload is not a TIFF")
    val r = new Rd(payload, payload(0) == 'I')
    val le = payload(0) == 'I'
    val chain = ifdChain(payload, r)
    val report = wipeReport(payload)
    if (report.isEmpty) return (payload, Nil)
    val out = payload.clone()
    def zero(off: Long, len: Long): Unit =
      java.util.Arrays.fill(out, off.toInt, (off + len).toInt, 0.toByte)
    def w16(o: Int, v: Int): Unit =
      if (le) { out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte }
      else { out(o) = ((v >> 8) & 0xff).toByte; out(o + 1) = (v & 0xff).toByte }
    chain.foreach { off =>
      val (entries, next) = readIfd(payload, r, off)
      val (dropped, kept) = entries.partition(e => DropTags.contains(e.tag))
      if (dropped.nonEmpty) {
        dropped.foreach { e =>
          // a sub-IFD's own entries + values go first
          if (e.tag == 0x8769 || e.tag == 0x8825) {
            val sub = r.u32(e.valueOff)
            if (sub > 0 && sub + 2 <= payload.length) {
              val (subEntries, _) = readIfd(payload, r, sub.toInt)
              subEntries.foreach(se =>
                if (!se.inline) zero(se.dataOff, se.dataLen))
              zero(sub, 2L + 12L * subEntries.length + 4L)
            }
          }
          if (!e.inline) zero(e.dataOff, e.dataLen)
        }
        // rewrite the IFD with kept entries only: count, entries
        // shifted up in original order, next pointer right after;
        // zero the dead tail (readers walk the count — the tail is
        // unreachable, and zeroing removes any string remnants)
        val _ = (kept, next)
        w16(off, entries.count(e => !DropTags.contains(e.tag)))
        var srcIdx = 0
        var dst = off + 2
        entries.foreach { e =>
          val src = off + 2 + 12 * srcIdx
          if (!DropTags.contains(e.tag)) {
            System.arraycopy(payload, src, out, dst, 12)
            dst += 12
          }
          srcIdx += 1
        }
        System.arraycopy(payload, off + 2 + 12 * entries.length, out, dst, 4)
        java.util.Arrays.fill(out, dst + 4,
          off + 2 + 12 * entries.length + 4, 0.toByte)
      }
    }
    (out, report)
  }

  // ---- fixture writer ----

  /** A minimal little-endian grayscale TIFF (uncompressed, one strip)
    * with optional planted metadata: an Artist string, a DateTime and
    * a GPS sub-IFD with rational coordinates. ImageIO reads the
    * result (unit-pinned), so the fixture is a REAL file. */
  def writeGray(width: Int, height: Int, pixel: (Int, Int) => Int,
                artist: Option[String] = None,
                gps: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    bos.write('I'); bos.write('I'); w16(42)
    val nPix = width * height
    val artistBytes = artist.map(a => (a + " ").getBytes("US-ASCII"))
    // layout: header(8) | pixels | [artist str] | [gps ifd + rationals]
    // | IFD0
    val pixOff = 8L
    val artistOff = pixOff + nPix
    val gpsOff = artistOff + artistBytes.fold(0)(_.length)
    val nGpsEntries = 2
    val gpsRatOff = gpsOff + (if (gps) 2L + 12L * nGpsEntries + 4L else 0L)
    val gpsLen = if (gps) (gpsRatOff - gpsOff) + 16L else 0L
    val ifd0Off = gpsOff + gpsLen
    w32(ifd0Off)
    // pixels
    (0 until height).foreach(y => (0 until width).foreach(x =>
      bos.write(pixel(x, y) & 0xff)))
    artistBytes.foreach(bos.write)
    if (gps) {
      // GPS IFD: GPSLatitude (tag 2, RATIONAL x2... keep one rational
      // each for latitude/longitude)
      w16(nGpsEntries)
      w16(2); w16(5); w32(1L); w32(gpsRatOff)        // GPSLatitude
      w16(4); w16(5); w32(1L); w32(gpsRatOff + 8L)   // GPSLongitude
      w32(0L) // next
      w32(1234L); w32(100L) // 12.34
      w32(5678L); w32(100L) // 56.78
    }
    // IFD0
    val baseTags = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)](
      (256, 3, 1L, width.toLong),   // ImageWidth
      (257, 3, 1L, height.toLong),  // ImageLength
      (258, 3, 1L, 8L),             // BitsPerSample
      (259, 3, 1L, 1L),             // Compression: none
      (262, 3, 1L, 1L),             // Photometric: BlackIsZero
      (273, 4, 1L, pixOff),         // StripOffsets
      (277, 3, 1L, 1L),             // SamplesPerPixel
      (278, 3, 1L, height.toLong),  // RowsPerStrip
      (279, 4, 1L, nPix.toLong))    // StripByteCounts
    artistBytes.foreach(ab => baseTags += ((315, 2, ab.length.toLong, artistOff)))
    if (gps) baseTags += ((0x8825, 4, 1L, gpsOff))
    val tags = baseTags.sortBy(_._1)
    w16(tags.length)
    tags.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) }
      else w32(value)
    }
    w32(0L) // no next IFD
    bos.toByteArray
  }
}
