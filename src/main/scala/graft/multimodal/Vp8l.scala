package graft.multimodal

/** VP8L — WebP LOSSLESS pixel decode, in-JVM (RFC 9649): the #2 web
  * image format's lossless form decodes to real pixels with no native
  * codec, so WebP joins the image faces (perceptual dedup, quality
  * gates, feature extraction, paired curation) the way MJPEG joined
  * the video faces. Lossy VP8 frames still refuse loudly — their
  * transform/loop-filter pipeline is a genuine codec the JDK lacks.
  *
  * Decoder coverage: LSB-first bit stream, simple and normal
  * (code-length-coded) Huffman codes incl. the max-symbol shortcut,
  * color cache, meta-Huffman block groups, LZ77 backward references
  * (direct + plane-code distances), and all four transforms —
  * PREDICTOR (14 modes), COLOR, SUBTRACT_GREEN, COLOR_INDEXING (incl.
  * sub-byte pixel bundling) — applied in reverse order.
  *
  * Encoder (fixture/sink face): literal pixels through NORMAL Huffman
  * codes (canonical all-8-bit literal codes transmitted via the
  * code-length code with 16/18 repeats), optional SUBTRACT_GREEN, so
  * every fixture exercises the decoder's real Huffman machinery;
  * round-trips are exact by construction (lossless).
  *
  * The plane-code distance table transcribes RFC 9649 §4.2.2's
  * neighbor list; self-made fixtures and units exercise direct
  * distances (the encoder never emits plane codes), foreign files
  * exercise the table.
  */
object Vp8l {

  // ---- LSB-first bit reader ----
  private final class Br(val b: Array[Byte], start: Int) {
    private var pos = start
    private var bitBuf = 0L
    private var bitCnt = 0
    def bits(n: Int): Int = {
      require(n >= 0 && n <= 24, s"bits($n)")
      while (bitCnt < n) {
        require(pos < b.length, "VP8L stream truncated")
        bitBuf |= (b(pos) & 0xffL) << bitCnt
        pos += 1
        bitCnt += 8
      }
      val v = (bitBuf & ((1L << n) - 1)).toInt
      bitBuf >>>= n
      bitCnt -= n
      v
    }
    def bit(): Int = bits(1)
  }

  // ---- canonical Huffman ----
  private sealed trait HCode { def read(br: Br): Int }
  /** Simple 1-symbol code: reads consume 0 bits. */
  private final class HSingle(s: Int) extends HCode {
    def read(br: Br): Int = s
  }
  /** Simple 2-symbol code: the FIRST-read symbol owns codeword '0'
    * (spec order, NOT canonical numeric order). */
  private final class HPair(s0: Int, s1: Int) extends HCode {
    def read(br: Br): Int = if (br.bit() == 0) s0 else s1
  }

  /** Decode table: flat (code -> symbol) walk bit-by-bit via the
    * canonical tree encoded as two arrays. */
  private final class HTree(lengths: Array[Int]) extends HCode {
    // canonical assignment: sort symbols by (length, symbol)
    private val maxLen = if (lengths.isEmpty) 0 else lengths.max
    require(maxLen <= 15, s"Huffman code length $maxLen > 15")
    // single-symbol code: 0 bits
    val single: Int = {
      val nz = lengths.indices.filter(lengths(_) > 0)
      if (nz.length == 1) nz.head else -1
    }
    private val (firstCode, firstSym, symbols) = {
      if (single >= 0) (Array.empty[Int], Array.empty[Int], Array.empty[Int])
      else {
        val count = new Array[Int](maxLen + 1)
        lengths.foreach(l => if (l > 0) count(l) += 1)
        var code = 0
        val first = new Array[Int](maxLen + 2)
        val fsym = new Array[Int](maxLen + 2)
        var total = 0
        var l = 1
        while (l <= maxLen) {
          first(l) = code
          fsym(l) = total
          code = (code + count(l)) << 1
          total += count(l)
          l += 1
        }
        fsym(maxLen + 1) = total
        require((code >> 1) == (1 << maxLen) || total == 0,
          "Huffman code lengths are not complete (Kraft violation)")
        val syms = new Array[Int](total)
        val next = fsym.clone()
        lengths.indices.foreach { s =>
          val ln = lengths(s)
          if (ln > 0) { syms(next(ln)) = s; next(ln) += 1 }
        }
        (first, fsym, syms)
      }
    }
    def read(br: Br): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code << 1) | br.bit()
        val cnt = (if (l + 1 < firstSym.length) firstSym(l + 1) else symbols.length) - firstSym(l)
        if (cnt > 0 && code - firstCode(l) < cnt)
          return symbols(firstSym(l) + (code - firstCode(l)))
        l += 1
      }
      throw new IllegalArgumentException("invalid Huffman code in VP8L stream")
    }
  }

  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readCode(br: Br, alphabetSize: Int): HCode = {
    if (br.bit() == 1) {
      // simple code: 1 or 2 symbols
      val numSym = br.bit() + 1
      val first8 = br.bit()
      val s0 = if (first8 == 1) br.bits(8) else br.bit()
      require(s0 < alphabetSize, s"simple-code symbol $s0 out of alphabet")
      if (numSym == 2) {
        val s1 = br.bits(8)
        require(s1 < alphabetSize && s1 != s0, s"simple-code symbol $s1")
        new HPair(s0, s1)
      } else new HSingle(s0)
    } else {
      val numCl = br.bits(4) + 4
      require(numCl <= ClOrder.length, s"num code lengths $numCl")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = new HTree(clLengths)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (br.bit() == 1) {
          val nbits = 2 + 2 * br.bits(3)
          2 + br.bits(nbits)
        } else alphabetSize
      var sym = 0
      var prev = 8
      while (sym < alphabetSize) {
        if (maxSymbol == 0) { sym = alphabetSize }
        else {
          maxSymbol -= 1
          val cl = clTree.read(br)
          if (cl < 16) {
            lengths(sym) = cl
            sym += 1
            if (cl != 0) prev = cl
          } else {
            val (repeat, fill) = cl match {
              case 16 => (3 + br.bits(2), prev)
              case 17 => (3 + br.bits(3), 0)
              case 18 => (11 + br.bits(7), 0)
              case x => throw new IllegalArgumentException(s"CL symbol $x")
            }
            require(sym + repeat <= alphabetSize,
              "code-length repeat overruns the alphabet")
            var k = 0
            while (k < repeat) { lengths(sym) = fill; sym += 1; k += 1 }
          }
        }
      }
      new HTree(lengths)
    }
  }

  private def prefixValue(code: Int, br: Br): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** RFC 9649 §4.2.2 plane-code neighbor list: (dx, dy) for distance
    * codes 1..120 (code 0 unused — codes are 1-based). */
  private val PlaneCodes: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3), (6, 7), (-6, 7),
    (8, 4), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
  require(PlaneCodes.length == 120, s"plane-code table ${PlaneCodes.length}")

  private final case class Transform(kind: Int, bits: Int,
                                     data: Array[Int], xsize: Int)

  /** Decode a VP8L payload (the full RIFF container or a bare VP8L
    * chunk body) to an ARGB BufferedImage. */
  def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val (body, _) = vp8lBody(payload)
    val br = new Br(body, 0)
    require(br.bits(8) == 0x2f, "VP8L signature byte missing")
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit(): Unit // alpha hint
    require(br.bits(3) == 0, "unknown VP8L version")
    val argb = decodeImageStream(br, w, h, level0 = true)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, w, h, argb, 0, w)
    img
  }

  /** (chunk body bytes, is-container): accepts a whole RIFF/WEBP or a
    * raw VP8L stream starting at the signature. */
  private def vp8lBody(payload: Array[Byte]): (Array[Byte], Boolean) =
    if (MediaScrub.isRiffWebp(payload)) {
      var off = 12
      while (off + 8 <= payload.length) {
        val id = new String(payload, off, 4, "US-ASCII")
        val len = (payload(off + 4) & 0xff) | ((payload(off + 5) & 0xff) << 8) |
          ((payload(off + 6) & 0xff) << 16) | ((payload(off + 7) & 0xff) << 24)
        if (id == "VP8L")
          return (java.util.Arrays.copyOfRange(payload, off + 8,
            off + 8 + len), true)
        if (id == "VP8 ") throw new IllegalArgumentException(
          "lossy VP8 WebP needs a decoder the JDK lacks (VP8L decodes)")
        off += 8 + len + (len & 1)
      }
      throw new IllegalArgumentException("WebP container has no VP8L chunk")
    } else (payload, false)

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  /** The recursive image-stream decode: transforms (level 0 only),
    * color cache, meta-Huffman (level 0 only), pixel loop, inverse
    * transforms. Returns ARGB pixels row-major. */
  private def decodeImageStream(br: Br, xsize0: Int, ysize: Int,
                                level0: Boolean): Array[Int] = {
    var xsize = xsize0
    // transforms (level 0 only)
    val transforms = scala.collection.mutable.ArrayBuffer.empty[Transform]
    if (level0) {
      val seen = scala.collection.mutable.Set.empty[Int]
      while (br.bit() == 1) {
        val kind = br.bits(2)
        require(!seen(kind), s"transform $kind appears twice")
        seen += kind
        kind match {
          case 0 | 1 => // PREDICTOR / COLOR: block-coded sub-image
            val bits = br.bits(3) + 2
            val data = decodeImageStream(br,
              subSize(xsize, bits), subSize(ysize, bits), level0 = false)
            transforms += Transform(kind, bits, data, xsize)
          case 2 => // SUBTRACT_GREEN
            transforms += Transform(2, 0, Array.emptyIntArray, xsize)
          case 3 => // COLOR_INDEXING
            val paletteSize = br.bits(8) + 1
            val deltas = decodeImageStream(br, paletteSize, 1, level0 = false)
            // palette entries are delta-coded component-wise
            val palette = new Array[Int](paletteSize)
            var prev = 0
            var i = 0
            while (i < paletteSize) {
              palette(i) = addPixels(prev, deltas(i))
              prev = palette(i)
              i += 1
            }
            val widthBits =
              if (paletteSize > 16) 0
              else if (paletteSize > 4) 1
              else if (paletteSize > 2) 2
              else 3
            transforms += Transform(3, widthBits, palette, xsize)
            if (widthBits > 0) xsize = subSize(xsize, widthBits)
          case k => throw new IllegalArgumentException(s"transform kind $k")
        }
      }
    }
    // color cache
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      require(cb >= 1 && cb <= 11, s"color cache bits $cb")
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta-Huffman (level 0 only)
    val (metaBits, metaImage, numGroups) =
      if (level0 && br.bit() == 1) {
        val mb = br.bits(3) + 2
        val mImg = decodeImageStream(br, subSize(xsize, mb),
          subSize(ysize, mb), level0 = false)
        val n = mImg.map(p => ((p >> 8) & 0xffff) + 1).max
        (mb, mImg, n)
      } else (0, Array.emptyIntArray, 1)
    // Huffman groups: 5 codes each
    val groups = Array.fill(numGroups) {
      val green = readCode(br, 256 + 24 + cacheSize)
      val red = readCode(br, 256)
      val blue = readCode(br, 256)
      val alpha = readCode(br, 256)
      val dist = readCode(br, 40)
      (green, red, blue, alpha, dist)
    }
    // pixel loop
    val out = new Array[Int](xsize * ysize)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(p: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * p) >>> (32 - cacheBits)).toInt & (cacheSize - 1)) = p
    var pos = 0
    val total = xsize * ysize
    while (pos < total) {
      val x = pos % xsize
      val y = pos / xsize
      val g =
        if (metaBits == 0) groups(0)
        else {
          val mw = subSize(xsize, metaBits)
          val mp = metaImage((y >> metaBits) * mw + (x >> metaBits))
          groups((mp >> 8) & 0xffff)
        }
      val s = g._1.read(br)
      if (s < 256) {
        val red = g._2.read(br)
        val blue = g._3.read(br)
        val alpha = g._4.read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        cacheInsert(p)
        pos += 1
      } else if (s < 256 + 24) {
        val length = prefixValue(s - 256, br)
        val distCode = prefixValue(g._5.read(br), br)
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = PlaneCodes(distCode - 1)
            val d = dy * xsize + dx
            if (d >= 1) d else 1
          }
        require(dist0 <= pos, s"LZ77 distance $dist0 reaches before start")
        require(pos + length <= total, "LZ77 copy overruns the image")
        var k = 0
        while (k < length) {
          out(pos) = out(pos - dist0)
          cacheInsert(out(pos))
          pos += 1
          k += 1
        }
      } else {
        require(cache != null, "cache reference without a color cache")
        val p = cache(s - 256 - 24)
        out(pos) = p
        pos += 1
      }
    }
    // inverse transforms, reverse order
    var pixels = out
    var curX = xsize
    transforms.reverseIterator.foreach { t =>
      t.kind match {
        case 3 =>
          val palette = t.data
          val full = t.xsize
          if (t.bits > 0) {
            val perByte = 1 << t.bits
            val mask = (1 << (8 >> t.bits)) - 1
            val unpacked = new Array[Int](full * ysize)
            var y = 0
            while (y < ysize) {
              var x = 0
              while (x < full) {
                val packed = (pixels(y * curX + (x >> t.bits)) >> 8) & 0xff
                val idx = (packed >> ((x & (perByte - 1)) * (8 >> t.bits))) & mask
                require(idx < palette.length, s"palette index $idx out of range")
                unpacked(y * full + x) = palette(idx)
                x += 1
              }
              y += 1
            }
            pixels = unpacked
            curX = full
          } else {
            var i = 0
            while (i < pixels.length) {
              val idx = (pixels(i) >> 8) & 0xff
              require(idx < palette.length, s"palette index $idx out of range")
              pixels(i) = palette(idx)
              i += 1
            }
          }
        case 2 =>
          var i = 0
          while (i < pixels.length) {
            val p = pixels(i)
            val gC = (p >> 8) & 0xff
            val r = ((p >> 16) + gC) & 0xff
            val b = (p + gC) & 0xff
            pixels(i) = (p & 0xff00ff00) | (r << 16) | b
            i += 1
          }
        case 1 => // COLOR
          val mw = subSize(curX, t.bits)
          var y = 0
          while (y < ysize) {
            var x = 0
            while (x < curX) {
              val e = t.data((y >> t.bits) * mw + (x >> t.bits))
              val g2r = (e >> 16) & 0xff  // stored in red channel
              val g2b = (e >> 8) & 0xff   // green channel
              val r2b = e & 0xff          // blue channel
              val p = pixels(y * curX + x)
              val gC = (p >> 8) & 0xff
              var r = (p >> 16) & 0xff
              var b = p & 0xff
              r = (r + ((g2r.toByte * gC.toByte) >> 5)) & 0xff
              b = (b + ((g2b.toByte * gC.toByte) >> 5)) & 0xff
              b = (b + ((r2b.toByte * r.toByte) >> 5)) & 0xff
              pixels(y * curX + x) = (p & 0xff00ff00) | (r << 16) | b
              x += 1
            }
            y += 1
          }
        case 0 => // PREDICTOR
          val mw = subSize(curX, t.bits)
          var y = 0
          while (y < ysize) {
            var x = 0
            while (x < curX) {
              val i = y * curX + x
              val pred =
                if (x == 0 && y == 0) 0xff000000
                else if (y == 0) pixels(i - 1)      // first row: left
                else if (x == 0) pixels(i - curX)   // first col: top
                else {
                  val mode = (t.data((y >> t.bits) * mw + (x >> t.bits)) >> 8) & 0xff
                  val l = pixels(i - 1)
                  val tp = pixels(i - curX)
                  val tl = pixels(i - curX - 1)
                  val tr = if (x + 1 < curX) pixels(i - curX + 1) else pixels(i - curX)
                  predict(mode, l, tp, tl, tr)
                }
              pixels(i) = addPixels(pred, pixels(i))
              x += 1
            }
            y += 1
          }
      }
    }
    pixels
  }

  /** Component-wise modular pixel addition. */
  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8
    val bb = (((a & 0xff) + (b & 0xff)) >> 1)
    aa | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select
        def comp(p: Int, s: Int) = (p >>> s) & 0xff
        var pl = 0; var pt = 0
        Seq(24, 16, 8, 0).foreach { s =>
          val pAll = comp(l, s) + comp(t, s) - comp(tl, s)
          pl += math.abs(pAll - comp(l, s))
          pt += math.abs(pAll - comp(t, s))
        }
        if (pl < pt) l else t
      case 12 => // ClampAddSubtractFull
        def f(s: Int) = clamp255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) -
          ((tl >>> s) & 0xff))
        (f(24) << 24) | (f(16) << 16) | (f(8) << 8) | f(0)
      case 13 => // ClampAddSubtractHalf
        val a = avg2(l, t)
        def f(s: Int) = {
          val av = (a >>> s) & 0xff
          val sub = (tl >>> s) & 0xff
          clamp255(av + (av - sub) / 2)
        }
        (f(24) << 24) | (f(16) << 16) | (f(8) << 8) | f(0)
      case m => throw new IllegalArgumentException(s"predictor mode $m")
    }

  // ---- encoder (fixture/sink face) ----

  private final class Bw {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var k = 0
      while (k < bits) {
        cur |= ((v >> k) & 1) << n
        n += 1
        if (n == 8) { bos.write(cur); cur = 0; n = 0 }
        k += 1
      }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { bos.write(cur); cur = 0; n = 0 }
      bos.toByteArray
    }
  }

  /** Write one "all literals, 8-bit canonical codes" Huffman code: the
    * normal-code path (CL tree with 16/18 repeats) for a 256-literal
    * alphabet where symbol i's codeword is i itself. */
  private def writeLiteralCode(w: Bw, alphabetSize: Int): Unit = {
    w.put(0, 1) // normal code
    // CL lengths: symbol 8 -> 1 bit, 16 -> 2 bits, 18 -> 2 bits
    // kCodeLengthCodeOrder positions: 17@0, 18@1, 0..5@2-7, 16@8, 6@9,
    // 7@10, 8@11 -> need 12 entries
    w.put(12 - 4, 4)
    val cl = Map(1 -> 2, 8 -> 2, 11 -> 1) // position -> 3-bit length
    var i = 0
    while (i < 12) { w.put(cl.getOrElse(i, 0), 3); i += 1 }
    w.put(0, 1) // no max-symbol shortcut
    // canonical CL code: lengths {8:1, 16:2, 18:2} ->
    // codes: 8 = "0", 16 = "10", 18 = "11" (MSB-first read)
    def sym8(): Unit = w.put(0, 1)
    def sym16(extra: Int): Unit = { w.put(1, 1); w.put(0, 1); w.put(extra, 2) }
    def sym18(extra: Int): Unit = { w.put(1, 1); w.put(1, 1); w.put(extra, 7) }
    sym8() // symbol 0: length 8
    // 255 more at length 8: 16 repeats prev 3+extra(0..3): 42x6 + 1x3
    var left = 255
    while (left >= 6) { sym16(3); left -= 6 }
    while (left >= 3) { sym16(left - 3); left -= left }
    require(left == 0, s"repeat remainder $left")
    // zero-fill the rest of the alphabet
    var zeros = alphabetSize - 256
    while (zeros > 0) {
      val take = math.min(zeros, 11 + 127)
      if (take >= 11) { sym18(take - 11); zeros -= take }
      else { sym8(); zeros -= 1 } // unreachable for our alphabets
    }
  }

  /** Write a single-symbol simple code (0 bits per read). */
  private def writeSingleCode(w: Bw, symbol: Int): Unit = {
    w.put(1, 1) // simple
    w.put(0, 1) // one symbol
    w.put(1, 1) // 8-bit first symbol
    w.put(symbol, 8)
  }

  /** [5 literal codes + pixel literals]: the shared image-stream body
    * every encoder mode (and every transform sub-image) uses. */
  private def writeLiteralImage(bw: Bw, pixels: Array[Int]): Unit = {
    writeLiteralCode(bw, 256 + 24)
    writeLiteralCode(bw, 256)
    writeLiteralCode(bw, 256)
    writeLiteralCode(bw, 256)
    writeSingleCode(bw, 0)
    // canonical all-8-bit code: symbol i's codeword is i, MSB-first;
    // the LSB-first writer needs the bits reversed
    def putCode(sym: Int): Unit = {
      var k = 7
      while (k >= 0) { bw.put((sym >> k) & 1, 1); k -= 1 }
    }
    pixels.foreach { p =>
      putCode((p >> 8) & 0xff)   // green
      putCode((p >> 16) & 0xff)  // red
      putCode(p & 0xff)          // blue
      putCode((p >>> 24) & 0xff) // alpha
    }
  }

  /** A transform sub-image stream: [no cache][literal image]. */
  private def writeSubImage(bw: Bw, pixels: Array[Int]): Unit = {
    bw.put(0, 1) // no color cache
    writeLiteralImage(bw, pixels)
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) - (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  /** Encode an ARGB image as a VP8L stream inside a RIFF/WEBP
    * container — lossless by construction. Modes (exercising the
    * decoder's real machinery, not just the literal path):
    * `subtractGreen` adds that transform; `predictor` encodes
    * left-prediction residuals behind a predictor transform
    * (block-coded sub-image, edge rules); `paletteMode` emits a
    * COLOR_INDEXING palette with delta coding and sub-byte pixel
    * bundling (requires <= 256 distinct colors). */
  def encode(img: java.awt.image.BufferedImage,
             subtractGreen: Boolean = false,
             predictor: Boolean = false,
             paletteMode: Boolean = false): Array[Byte] = {
    require(Seq(subtractGreen, predictor, paletteMode).count(identity) <= 1,
      "encoder modes are exclusive")
    val w = img.getWidth
    val h = img.getHeight
    require(w <= 16384 && h <= 16384, "VP8L dims cap at 16384")
    val argb = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, argb, 0, w): Unit
    val bw = new Bw
    bw.put(0x2f, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1) // no alpha hint
    bw.put(0, 3) // version
    if (subtractGreen) {
      bw.put(1, 1); bw.put(2, 2) // SUBTRACT_GREEN
      bw.put(0, 1) // no more transforms
      bw.put(0, 1) // no color cache
      bw.put(0, 1) // no meta-Huffman
      writeLiteralImage(bw, argb.map { p =>
        val gC = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - gC) & 0xff
        val b = ((p & 0xff) - gC) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      })
    } else if (predictor) {
      val bits = 4 // 16x16 blocks
      bw.put(1, 1); bw.put(0, 2) // PREDICTOR
      bw.put(bits - 2, 3)
      val mw = subSize(w, bits)
      val mh = subSize(h, bits)
      // every block predicts LEFT (mode 1), stored in the green channel
      writeSubImage(bw, Array.fill(mw * mh)(0xff000100))
      bw.put(0, 1) // no more transforms
      bw.put(0, 1) // no color cache
      bw.put(0, 1) // no meta-Huffman
      val residuals = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) argb(i - 1)
            else if (x == 0) argb(i - w)
            else argb(i - 1) // mode 1 = left
          residuals(i) = subPixels(argb(i), pred)
          x += 1
        }
        y += 1
      }
      writeLiteralImage(bw, residuals)
    } else if (paletteMode) {
      val distinct = argb.distinct
      require(distinct.length <= 256,
        s"palette mode needs <= 256 colors, got ${distinct.length}")
      val palette = distinct.sorted
      val index = palette.zipWithIndex.toMap
      bw.put(1, 1); bw.put(3, 2) // COLOR_INDEXING
      bw.put(palette.length - 1, 8)
      // palette entries delta-coded component-wise
      val deltas = new Array[Int](palette.length)
      var prev = 0
      palette.indices.foreach { i =>
        deltas(i) = subPixels(palette(i), prev)
        prev = palette(i)
      }
      writeSubImage(bw, deltas)
      bw.put(0, 1) // no more transforms
      bw.put(0, 1) // no color cache
      bw.put(0, 1) // no meta-Huffman
      val widthBits =
        if (palette.length > 16) 0
        else if (palette.length > 4) 1
        else if (palette.length > 2) 2
        else 3
      val packedW = if (widthBits > 0) subSize(w, widthBits) else w
      val bundled = new Array[Int](packedW * h)
      val perByte = 1 << widthBits
      val bpp = 8 >> widthBits
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val idx = index(argb(y * w + x))
          if (widthBits == 0) bundled(y * packedW + x) = 0xff000000 | (idx << 8)
          else {
            val slot = y * packedW + (x >> widthBits)
            val shift = (x & (perByte - 1)) * bpp
            val gPrev = (bundled(slot) >> 8) & 0xff
            bundled(slot) = 0xff000000 | ((gPrev | (idx << shift)) << 8)
          }
          x += 1
        }
        y += 1
      }
      writeLiteralImage(bw, bundled)
    } else {
      bw.put(0, 1) // no transforms
      bw.put(0, 1) // no color cache
      bw.put(0, 1) // no meta-Huffman
      writeLiteralImage(bw, argb)
    }
    val body = bw.toBytes
    // RIFF/WEBP wrap
    val pad = body.length & 1
    val riffSize = 4 + 8 + body.length + pad
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(riffSize)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII")); le32(body.length)
    out.write(body)
    if (pad == 1) out.write(0)
    out.toByteArray
  }
}
