package graft.multimodal

/** In-JVM GIF frame decoder — a direct LZW implementation replacing
  * the `javax.imageio` GIF reader on the video hot path. The ImageIO
  * reader rebuilds an XML metadata tree per frame for a single delay
  * field and re-walks the stream per `read(i)`; at 100 TB of crawl
  * video, GIF frame decode IS the dominant cost of the perceptual
  * dedup/decontamination/sampling faces, so the decode loop deserves
  * first-class code: one parse pass records every frame's span + GCE
  * timing, then each frame is one tight LZW loop into an int raster.
  *
  * Parity contract (unit-pinned against ImageIO): frames are returned
  * as the RAW frame rect (not composited — the ImageIO reader's
  * behavior, which every existing face was built on), with identical
  * RGB values; GCE delays match `frameDelayCs`. Transparency maps to
  * alpha 0. Interlaced frames de-interlace. Malformed streams refuse
  * loudly.
  */
private[multimodal] object GifDecode {

  final case class FrameInfo(left: Int, top: Int, width: Int, height: Int,
                             delayCs: Int, disposal: Int,
                             transparentIdx: Int, interlaced: Boolean,
                             palette: Array[Int], minCodeSize: Int,
                             dataOffset: Int)

  final class Gif(val payload: Array[Byte], val width: Int, val height: Int,
                  val frames: IndexedSeq[FrameInfo]) {
    def numFrames: Int = frames.length

    /** Decode frame i to its raw rect (TYPE_INT_RGB, or ARGB when a
      * transparent index is declared). */
    def frame(i: Int): java.awt.image.BufferedImage = {
      val f = frames(i)
      val indices = lzw(payload, f.dataOffset, f.minCodeSize,
        f.width * f.height)
      val hasAlpha = f.transparentIdx >= 0
      val img = new java.awt.image.BufferedImage(f.width, f.height,
        if (hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
        else java.awt.image.BufferedImage.TYPE_INT_RGB)
      val raster = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      val n = f.width * f.height
      if (!f.interlaced) {
        var p = 0
        while (p < n) {
          val idx = indices(p) & 0xff
          raster(p) =
            if (idx == f.transparentIdx) 0
            else f.palette(idx) | (if (hasAlpha) 0xff000000 else 0)
          p += 1
        }
      } else {
        // 4-pass interlace: rows 0,8,16.. then 4,12.. then 2,6.. then 1,3..
        var src = 0
        var pass = 0
        val starts = Array(0, 4, 2, 1)
        val steps = Array(8, 8, 4, 2)
        while (pass < 4) {
          var y = starts(pass)
          while (y < f.height) {
            var x = 0
            while (x < f.width) {
              val idx = indices(src) & 0xff
              raster(y * f.width + x) =
                if (idx == f.transparentIdx) 0
                else f.palette(idx) | (if (hasAlpha) 0xff000000 else 0)
              src += 1
              x += 1
            }
            y += steps(pass)
          }
          pass += 1
        }
      }
      img
    }

    /** Frame i decoded straight to a LUMINANCE plane — value-identical
      * to `Pixels.lumaPlane(frame(i))` (unit-pinned): palette colors map
      * through a 256-entry luma LUT (transparent index → ARGB 0 → luma
      * 0), so the hash faces skip the BufferedImage + packed-ARGB
      * round-trip entirely. At 100 TB of GIF video the decode-to-dHash
      * chain IS the job; this is its tightest in-JVM form. */
    def lumaFrame(i: Int): Array[Int] = {
      val f = frames(i)
      val indices = lzw(payload, f.dataOffset, f.minCodeSize,
        f.width * f.height)
      val lut = new Array[Int](f.palette.length)
      var j = 0
      while (j < lut.length) {
        val c = f.palette(j)
        lut(j) = (((c >> 16) & 0xff) * 299 + ((c >> 8) & 0xff) * 587 +
          (c & 0xff) * 114) / 1000
        j += 1
      }
      val n = f.width * f.height
      val out = new Array[Int](n)
      if (!f.interlaced) {
        var p = 0
        while (p < n) {
          val idx = indices(p) & 0xff
          out(p) = if (idx == f.transparentIdx) 0 else lut(idx)
          p += 1
        }
      } else {
        var src = 0
        var pass = 0
        val starts = Array(0, 4, 2, 1)
        val steps = Array(8, 8, 4, 2)
        while (pass < 4) {
          var y = starts(pass)
          while (y < f.height) {
            var x = 0
            while (x < f.width) {
              val idx = indices(src) & 0xff
              out(y * f.width + x) =
                if (idx == f.transparentIdx) 0 else lut(idx)
              src += 1
              x += 1
            }
            y += steps(pass)
          }
          pass += 1
        }
      }
      out
    }
  }

  def parse(b: Array[Byte]): Gif = {
    require(b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F',
      "payload is not a GIF")
    def u8(o: Int): Int = {
      require(o < b.length, s"GIF truncated at $o")
      b(o) & 0xff
    }
    def u16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    val w = u16(6)
    val h = u16(8)
    val lsdFlags = u8(10)
    var off = 13
    val gct: Array[Int] =
      if ((lsdFlags & 0x80) != 0) {
        val size = 2 << (lsdFlags & 7)
        val p = readPalette(b, off, size)
        off += size * 3
        p
      } else null
    val frames = scala.collection.mutable.ArrayBuffer.empty[FrameInfo]
    var delayCs = 0
    var disposal = 0
    var transparent = -1
    var done = false
    while (!done) {
      u8(off) match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension
          val label = u8(off + 1)
          if (label == 0xf9) { // GraphicControlExtension
            require(u8(off + 2) == 4, "GCE block size != 4")
            val flags = u8(off + 3)
            delayCs = u16(off + 4)
            disposal = (flags >> 2) & 7
            transparent = if ((flags & 1) != 0) u8(off + 6) else -1
          }
          // skip sub-blocks (GCE's included: 4-byte block + terminator)
          var p = off + 2
          var len = u8(p)
          while (len != 0) { p += 1 + len; len = u8(p) }
          off = p + 1
        case 0x2c => // image descriptor
          val left = u16(off + 1)
          val top = u16(off + 3)
          val fw = u16(off + 5)
          val fh = u16(off + 7)
          val flags = u8(off + 9)
          var p = off + 10
          val palette =
            if ((flags & 0x80) != 0) {
              val size = 2 << (flags & 7)
              val lp = readPalette(b, p, size)
              p += size * 3
              lp
            } else {
              require(gct != null, "frame without local or global palette")
              gct
            }
          val minCode = u8(p)
          require(minCode >= 1 && minCode <= 11, s"LZW min code $minCode")
          frames += FrameInfo(left, top, fw, fh, delayCs, disposal,
            transparent, (flags & 0x40) != 0, palette, minCode, p + 1)
          // GCE state applies to ONE following image
          delayCs = 0; disposal = 0; transparent = -1
          p += 1
          var len = u8(p)
          while (len != 0) { p += 1 + len; len = u8(p) }
          off = p + 1
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02x at $off")
      }
    }
    require(frames.nonEmpty, "GIF holds no image frames")
    new Gif(b, w, h, frames.toIndexedSeq)
  }

  private def readPalette(b: Array[Byte], off: Int, size: Int): Array[Int] = {
    require(off + size * 3 <= b.length, "truncated GIF palette")
    Array.tabulate(size)(i =>
      ((b(off + 3 * i) & 0xff) << 16) | ((b(off + 3 * i + 1) & 0xff) << 8) |
        (b(off + 3 * i + 2) & 0xff))
  }

  // ---- encoder (the fixture/sink hot path) ----

  /** Encode frames as one animated GIF when EVERY frame's distinct
    * colors fit a 256-entry palette (then the palette is exact and the
    * encode LOSSLESS — unlike the ImageIO writer's quantizer this
    * never silently approximates); None when any frame is too colorful
    * or dims vary (callers fall back to ImageIO). The ImageIO sequence
    * writer builds an XML metadata tree per frame and its LZW runs
    * through the generic plugin machinery; fixture encode is HALF the
    * cost of the video bench rows, so the writer gets the same
    * first-class treatment as the decoder. */
  def writeAnimated(frames: Seq[java.awt.image.BufferedImage],
                    delaysCs: Seq[Int]): Option[Array[Byte]] = {
    require(frames.nonEmpty && frames.length == delaysCs.length)
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    if (!frames.forall(f => f.getWidth == w && f.getHeight == h)) return None
    // per-frame exact palettes + pre-resolved palette INDEX per pixel —
    // the encoder's inner loops then never touch a boxed map (the old
    // HashMap[Integer, Integer] paid boxing + hashing PER PIXEL, and
    // fixture encode is half the cost of the video bench rows)
    val paletteArrays = new Array[Array[Int]](frames.length)
    val indexArrays = new Array[Array[Byte]](frames.length)
    var fi = 0
    while (fi < frames.length) {
      val px = Pixels.argbPlane(frames(fi))
      // open-addressed 24-bit-color -> insertion-order index map
      val cap = 1024 // power of two, max 256 entries => load <= 0.25
      val keys = new Array[Int](cap)
      java.util.Arrays.fill(keys, -1)
      val vals = new Array[Int](cap)
      val colors = new Array[Int](256)
      var palSize = 0
      val idx = new Array[Byte](px.length)
      var i = 0
      while (i < px.length) {
        val c = px(i) & 0xffffff
        var slot = (c * 0x9E3779B1) >>> 22 // top 10 bits of a Fibonacci mix
        var found = -1
        while (found == -1) {
          val k = keys(slot)
          if (k == c) found = vals(slot)
          else if (k == -1) {
            if (palSize == 256) return None
            keys(slot) = c
            vals(slot) = palSize
            colors(palSize) = c
            found = palSize
            palSize += 1
          } else slot = (slot + 1) & (cap - 1)
        }
        idx(i) = found.toByte
        i += 1
      }
      paletteArrays(fi) = java.util.Arrays.copyOf(colors, palSize)
      indexArrays(fi) = idx
      fi += 1
    }
    val bos = new java.io.ByteArrayOutputStream(w * h)
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    bos.write(0); bos.write(0); bos.write(0) // no GCT, bg, aspect
    fi = 0
    while (fi < frames.length) {
      val palette = paletteArrays(fi)
      val idx = indexArrays(fi)
      // GCE
      bos.write(0x21); bos.write(0xf9); bos.write(4)
      bos.write(0) // no disposal, no transparency
      w16(delaysCs(fi)); bos.write(0); bos.write(0)
      // image descriptor + local palette (padded to a power of two)
      var palBits = 1
      while ((1 << palBits) < palette.length) palBits += 1
      if (palBits < 1) palBits = 1
      bos.write(0x2c); w16(0); w16(0); w16(w); w16(h)
      bos.write(0x80 | (palBits - 1))
      val colors = java.util.Arrays.copyOf(palette, 1 << palBits)
      colors.foreach { c =>
        bos.write((c >> 16) & 0xff); bos.write((c >> 8) & 0xff)
        bos.write(c & 0xff)
      }
      val minCode = math.max(2, palBits)
      bos.write(minCode)
      writeLzw(bos, idx, minCode)
      bos.write(0) // sub-block terminator
      fi += 1
    }
    bos.write(0x3b)
    Some(bos.toByteArray)
  }

  /** Greedy LZW with decoder-synchronized width bookkeeping, chunked
    * into 255-byte sub-blocks. `idx` carries the pre-resolved palette
    * index per pixel; the dictionary is an open-addressed int map
    * (same greedy matches, same emitted codes, zero boxing). */
  private def writeLzw(out: java.io.ByteArrayOutputStream, idx: Array[Byte],
                       minCode: Int): Unit = {
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    val block = new Array[Byte](255)
    var blockLen = 0
    var bitBuf = 0L
    var bitCnt = 0
    // decoder-mirror state: the width the DECODER will use to read the
    // next code, tracked by replaying its add-after-second-read rule
    var decWidth = minCode + 1
    var decDict = eoiCode + 1
    var readsSinceClear = 0
    def flushByte(): Unit = {
      block(blockLen) = (bitBuf & 0xff).toByte
      bitBuf >>>= 8; bitCnt -= 8
      blockLen += 1
      if (blockLen == 255) {
        out.write(255); out.write(block, 0, 255); blockLen = 0
      }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += decWidth
      while (bitCnt >= 8) flushByte()
      readsSinceClear += 1
      if (code == clearCode) {
        decWidth = minCode + 1; decDict = eoiCode + 1; readsSinceClear = 0
      } else if (readsSinceClear >= 2 && decDict < 4096) {
        decDict += 1
        if (decDict == (1 << decWidth) && decWidth < 12) decWidth += 1
      }
    }
    // encoder dictionary: (prefixCode << 8 | colorIndex) -> code, as an
    // open-addressed int map (keys are < 2^20, so -1 marks empty)
    val cap = 16384 // power of two; <= 4096 - 258 entries => load < 0.25
    val dictKeys = new Array[Int](cap)
    java.util.Arrays.fill(dictKeys, -1)
    val dictVals = new Array[Int](cap)
    def dictGet(key: Int): Int = {
      var slot = (key * 0x9E3779B1) >>> 18
      while (true) {
        val k = dictKeys(slot)
        if (k == key) return dictVals(slot)
        if (k == -1) return -1
        slot = (slot + 1) & (cap - 1)
      }
      -1
    }
    def dictPut(key: Int, v: Int): Unit = {
      var slot = (key * 0x9E3779B1) >>> 18
      while (dictKeys(slot) != -1) slot = (slot + 1) & (cap - 1)
      dictKeys(slot) = key
      dictVals(slot) = v
    }
    var nextCode = eoiCode + 1
    emit(clearCode)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val nxt = idx(i) & 0xff
      val key = (cur << 8) | nxt
      val hit = dictGet(key)
      if (hit != -1) cur = hit
      else {
        emit(cur)
        if (nextCode < 4096) {
          dictPut(key, nextCode)
          nextCode += 1
        } else {
          emit(clearCode)
          java.util.Arrays.fill(dictKeys, -1)
          nextCode = eoiCode + 1
        }
        cur = nxt
      }
      i += 1
    }
    emit(cur)
    emit(eoiCode)
    if (bitCnt > 0) { bitCnt = 8; flushByte() }
    if (blockLen > 0) { out.write(blockLen); out.write(block, 0, blockLen) }
  }

  /** GIF-variant LZW: variable code width from `minCodeSize`+1 up to
    * 12 bits, clear/EOI codes, dictionary rebuilt on clear. Reads the
    * sub-block chain starting at `off`; emits exactly `expected`
    * indices (extra data ignored, shortfall refuses). */
  private def lzw(b: Array[Byte], off: Int, minCodeSize: Int,
                  expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    val clearCode = 1 << minCodeSize
    val eoiCode = clearCode + 1
    // dictionary as prefix links: suffix byte + prefix code per entry
    val maxEntries = 4096
    val prefix = new Array[Short](maxEntries)
    val suffix = new Array[Byte](maxEntries)
    val stack = new Array[Byte](maxEntries + 1)
    var dictSize = eoiCode + 1
    var codeWidth = minCodeSize + 1
    var prevCode = -1
    // bit reader over sub-blocks
    var blockOff = off
    var blockLen = b(blockOff) & 0xff
    var dataPos = blockOff + 1
    var dataEnd = dataPos + blockLen
    var bitBuf = 0L
    var bitCnt = 0
    var finished = false
    def fill(): Boolean = {
      while (bitCnt < codeWidth) {
        if (dataPos >= dataEnd) {
          blockOff = dataEnd
          require(blockOff < b.length, "GIF LZW data truncated")
          blockLen = b(blockOff) & 0xff
          if (blockLen == 0) return false
          dataPos = blockOff + 1
          dataEnd = dataPos + blockLen
          require(dataEnd <= b.length, "GIF LZW sub-block truncated")
        }
        bitBuf |= (b(dataPos) & 0xffL) << bitCnt
        dataPos += 1
        bitCnt += 8
      }
      true
    }
    var firstOfPrev = 0
    while (!finished && outPos < expected) {
      if (!fill()) {
        finished = true
      } else {
        val code = (bitBuf & ((1L << codeWidth) - 1)).toInt
        bitBuf >>>= codeWidth
        bitCnt -= codeWidth
        if (code == clearCode) {
          dictSize = eoiCode + 1
          codeWidth = minCodeSize + 1
          prevCode = -1
        } else if (code == eoiCode) {
          finished = true
        } else {
          var sp = 0
          var cur = code
          if (code >= dictSize) {
            // KwKwK case: emit prev string + its first byte
            require(prevCode >= 0 && code == dictSize,
              s"LZW code $code beyond dictionary $dictSize")
            stack(sp) = firstOfPrev.toByte; sp += 1
            cur = prevCode
          }
          while (cur >= clearCode + 2) {
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur)
          }
          require(cur < clearCode, s"LZW chain ended at control code $cur")
          val first = cur
          stack(sp) = cur.toByte; sp += 1
          // pop in reverse
          while (sp > 0 && outPos < expected) {
            sp -= 1
            out(outPos) = stack(sp); outPos += 1
          }
          if (prevCode >= 0 && dictSize < maxEntries) {
            prefix(dictSize) = prevCode.toShort
            suffix(dictSize) = first.toByte
            dictSize += 1
            if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prevCode = code
          firstOfPrev = first
        }
      }
    }
    require(outPos == expected,
      s"GIF frame decoded $outPos of $expected pixels")
    out
  }
}
