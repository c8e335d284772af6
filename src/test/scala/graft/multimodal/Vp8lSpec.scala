package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (WebP lossless) codec: exact pixel round-trips through the
  * normal-Huffman literal path and every encoder-served transform
  * (subtract-green, predictor residuals, palette with bundling), plus
  * hand-crafted streams driving the decoder paths the encoder never
  * emits — LZ77 backrefs, the color cache, and the max-symbol
  * shortcut. */
class Vp8lSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      val r = (seed * 37 + x * 255 / math.max(1, w - 1)) % 256
      val g = (seed * 11 + y * 255 / math.max(1, h - 1)) % 256
      val b = (seed + x + y) % 256
      val a = 255 - ((x + y) % 17)
      img.setRGB(x, y, (a << 24) | (r << 16) | (g << 8) | b)
    })
    img
  }

  private def pixelsOf(img: java.awt.image.BufferedImage): Seq[Int] = {
    val a = new Array[Int](img.getWidth * img.getHeight)
    img.getRGB(0, 0, img.getWidth, img.getHeight, a, 0, img.getWidth): Unit
    a.toSeq
  }

  private def assertExact(src: java.awt.image.BufferedImage,
                          webp: Array[Byte]): Unit = {
    val out = Vp8l.decode(webp)
    assert(out.getWidth == src.getWidth && out.getHeight == src.getHeight)
    assert(pixelsOf(out) == pixelsOf(src))
  }

  test("literal path round-trips exactly (ARGB incl. alpha)") {
    assertExact(gradient(23, 17, 1), Vp8l.encode(gradient(23, 17, 1)))
    assertExact(gradient(1, 1, 2), Vp8l.encode(gradient(1, 1, 2)))
    assertExact(gradient(64, 3, 3), Vp8l.encode(gradient(64, 3, 3)))
  }

  test("subtract-green transform round-trips exactly") {
    val img = gradient(31, 19, 4)
    assertExact(img, Vp8l.encode(img, subtractGreen = true))
  }

  test("predictor transform (left residuals, block sub-image, edges) round-trips") {
    // 37x21 spans 3x2 predictor blocks at 16px — block lookup + both
    // edge rules (first row left, first column top) all execute
    val img = gradient(37, 21, 5)
    assertExact(img, Vp8l.encode(img, predictor = true))
  }

  test("palette transform round-trips at every bundling width") {
    def paletted(w: Int, h: Int, colors: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val pal = Array.tabulate(colors)(i =>
        0xff000000 | (i * 41 % 256 << 16) | (i * 73 % 256 << 8) | (i * 97 % 256))
      (0 until h).foreach(y => (0 until w).foreach { x =>
        img.setRGB(x, y, pal((x * 7 + y * 3) % colors))
      })
      img
    }
    // widthBits 3 (2 colors), 2 (4), 1 (16), 0 (200)
    Seq(2, 4, 16, 200).foreach { n =>
      val img = paletted(29, 11, n)
      assertExact(img, Vp8l.encode(img, paletteMode = true))
    }
  }

  test("webpDims agrees with the real decode for VP8L payloads") {
    val img = gradient(40, 25, 6)
    val webp = Vp8l.encode(img)
    assert(MediaQuality.dimsFromHeader(webp) == ((40, 25)))
  }

  test("transcode png -> webp is pixel-exact; cross-format dHash folds agree") {
    val img = gradient(28, 22, 8)
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val webp = Vp8l.encode(img)
    // both containers decode to the same pixels -> the perceptual
    // fold (dHash) is IDENTICAL, so a png and its webp re-render
    // land in one exact dedup group
    val hPng = ImageDedup.dHash64(Multimodal.ImageCodec.read(png))
    val hWebp = ImageDedup.dHash64(Multimodal.ImageCodec.read(webp))
    assert(hPng == hWebp)
  }

  // LSB-first writer for hand-crafted streams
  private final class W {
    private val bos = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = (0 until bits).foreach { k =>
      cur |= ((v >> k) & 1) << n
      n += 1
      if (n == 8) { bos.write(cur); cur = 0; n = 0 }
    }
    def putMsb(v: Int, bits: Int): Unit =
      (bits - 1 to 0 by -1).foreach(k => put((v >> k) & 1, 1))
    def bytes: Array[Byte] = { if (n > 0) { bos.write(cur); n = 0 }; bos.toByteArray }
  }

  /** Normal green code with lengths {0:1, 256:1} via the CL code and
    * the max-symbol shortcut, single-symbol red/blue/alpha/distance. */
  private def greenLz77Header(w: W): Unit = {
    w.put(0, 1) // normal code
    // CL lengths: symbol 1 -> 1 bit, symbol 18 -> 1 bit; order
    // [17,18,0,1,...]: position 1 = 18, position 3 = symbol 1 -> need 4
    w.put(0, 4) // num_code_lengths = 4
    w.put(0, 3) // pos 0: symbol 17 -> 0
    w.put(1, 3) // pos 1: symbol 18 -> 1
    w.put(0, 3) // pos 2: symbol 0 -> 0
    w.put(1, 3) // pos 3: symbol 1 -> 1
    // canonical CL code: 1 -> '0', 18 -> '1'
    w.put(1, 1)           // use max-symbol shortcut: it bounds CL
    w.put(0, 3)           // READS (4 here), not symbol positions
    w.put(2, 2)           // length_nbits = 2; max_symbol = 2 + 2 = 4
    w.put(0, 1)           // CL '0' -> symbol length 1 at green 0
    w.put(1, 1); w.put(127, 7) // CL '1' -> 18: 11+127 = 138 zeros
    w.put(1, 1); w.put(106, 7) // 18: 11+106 = 117 zeros (total 255)
    w.put(0, 1)           // length 1 at green 256
    // 4 CL reads consumed = max_symbol -> rest of the alphabet is 0
  }

  private def singleCode(w: W, sym: Int): Unit = {
    w.put(1, 1); w.put(0, 1); w.put(1, 1); w.put(sym, 8)
  }

  test("hand-crafted LZ77 backref stream decodes (direct distance)") {
    // 4x1 image: literal pixel then a 3-long copy at distance 1
    val w = new W
    w.put(0x2f, 8)
    w.put(3, 14); w.put(0, 14) // 4x1
    w.put(0, 1); w.put(0, 3)
    w.put(0, 1) // no transforms
    w.put(0, 1) // no cache
    w.put(0, 1) // no meta
    greenLz77Header(w)
    singleCode(w, 77)  // red
    singleCode(w, 33)  // blue
    singleCode(w, 255) // alpha
    singleCode(w, 13)  // distance prefix 13: offset 96, 5 extra bits
    // pixel 0: green '0' (literal 0; r/b/a from single codes, 0 bits)
    w.put(0, 1)
    // then green '1' = symbol 256 = length code 0 -> length 1... but a
    // 3-long copy needs length prefix 2 -> length 3. Symbol 256 is
    // prefix code 0 -> length 1; emit three 1-long copies instead
    (0 until 3).foreach { _ =>
      w.put(1, 1)        // green '1' -> symbol 256: length 1
      w.put(24, 5)       // distance extra bits: 96 + 24 + 1 = 121 -> direct 1
    }
    val img = Vp8l.decode(w.bytes)
    assert(img.getWidth == 4 && img.getHeight == 1)
    val expected = 0xff000000 | (77 << 16) | (0 << 8) | 33
    (0 until 4).foreach(x => assert(img.getRGB(x, 0) == expected, s"x=$x"))
  }

  test("hand-crafted color-cache stream decodes") {
    // 2x1: literal pixel inserted into a 1-bit cache, then a cache hit
    val w = new W
    w.put(0x2f, 8)
    w.put(1, 14); w.put(0, 14) // 2x1
    w.put(0, 1); w.put(0, 3)
    w.put(0, 1) // no transforms
    w.put(1, 1); w.put(1, 4) // color cache, 1 bit (2 slots)
    w.put(0, 1) // no meta
    // green alphabet 256+24+2 = 282: normal code {0:1, cacheSym:1}
    val pixel = 0xff000000 | (77 << 16) | 33
    val slot = ((0x1e35a7bd * pixel) >>> 31) & 1
    val cacheSym = 256 + 24 + slot
    // CL: {1:1, 18:1} as in greenLz77Header, max_symbol = cacheSym+1
    w.put(0, 1) // normal
    w.put(0, 4)
    w.put(0, 3); w.put(1, 3); w.put(0, 3); w.put(1, 3)
    w.put(1, 1) // use max-symbol: 5 CL reads (1 + three runs + 1)
    w.put(0, 3) // nbits = 2
    w.put(3, 2) // max_symbol = 2 + 3 = 5
    w.put(0, 1) // len 1 at green 0
    // zeros up to cacheSym via 18-runs (each run 11..138; keep the
    // remainder out of the 1..10 dead zone)
    var z = cacheSym - 1
    while (z > 0) {
      var take = math.min(z, 138)
      if (z - take > 0 && z - take < 11) take = z - 11
      w.put(1, 1); w.put(take - 11, 7)
      z -= take
    }
    w.put(0, 1) // len 1 at cacheSym
    singleCode(w, 77)  // red
    singleCode(w, 33)  // blue
    singleCode(w, 255) // alpha
    singleCode(w, 0)   // distance (unused)
    w.put(0, 1) // literal green 0 -> pixel inserted into cache
    w.put(1, 1) // cache symbol -> same pixel again
    val img = Vp8l.decode(w.bytes)
    assert(img.getRGB(0, 0) == pixel && img.getRGB(1, 0) == pixel)
  }

  test("lossy VP8 and truncated VP8L refuse loudly") {
    val img = gradient(10, 10, 7)
    val webp = Vp8l.encode(img)
    val torn = java.util.Arrays.copyOfRange(webp, 0, webp.length - 6)
    // fix the RIFF/chunk sizes so the walk reaches the torn stream
    intercept[IllegalArgumentException] {
      Vp8l.decode(java.util.Arrays.copyOfRange(webp, 20, torn.length))
    }
    val ex = intercept[IllegalArgumentException] {
      // a minimal lossy VP8 container
      val body = new Array[Byte](12)
      body(3) = 0x9d.toByte; body(4) = 0x01; body(5) = 0x2a
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = {
        bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
      }
      bos.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + body.length)
      bos.write("WEBP".getBytes("US-ASCII"))
      bos.write("VP8 ".getBytes("US-ASCII")); le32(body.length)
      bos.write(body)
      Vp8l.decode(bos.toByteArray)
    }
    assert(ex.getMessage.contains("lossy"))
  }
}
