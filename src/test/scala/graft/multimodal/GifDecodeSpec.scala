package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The in-JVM LZW GIF decoder vs the ImageIO reader it replaces:
  * pixel-exact parity on real encoder output, GCE delay parity,
  * LZW edge cases (dictionary growth to 12 bits, KwKwK), interlace,
  * transparency, and loud refusals. */
class GifDecodeSpec extends AnyFunSuite {

  private def frames(n: Int, w: Int, h: Int, seed: Int) =
    (0 until n).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val g = (seed * 31 + f * 47 + x * 3 + y * 5) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      img
    }

  test("pixel-exact parity with ImageIO across frames and delays") {
    val fs = frames(4, 33, 21, 3)
    val gifBytes = Multimodal.GifCodec.writeAnimatedVfr(fs, Seq(7, 10, 2, 25))
    val mine = GifDecode.parse(gifBytes)
    Multimodal.GifCodec.withReader(gifBytes) { reader =>
      val n = reader.getNumImages(true)
      assert(mine.numFrames == n && n == 4)
      (0 until n).foreach { i =>
        val a = reader.read(i)
        val b = mine.frame(i)
        assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight, s"i=$i")
        (0 until a.getHeight).foreach(y => (0 until a.getWidth).foreach { x =>
          assert((a.getRGB(x, y) & 0xffffff) == (b.getRGB(x, y) & 0xffffff),
            s"i=$i ($x,$y)")
        })
        assert(Multimodal.GifCodec.frameDelayCs(reader, i) ==
          mine.frames(i).delayCs, s"delay i=$i")
      }
    }
  }

  test("lumaFrame parity: direct-to-luma decode equals lumaPlane(frame)") {
    val fs = frames(3, 29, 18, 11)
    val gifBytes = Multimodal.GifCodec.writeAnimatedVfr(fs, Seq(10, 10, 10))
    val gif = GifDecode.parse(gifBytes)
    (0 until gif.numFrames).foreach { i =>
      assert(gif.lumaFrame(i).toSeq ==
        Pixels.lumaPlane(gif.frame(i)).toSeq, s"frame $i")
    }
    // and through the VideoCodec seam (the hash faces' entry point)
    VideoCodec.withFrames(gifBytes) { v =>
      (0 until v.numFrames).foreach { i =>
        val (lum, fw, fh) = v.lumaFrame(i)
        val img = v.frame(i)
        assert(fw == img.getWidth && fh == img.getHeight)
        assert(lum.toSeq == Pixels.lumaPlane(img).toSeq, s"seam frame $i")
      }
    }
  }

  test("a busy high-entropy frame exercises dictionary growth to wide codes") {
    // id-seeded noise maxes the palette and forces the LZW dictionary
    // through its width escalations (and typically a mid-stream clear)
    val img = new java.awt.image.BufferedImage(120, 90,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = 12345
    (0 until 90).foreach(y => (0 until 120).foreach { x =>
      s = s * 1103515245 + 12345
      val g = (s >>> 16) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    })
    val gifBytes = Multimodal.GifCodec.writeAnimatedVfr(Seq(img), Seq(5))
    val mine = GifDecode.parse(gifBytes).frame(0)
    Multimodal.GifCodec.withReader(gifBytes) { reader =>
      val ref = reader.read(0)
      (0 until 90).foreach(y => (0 until 120).foreach { x =>
        assert((ref.getRGB(x, y) & 0xffffff) == (mine.getRGB(x, y) & 0xffffff),
          s"($x,$y)")
      })
    }
  }

  test("the video seam produces identical fps folds through the new decoder") {
    val fs = frames(5, 24, 20, 9)
    val gifBytes = Multimodal.GifCodec.writeAnimated(fs, delayCs = 10)
    // the fold only sees decoded pixels + delays; with the decoder
    // swapped in, a straight re-fingerprint must match the AVI render
    // of the same timeline (pixel parity was proven above; this pins
    // the seam wiring end-to-end)
    val avi = AviCodec.writeMjpeg(fs, usPerFrame = 100000L)
    val fGif = VideoDedup.fingerprint64AtFps(gifBytes, fps = 10)
    val fAvi = VideoDedup.fingerprint64AtFps(avi, fps = 10)
    assert(java.lang.Long.bitCount(fGif ^ fAvi) <= 3,
      f"gif=$fGif%016x avi=$fAvi%016x")
  }

  test("interlaced frames de-interlace (hand-built stream)") {
    // build a 4x4 2-color interlaced GIF by hand: palette {black,
    // white}, pixel = row parity, interlace bit set so the row order
    // on the wire is 0,? -> passes place rows 0;2;1,3 for h=4
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    w16(4); w16(4)
    bos.write(0xf0) // GCT, 2 colors
    bos.write(0); bos.write(0)
    bos.write(0); bos.write(0); bos.write(0)       // color 0: black
    bos.write(255); bos.write(255); bos.write(255) // color 1: white
    bos.write(0x2c) // image descriptor
    w16(0); w16(0); w16(4); w16(4)
    bos.write(0x40) // interlaced, no LCT
    // pixel rows in INTERLACE order for h=4: pass1 row0, pass3 row2,
    // pass4 rows 1,3. We want final rows: 0->0s, 1->1s, 2->0s, 3->1s;
    // wire order rows: 0(0s), 2(0s), 1(1s), 3(1s)
    // LZW: minCode 2, clear=4, eoi=5, codes 3 bits to start
    val indices = Array.fill(4)(0) ++ Array.fill(4)(0) ++
      Array.fill(4)(1) ++ Array.fill(4)(1)
    // encode naively: clear, then each pixel as a literal code, eoi —
    // mirroring the decoder's dictionary growth (no entry after the
    // FIRST literal, width bump when the dict hits 2^width)
    val bits = new java.io.ByteArrayOutputStream()
    var buf = 0L; var nb = 0
    var width = 3
    var dictSize = 6
    def put(code: Int): Unit = {
      buf |= code.toLong << nb; nb += width
      while (nb >= 8) { bits.write((buf & 0xff).toInt); buf >>>= 8; nb -= 8 }
    }
    put(4) // clear
    var firstLit = true
    indices.foreach { ix =>
      put(ix)
      if (firstLit) firstLit = false
      else {
        dictSize += 1
        if (dictSize == (1 << width) && width < 12) width += 1
      }
    }
    put(5) // eoi
    if (nb > 0) bits.write((buf & 0xff).toInt)
    val data = bits.toByteArray
    bos.write(2) // min code size
    bos.write(data.length)
    bos.write(data)
    bos.write(0) // sub-block terminator
    bos.write(0x3b)
    val gif = GifDecode.parse(bos.toByteArray)
    val img = gif.frame(0)
    (0 until 4).foreach { y =>
      val want = if (y % 2 == 0) 0x000000 else 0xffffff
      (0 until 4).foreach(x =>
        assert((img.getRGB(x, y) & 0xffffff) == want, s"($x,$y)"))
    }
    // the direct-to-luma decode de-interlaces identically
    assert(gif.lumaFrame(0).toSeq == Pixels.lumaPlane(img).toSeq)
  }

  test("transparency maps to alpha 0") {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    bos.write("GIF89a".getBytes("US-ASCII"))
    w16(2); w16(1)
    bos.write(0xf0); bos.write(0); bos.write(0)
    bos.write(10); bos.write(20); bos.write(30)
    bos.write(200); bos.write(100); bos.write(50)
    // GCE: transparent index 1, delay 3
    bos.write(0x21); bos.write(0xf9); bos.write(4)
    bos.write(0x01); w16(3); bos.write(1); bos.write(0)
    bos.write(0x2c); w16(0); w16(0); w16(2); w16(1); bos.write(0)
    // pixels [0, 1]: minCode 2 -> clear=4: codes: 4, 0, 1, 5
    bos.write(2)
    val bits = new java.io.ByteArrayOutputStream()
    var buf = 0L; var nb = 0
    Seq(4, 0, 1, 5).foreach { c =>
      buf |= c.toLong << nb; nb += 3
      while (nb >= 8) { bits.write((buf & 0xff).toInt); buf >>>= 8; nb -= 8 }
    }
    if (nb > 0) bits.write((buf & 0xff).toInt)
    bos.write(bits.size()); bits.writeTo(bos); bos.write(0)
    bos.write(0x3b)
    val gif = GifDecode.parse(bos.toByteArray)
    assert(gif.frames(0).delayCs == 3)
    val img = gif.frame(0)
    assert((img.getRGB(0, 0) >>> 24) == 0xff &&
      (img.getRGB(0, 0) & 0xffffff) == (10 << 16 | 20 << 8 | 30))
    assert((img.getRGB(1, 0) >>> 24) == 0, "transparent pixel alpha 0")
    // direct-to-luma parity: transparent pixel -> ARGB 0 -> luma 0
    assert(gif.lumaFrame(0).toSeq == Pixels.lumaPlane(img).toSeq)
  }

  test("in-JVM encoder round-trips losslessly through BOTH decoders") {
    val fs = frames(3, 29, 18, 4)
    val bytes = GifDecode.writeAnimated(fs, Seq(7, 12, 3)).get
    // my decoder
    val mine = GifDecode.parse(bytes)
    assert(mine.numFrames == 3)
    assert((0 until 3).map(i => mine.frames(i).delayCs) == Seq(7, 12, 3))
    (0 until 3).foreach { i =>
      val out = mine.frame(i)
      (0 until 18).foreach(y => (0 until 29).foreach { x =>
        assert((out.getRGB(x, y) & 0xffffff) ==
          (fs(i).getRGB(x, y) & 0xffffff), s"i=$i ($x,$y)")
      })
    }
    // the ImageIO reader agrees (foreign-reader conformance)
    Multimodal.GifCodec.withReader(bytes) { reader =>
      assert(reader.getNumImages(true) == 3)
      (0 until 3).foreach { i =>
        val out = reader.read(i)
        (0 until 18).foreach(y => (0 until 29).foreach { x =>
          assert((out.getRGB(x, y) & 0xffffff) ==
            (fs(i).getRGB(x, y) & 0xffffff), s"imageio i=$i ($x,$y)")
        })
        assert(Multimodal.GifCodec.frameDelayCs(reader, i) ==
          Seq(7, 12, 3)(i))
      }
    }
  }

  test("encoder survives a dictionary-full clear (large noisy frame)") {
    // 256 gray values over 200x160 noise: the LZW dictionary hits 4096
    // mid-frame and the encoder must emit a clear the decoders follow
    val img = new java.awt.image.BufferedImage(200, 160,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = 999
    (0 until 160).foreach(y => (0 until 200).foreach { x =>
      s = s * 1103515245 + 12345
      val g = (s >>> 16) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    })
    val bytes = GifDecode.writeAnimated(Seq(img), Seq(10)).get
    val mine = GifDecode.parse(bytes).frame(0)
    Multimodal.GifCodec.withReader(bytes) { reader =>
      val ref = reader.read(0)
      (0 until 160).foreach(y => (0 until 200).foreach { x =>
        val want = img.getRGB(x, y) & 0xffffff
        assert((mine.getRGB(x, y) & 0xffffff) == want, s"mine ($x,$y)")
        assert((ref.getRGB(x, y) & 0xffffff) == want, s"imageio ($x,$y)")
      })
    }
  }

  test("too-colorful frames fall back to the ImageIO writer") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach(y => (0 until 32).foreach { x =>
      img.setRGB(x, y, (x << 16) | (y << 8) | ((x * y) & 0xff))
    })
    assert(GifDecode.writeAnimated(Seq(img), Seq(5)).isEmpty)
    // the public writer still produces a decodable GIF via ImageIO
    val bytes = Multimodal.GifCodec.writeAnimatedVfr(Seq(img), Seq(5))
    assert(GifDecode.parse(bytes).numFrames == 1)
  }

  test("malformed streams refuse loudly") {
    intercept[IllegalArgumentException] {
      GifDecode.parse("not a gif".getBytes("UTF-8"))
    }
    val ok = Multimodal.GifCodec.writeAnimated(frames(2, 8, 8, 1), 10)
    intercept[IllegalArgumentException] {
      GifDecode.parse(java.util.Arrays.copyOfRange(ok, 0, ok.length - 12))
        .frame(1): Unit
    }
  }
}
