package graft.multimodal

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** [[Pixels.argbPlane]] must be BIT-IDENTICAL to per-pixel
  * `BufferedImage.getRGB` for every image type the codecs produce —
  * the perceptual hashes feeding oracle-pinned rows ride on it. */
class PixelsSpec extends AnyFunSuite {

  /** Deterministic pseudo-random ARGB for (x, y). */
  private def pix(x: Int, y: Int): Int = {
    var z = x.toLong * 0xC2B2AE3D27D4EB4FL + y * 0x165667B19E3779F9L
    z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
    z.toInt
  }

  private def fill(img: BufferedImage): BufferedImage = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        img.setRGB(x, y, pix(x, y))
        x += 1
      }
      y += 1
    }
    img
  }

  private def reference(img: BufferedImage): Array[Int] = {
    val out = new Array[Int](img.getWidth * img.getHeight)
    var y = 0
    var i = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        out(i) = img.getRGB(x, y)
        i += 1; x += 1
      }
      y += 1
    }
    out
  }

  private def check(img: BufferedImage, label: String): Unit = {
    assert(Pixels.argbPlane(img).toSeq == reference(img).toSeq,
      s"argbPlane != per-pixel getRGB for $label")
    // subimage views share the parent's buffer at a raster offset —
    // the tile-hash path; the fast paths must honor the translation
    if (img.getWidth >= 10 && img.getHeight >= 8) {
      val sub = img.getSubimage(3, 2, img.getWidth - 5, img.getHeight - 4)
      assert(Pixels.argbPlane(sub).toSeq == reference(sub).toSeq,
        s"argbPlane != getRGB for a subimage view of $label")
    }
  }

  test("int-packed types read the raster directly, value-identically") {
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_INT_RGB)),
      "TYPE_INT_RGB")
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_INT_ARGB)),
      "TYPE_INT_ARGB")
  }

  test("byte-interleaved types (the ImageIO JPEG/PNG shapes) match") {
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_3BYTE_BGR)),
      "TYPE_3BYTE_BGR")
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_4BYTE_ABGR)),
      "TYPE_4BYTE_ABGR")
  }

  test("indexed type resolves through the exact colormap") {
    // default 256-entry indexed palette; setRGB snaps to nearest entry,
    // getRGB reads the palette back — both sides see palette values
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_BYTE_INDEXED)),
      "TYPE_BYTE_INDEXED")
    // the gray-indexed fixture palette (exactly what GIF fixtures use)
    val gray = new Array[Byte](256)
    var i = 0
    while (i < 256) { gray(i) = i.toByte; i += 1 }
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    check(fill(new BufferedImage(23, 17,
      BufferedImage.TYPE_BYTE_INDEXED, icm)), "gray TYPE_BYTE_INDEXED")
  }

  test("color-converted and premultiplied types take the exact fallback") {
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_BYTE_GRAY)),
      "TYPE_BYTE_GRAY")
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_INT_ARGB_PRE)),
      "TYPE_INT_ARGB_PRE")
    check(fill(new BufferedImage(23, 17, BufferedImage.TYPE_USHORT_565_RGB)),
      "TYPE_USHORT_565_RGB")
  }

  test("tile rect hashes equal dHash64 over getSubimage views") {
    val img = fill(new BufferedImage(40, 32, BufferedImage.TYPE_INT_RGB))
    val lum = Pixels.lumaPlane(img)
    for (ty <- 0 until 2; tx <- 0 until 2) {
      val direct = ImageDedup.dHash64(
        img.getSubimage(tx * 20, ty * 16, 20, 16))
      val rect = ImageDedup.dHashOfLumaRect(lum, 40, tx * 20, ty * 16, 20, 16)
      assert(direct == rect, s"tile ($tx,$ty) hash drifted")
    }
  }

  test("lumaPlane applies the shared integer luminance formula") {
    val img = fill(new BufferedImage(9, 7, BufferedImage.TYPE_INT_ARGB))
    val plane = Pixels.lumaPlane(img)
    var y = 0
    while (y < 7) {
      var x = 0
      while (x < 9) {
        val rgb = img.getRGB(x, y)
        val expect = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        assert(plane(y * 9 + x) == expect)
        x += 1
      }
      y += 1
    }
  }
}
