package graft.multimodal

import java.awt.Transparency
import java.awt.color.ColorSpace
import java.awt.image.{BufferedImage, ComponentColorModel, DataBuffer,
  Raster}

import org.scalatest.funsuite.AnyFunSuite

/** [[PngDecode]] must be a drop-in for `ImageIO.read` on its fast path:
  * same dimensions, same ARGB pixels ([[Pixels.argbPlane]] — what every
  * hash/quality consumer reads), same raster layout, and the SAME BYTES
  * when the decoded image is re-encoded through the ImageIO PNG writer
  * (the transcode faces re-encode decoded frames, and their outputs
  * feed oracle-pinned rows). Off-path PNGs must return None so the
  * caller falls back to ImageIO. */
class PngDecodeSpec extends AnyFunSuite {

  private def pix(x: Int, y: Int): Int = {
    var z = x.toLong * 0xC2B2AE3D27D4EB4FL + y * 0x165667B19E3779F9L
    z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
    z.toInt
  }

  private def fill(img: BufferedImage): BufferedImage = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, pix(x, y)); x += 1 }
      y += 1
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    baos.toByteArray
  }

  private def argb(img: BufferedImage): Seq[Int] =
    Pixels.argbPlane(img).toSeq

  private def checkParity(bytes: Array[Byte], label: String): Unit = {
    val fast = PngDecode.decode(bytes)
      .getOrElse(fail(s"$label: fast path unexpectedly fell back"))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(fast.getWidth == ref.getWidth &&
      fast.getHeight == ref.getHeight, s"$label: dimensions differ")
    assert(argb(fast) == argb(ref), s"$label: ARGB pixels differ")
    assert(fast.getSampleModel.getClass == ref.getSampleModel.getClass &&
      fast.getColorModel.getClass == ref.getColorModel.getClass,
      s"$label: raster/color model classes differ " +
        s"(${fast.getSampleModel.getClass}/${fast.getColorModel.getClass}" +
        s" vs ${ref.getSampleModel.getClass}/${ref.getColorModel.getClass})")
    // the strongest consumer contract: re-encoding both through the
    // ImageIO PNG writer yields identical bytes
    assert(java.util.Arrays.equals(png(fast), png(ref)),
      s"$label: re-encoded bytes differ")
  }

  test("truecolor (the TYPE_INT_RGB fixture shape) decodes identically") {
    checkParity(png(fill(new BufferedImage(37, 23,
      BufferedImage.TYPE_INT_RGB))), "rgb24")
  }

  test("truecolor with alpha decodes identically") {
    checkParity(png(fill(new BufferedImage(19, 31,
      BufferedImage.TYPE_INT_ARGB))), "argb32")
  }

  test("8-bit grayscale decodes identically") {
    checkParity(png(fill(new BufferedImage(41, 17,
      BufferedImage.TYPE_BYTE_GRAY))), "gray8")
  }

  test("gray+alpha decodes identically") {
    val cs = ColorSpace.getInstance(ColorSpace.CS_GRAY)
    val cm = new ComponentColorModel(cs, Array(8, 8), true, false,
      Transparency.TRANSLUCENT, DataBuffer.TYPE_BYTE)
    val img = new BufferedImage(cm,
      Raster.createInterleavedRaster(DataBuffer.TYPE_BYTE, 29, 13,
        29 * 2, 2, Array(0, 1), null), false, null)
    checkParity(png(fill(img)), "gray+alpha")
  }

  test("palette images decode identically") {
    checkParity(png(fill(new BufferedImage(33, 21,
      BufferedImage.TYPE_BYTE_INDEXED))), "indexed8")
  }

  test("every PNG filter type round-trips (unfilter correctness)") {
    // large smooth gradients push the writer's per-row heuristic
    // through Sub/Up/Average/Paeth; the parity check above already
    // covers it, this pins a bigger surface
    val img = new BufferedImage(257, 97, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        img.setRGB(x, y, ((x * 255 / 257) << 16) | ((y * 255 / 97) << 8) |
          ((x + y) & 0xff))
        x += 1
      }
      y += 1
    }
    checkParity(png(img), "gradient")
  }

  test("interlaced and 16-bit PNGs fall back to ImageIO") {
    val bytes = png(fill(new BufferedImage(9, 9,
      BufferedImage.TYPE_INT_RGB)))
    // IHDR data starts at offset 16; interlace method is its 13th byte
    val interlaced = bytes.clone()
    interlaced(16 + 12) = 1
    assert(PngDecode.decode(interlaced).isEmpty, "interlace must fall back")
    val deep = bytes.clone()
    deep(16 + 8) = 16
    assert(PngDecode.decode(deep).isEmpty, "bit depth 16 must fall back")
  }

  test("unknown or color-managed chunks fall back to ImageIO") {
    val bytes = png(fill(new BufferedImage(9, 9,
      BufferedImage.TYPE_INT_RGB)))
    // splice a gAMA chunk right after IHDR (8 sig + 25 IHDR = 33)
    val gama = new java.io.ByteArrayOutputStream()
    gama.write(bytes, 0, 33)
    gama.write(Array[Byte](0, 0, 0, 4, 'g', 'A', 'M', 'A',
      0, 0, (0xb1 & 0xff).toByte, (0x8f & 0xff).toByte, 0, 0, 0, 0))
    gama.write(bytes, 33, bytes.length - 33)
    assert(PngDecode.decode(gama.toByteArray).isEmpty,
      "gAMA must divert to ImageIO")
  }

  test("a truncated IDAT stream throws instead of returning pixels") {
    val bytes = png(fill(new BufferedImage(64, 64,
      BufferedImage.TYPE_INT_RGB)))
    // cut the file well inside the IDAT payload
    val cut = java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2)
    intercept[IllegalArgumentException](PngDecode.decode(cut))
  }
}
