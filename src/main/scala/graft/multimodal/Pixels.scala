package graft.multimodal

import java.awt.image.{BufferedImage, ComponentSampleModel, DataBufferByte,
  DataBufferInt, IndexColorModel, SinglePixelPackedSampleModel}

/** JVM-wide ImageIO setup shared by every codec entry point: headless
  * AWT, and MEMORY-cached ImageIO streams — the default cache is
  * DISK-backed, creating and deleting a temp FILE per
  * `read(InputStream)`/`write(_, _, OutputStream)` call, which
  * serializes concurrent decode tasks behind the filesystem. Both are
  * pure environment toggles; decoded/encoded bytes are bit-identical. */
private[multimodal] object ImageIoTuning {
  lazy val init: Unit = {
    System.setProperty("java.awt.headless", "true"): Unit
    javax.imageio.ImageIO.setUseCache(false)
  }
}

/** Fast, value-identical pixel access for the decode-adjacent hot loops
  * (perceptual hashes, quality gates, luminance features). Every loop in
  * the media stack used to call `BufferedImage.getRGB(x, y)` per pixel —
  * a virtual dispatch through the color model plus a boxed data-elements
  * fetch PER PIXEL, which at 100 TB of frames is the single largest
  * per-task cost after the entropy decode itself (guide §1.2 step 2:
  * per-task work). [[argbPlane]] reads the backing raster directly for
  * the standard image types and falls back to the bulk `getRGB` call
  * otherwise, so its output is BIT-IDENTICAL to per-pixel `getRGB` for
  * every input (unit-pinned across types and subimage views — the hash
  * values feeding the oracle rows must not move).
  *
  * Fast paths must respect raster translation: tile hashing passes
  * `getSubimage` views whose rasters share the parent's data buffer at
  * an offset. Types with color-space conversion on the getRGB path
  * (TYPE_BYTE_GRAY's linear-gray → sRGB) or premultiplied alpha take
  * the fallback — the conversion is the contract there. */
private[multimodal] object Pixels {

  /** Packed ARGB plane, row-major `w*h` — `out(y*w + x)` equals
    * `img.getRGB(x, y)` exactly. */
  def argbPlane(img: BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    val tx = raster.getSampleModelTranslateX
    val ty = raster.getSampleModelTranslateY
    img.getType match {
      case BufferedImage.TYPE_INT_RGB | BufferedImage.TYPE_INT_ARGB =>
        (raster.getSampleModel, raster.getDataBuffer) match {
          case (sm: SinglePixelPackedSampleModel, db: DataBufferInt)
              if db.getNumBanks == 1 =>
            val data = db.getData
            val base = db.getOffset
            val opaque = img.getType == BufferedImage.TYPE_INT_RGB
            var y = 0
            var o = 0
            while (y < h) {
              var src = base + sm.getOffset(-tx, y - ty)
              var x = 0
              while (x < w) {
                out(o) =
                  if (opaque) 0xff000000 | (data(src) & 0xffffff)
                  else data(src)
                o += 1; src += 1; x += 1
              }
              y += 1
            }
          case _ => bulk(img, out, w, h)
        }
      case BufferedImage.TYPE_3BYTE_BGR | BufferedImage.TYPE_4BYTE_ABGR =>
        (raster.getSampleModel, raster.getDataBuffer) match {
          case (sm: ComponentSampleModel, db: DataBufferByte)
              if db.getNumBanks == 1 =>
            val data = db.getData
            val base = db.getOffset
            val ps = sm.getPixelStride
            val bo = sm.getBandOffsets
            val hasAlpha = img.getType == BufferedImage.TYPE_4BYTE_ABGR
            // offset of pixel (x,y)'s band-0 sample MINUS its band offset
            // = the pixel's element base; the other bands ride bo(...)
            val rOff = bo(0)
            val gOff = bo(1)
            val bOff = bo(2)
            val aOff = if (hasAlpha) bo(3) else 0
            var y = 0
            var o = 0
            while (y < h) {
              var px = base + sm.getOffset(-tx, y - ty, 0) - rOff
              var x = 0
              while (x < w) {
                val r = data(px + rOff) & 0xff
                val g = data(px + gOff) & 0xff
                val b = data(px + bOff) & 0xff
                val a = if (hasAlpha) data(px + aOff) & 0xff else 0xff
                out(o) = (a << 24) | (r << 16) | (g << 8) | b
                o += 1; px += ps; x += 1
              }
              y += 1
            }
          case _ => bulk(img, out, w, h)
        }
      case BufferedImage.TYPE_BYTE_INDEXED =>
        (raster.getSampleModel, raster.getDataBuffer, img.getColorModel) match {
          case (sm: ComponentSampleModel, db: DataBufferByte,
                icm: IndexColorModel)
              if db.getNumBanks == 1 && sm.getNumBands == 1 &&
                sm.getPixelStride == 1 =>
            val data = db.getData
            val base = db.getOffset
            val mapSize = icm.getMapSize
            val table = new Array[Int](mapSize)
            icm.getRGBs(table)
            var ok = true
            var y = 0
            var o = 0
            while (ok && y < h) {
              var src = base + sm.getOffset(-tx, y - ty, 0)
              var x = 0
              while (ok && x < w) {
                val idx = data(src) & 0xff
                if (idx >= mapSize) ok = false // getRGB would throw; bail
                else out(o) = table(idx)
                o += 1; src += 1; x += 1
              }
              y += 1
            }
            if (!ok) bulk(img, out, w, h)
          case _ => bulk(img, out, w, h)
        }
      case _ => bulk(img, out, w, h)
    }
    out
  }

  private def bulk(img: BufferedImage, out: Array[Int], w: Int, h: Int): Unit = {
    img.getRGB(0, 0, w, h, out, 0, w): Unit
  }

  /** Integer luminance plane, row-major `w*h`: per pixel exactly
    * `(r*299 + g*587 + b*114) / 1000` of the [[argbPlane]] value — the
    * shared formula of every luma consumer in the media stack. */
  def lumaPlane(img: BufferedImage): Array[Int] = {
    val p = argbPlane(img)
    var i = 0
    while (i < p.length) {
      val rgb = p(i)
      p(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
        (rgb & 0xff) * 114) / 1000
      i += 1
    }
    p
  }
}
