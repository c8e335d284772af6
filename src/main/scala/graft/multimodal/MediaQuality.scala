package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Multimodal.{GifCodec, ImageCodec, MediaCounters, MediaRecord}

/** Gopher-style QUALITY SIGNALS for media — the image/audio face of the
  * text quality filters (`text/TextStats.scala` gopher gates): map-only
  * decode passes emitting deterministic integer signals plus the derived
  * boolean gates a crawl-cleaning pipeline drops on (thumbnails, banner
  * strips, solid placeholders, silent or clipped audio). Every signal is
  * an integer computed from decoded samples, so the gates replay
  * identically anywhere; decode is confined to mapPartitions and nothing
  * but (id, signals) leaves the pass.
  */
object MediaQuality {

  /** Per-image signals: real decoded `width`/`height`,
    * `aspect_milli` = 1000 * max(w,h)/min(w,h) (integer), `luma_mean`
    * (0..255) and `luma_range` (max - min luminance — 0 for a solid
    * placeholder), plus the gates: `too_small` (either side under
    * `minSide`), `extreme_aspect` (aspect_milli > maxAspectMilli),
    * `low_contrast` (luma_range < minLumaRange) and `passes` (none of
    * the above). */
  def imageSignals(media: DataFrame, minSide: Int = 16,
                   maxAspectMilli: Long = 4000L,
                   minLumaRange: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: image signals over ${r.media_type}")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val lumPlane = Pixels.lumaPlane(img)
      var mn = 255
      var mx = 0
      var sum = 0L
      var i = 0
      while (i < lumPlane.length) {
        val lum = lumPlane(i)
        if (lum < mn) mn = lum
        if (lum > mx) mx = lum
        sum += lum
        i += 1
      }
      (r.media_id, w, h,
        1000L * math.max(w, h) / math.min(w, h),
        (sum / (w.toLong * h)).toInt, mx - mn)
    }).toDF("media_id", "width", "height", "aspect_milli", "luma_mean",
      "luma_range")
      .withColumn("too_small",
        col("width") < minSide || col("height") < minSide)
      .withColumn("extreme_aspect", col("aspect_milli") > maxAspectMilli)
      .withColumn("low_contrast", col("luma_range") < minLumaRange)
      .withColumn("passes",
        !col("too_small") && !col("extreme_aspect") && !col("low_contrast"))
  }

  /** Per-clip signals over decoded 16-bit PCM: `n_frames`,
    * `duration_ms`, `mean_abs` (mean |sample|), `clip_permille`
    * (samples at full scale per 1000), plus the gates: `too_short`
    * (duration under `minMs`), `silent` (mean_abs < minMeanAbs),
    * `clipped` (clip_permille > maxClipPermille) and `passes`. */
  def audioSignals(media: DataFrame, minMs: Long = 50L,
                   minMeanAbs: Long = 100L,
                   maxClipPermille: Long = 10L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "audio",
        s"media_id=${r.media_id}: audio signals over ${r.media_type}")
      // one normalized-decode seam for every wire coding (16-bit PCM,
      // 8-bit PCM, G.711 telephony) — see AudioDedup.openNormalized16
      val (bytes, channels, rate) =
        try AudioDedup.openNormalized16(r.payload)
        catch {
          case e: IllegalArgumentException =>
            throw new IllegalArgumentException(
              s"media_id=${r.media_id}: ${e.getMessage}", e)
        }
      val total = bytes.length / 2
      require(total > 0, s"media_id=${r.media_id}: empty audio stream")
      var sumAbs = 0L
      var clipped = 0L
      var i = 0
      while (i < total) {
        val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort
        sumAbs += math.abs(s.toInt)
        if (s == Short.MaxValue || s == Short.MinValue) clipped += 1
        i += 1
      }
      val frames = total / channels
      (r.media_id, frames.toLong,
        frames.toLong * 1000L / rate.toLong,
        sumAbs / total, clipped * 1000L / total)
    }).toDF("media_id", "n_frames", "duration_ms", "mean_abs",
      "clip_permille")
      .withColumn("too_short", col("duration_ms") < minMs)
      .withColumn("silent", col("mean_abs") < minMeanAbs)
      .withColumn("clipped", col("clip_permille") > maxClipPermille)
      .withColumn("passes",
        !col("too_short") && !col("silent") && !col("clipped"))
  }

  /** Per-video signals from ONE container decode: `n_frames`,
    * `duration_ms` (sum of per-frame GraphicControlExtension delays),
    * `distinct_frame_hashes` (distinct dHashes over every `every`-th
    * frame — 1 for a static banner "video"), plus the gates:
    * `too_few_frames` (n_frames < minFrames), `static_video` (all
    * sampled frame hashes identical), `too_short`/`too_long`
    * (duration_ms outside [minMs, maxMs]) and `passes` (none of the
    * above). Completes the modality set next to [[imageSignals]] and
    * [[audioSignals]]; frames come through the unified container seam
    * ([[VideoCodec]]: animated GIF or AVI/MJPEG), unknown containers
    * refuse loudly. */
  def videoSignals(media: DataFrame, minFrames: Int = 2,
                   minMs: Long = 100L, maxMs: Long = 3600000L,
                   every: Int = 1): DataFrame = {
    require(every >= 1, s"every=$every must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "video",
        s"media_id=${r.media_id}: video signals over ${r.media_type}")
      require(VideoCodec.isVideo(r.payload),
        s"media_id=${r.media_id}: payload is not a decodable video " +
          "container (GIF/AVI) — no in-JVM codec for mp4/webm")
      MediaCounters.videoReads.incrementAndGet(): Unit
      VideoCodec.withFrames(r.payload) { v =>
        val n = v.numFrames
        require(n >= 1, s"media_id=${r.media_id}: container holds no frames")
        // exact µs sum -> ms: a 60 fps AVI reports 33 ms for 2 frames
        // (33333 µs trunc), never the 0 ms a centisecond-quantized
        // delay would have silently gated as too_short
        var durationUs = 0L
        var i = 0
        while (i < n) { durationUs += v.delayUs(i); i += 1 }
        val hashes = scala.collection.mutable.HashSet.empty[Long]
        var f = 0
        while (f < n) {
          val (l, fw, fh) = v.lumaFrame(f)
          hashes += ImageDedup.dHashOfLuma(l, fw, fh): Unit
          f += every
        }
        (r.media_id, n.toLong, durationUs / 1000L, hashes.size.toLong)
      }
    }).toDF("media_id", "n_frames", "duration_ms", "distinct_frame_hashes")
      .withColumn("too_few_frames", col("n_frames") < minFrames)
      .withColumn("static_video", col("distinct_frame_hashes") === 1L)
      .withColumn("too_short", col("duration_ms") < minMs)
      .withColumn("too_long", col("duration_ms") > maxMs)
      .withColumn("passes",
        !col("too_few_frames") && !col("static_video") &&
          !col("too_short") && !col("too_long"))
  }

  /** Per-image SHARPNESS signal: the integer variance of the 4-neighbor
    * luminance Laplacian over interior pixels (the classic
    * variance-of-Laplacian blur detector) — a crisp texture scores in
    * the thousands, a defocused/upscaled re-encode collapses toward 0
    * (linear ramps have zero second derivative everywhere but at knots).
    * Output (media_id, lap_var, blurry = lap_var < minLapVar). Images
    * with no interior (either side < 3 px) report lap_var 0 — [[
    * imageSignals]]' `too_small` gate owns that class. Pure integer
    * arithmetic, replayable anywhere; one decode per image. */
  def imageSharpness(media: DataFrame, minLapVar: Long = 500L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: image sharpness over ${r.media_type}")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val lum = Pixels.lumaPlane(img)
      var sum = 0L
      var sumSq = 0L
      var n = 0L
      var y = 1
      while (y < h - 1) {
        val row = y * w
        var x = 1
        while (x < w - 1) {
          val lap = 4 * lum(row + x) - lum(row + x - 1) - lum(row + x + 1) -
            lum(row - w + x) - lum(row + w + x)
          sum += lap
          sumSq += lap.toLong * lap
          n += 1
          x += 1
        }
        y += 1
      }
      val lapVar = if (n == 0) 0L else sumSq / n - (sum / n) * (sum / n)
      (r.media_id, lapVar)
    }).toDF("media_id", "lap_var")
      .withColumn("blurry", col("lap_var") < minLapVar)
  }

  /** Keep only images at or above the sharpness bar. */
  def filterSharp(media: DataFrame, minLapVar: Long = 500L): DataFrame =
    media.join(
      imageSharpness(media, minLapVar).filter(!col("blurry"))
        .select("media_id"),
      Seq("media_id"), "left_semi")

  /** Per-image LETTERBOX/PILLARBOX bars: the count of consecutive
    * UNIFORM rows (every pixel one luminance) from each edge —
    * (media_id, bar_top, bar_bottom, bar_left, bar_right). Black bars
    * around re-posted content shift every whole-image and tile hash and
    * waste tokens in vision training; detect, then [[cropBars]]. A
    * fully uniform (solid) image reports bars == its dims — the
    * `low_contrast` gate owns that class. One decode per image. */
  def borderBars(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: border detection over ${r.media_type}")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val lum = Pixels.lumaPlane(img)
      def rowUniform(yy: Int): Boolean = {
        val row = yy * w
        val v = lum(row)
        var x = 1
        while (x < w) { if (lum(row + x) != v) return false; x += 1 }
        true
      }
      var top = 0
      while (top < h && rowUniform(top)) top += 1
      var bottom = 0
      while (bottom < h - top && rowUniform(h - 1 - bottom)) bottom += 1
      // columns measured on the interior left after row bars — a pure
      // left/right pillarbox still spans full columns, while corner
      // pixels of a top bar must not fake a column bar
      def colUniformIn(xx: Int): Boolean = {
        val v = lum(top * w + xx)
        var yy = top
        while (yy < h - bottom) {
          if (lum(yy * w + xx) != v) return false
          yy += 1
        }
        true
      }
      val (left0, right0) =
        if (top + bottom >= h) (w, 0) // solid: all bars, report once
        else {
          var l = 0
          while (l < w && colUniformIn(l)) l += 1
          var rr = 0
          while (rr < w - l && colUniformIn(w - 1 - rr)) rr += 1
          (l, rr)
        }
      (r.media_id, top, bottom, left0, right0)
    }).toDF("media_id", "bar_top", "bar_bottom", "bar_left", "bar_right")
  }

  /** Crop detected bars away and RE-ENCODE the interior as PNG — the
    * normalization pass before perceptual hashing (bars shift every
    * hash). Images with no bars pass through byte-untouched (no
    * re-encode drift); solid images pass through too (nothing to keep).
    * One decode per image; output keeps the media schema. */
  def cropBars(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: bar cropping over ${r.media_type}")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val lum = Pixels.lumaPlane(img)
      def lumAt(x: Int, y: Int): Int = lum(y * w + x)
      def rowUniform(yy: Int): Boolean = {
        val v = lumAt(0, yy)
        var x = 1
        while (x < w) { if (lumAt(x, yy) != v) return false; x += 1 }
        true
      }
      var top = 0
      while (top < h && rowUniform(top)) top += 1
      var bottom = 0
      while (bottom < h - top && rowUniform(h - 1 - bottom)) bottom += 1
      val out =
        if (top + bottom >= h) r // solid placeholder: nothing to keep
        else {
          def colUniformIn(xx: Int): Boolean = {
            val v = lumAt(xx, top)
            var yy = top
            while (yy < h - bottom) {
              if (lumAt(xx, yy) != v) return false
              yy += 1
            }
            true
          }
          var l = 0
          while (l < w && colUniformIn(l)) l += 1
          var rr = 0
          while (rr < w - l && colUniformIn(w - 1 - rr)) rr += 1
          if (top == 0 && bottom == 0 && l == 0 && rr == 0) r
          // column analogue of the solid guard: when EVERY interior
          // column is uniform (a 1-px-tall strip, vertical stripes, a
          // horizontal gradient) l reaches w and the crop width would be
          // zero — nothing meaningful to keep, pass through untouched
          else if (l + rr >= w) r
          else r.copy(payload = ImageCodec.write(
            img.getSubimage(l, top, w - l - rr, h - top - bottom), "png"),
            mime = "image/png")
        }
      out
    }).toDF()
  }

  /** The combined ONE-DECODE image hygiene profile: dimensions/aspect/
    * luminance ([[imageSignals]]), Laplacian variance
    * ([[imageSharpness]]), border bars ([[borderBars]]) and the
    * perceptual dHash — everything a crawl's image pass needs, where
    * running the faces separately pays FOUR decodes per image (decode
    * is the job's dominant cost at 100 TB). Signal columns are
    * value-identical to the individual faces (unit-pinned); gates
    * derive the same way. */
  def imageProfile(media: DataFrame, minSide: Int = 16,
                   maxAspectMilli: Long = 4000L, minLumaRange: Int = 8,
                   minLapVar: Long = 500L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: image profile over ${r.media_type}")
      val img = ImageCodec.read(r.payload)
      require(img != null,
        s"media_id=${r.media_id}: payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      // ONE pixel pass: the luminance plane feeds min/max/mean, the
      // Laplacian, the bar scans AND the dHash (which used to re-read
      // every pixel through its own downscale)
      val lum = Pixels.lumaPlane(img)
      var mn = 255
      var mx = 0
      var sum = 0L
      var i = 0
      while (i < lum.length) {
        val l = lum(i)
        if (l < mn) mn = l
        if (l > mx) mx = l
        sum += l
        i += 1
      }
      var lapSum = 0L
      var lapSq = 0L
      var lapN = 0L
      var y = 1
      while (y < h - 1) {
        val row = y * w
        var x = 1
        while (x < w - 1) {
          val lap = 4 * lum(row + x) - lum(row + x - 1) - lum(row + x + 1) -
            lum(row - w + x) - lum(row + w + x)
          lapSum += lap
          lapSq += lap.toLong * lap
          lapN += 1
          x += 1
        }
        y += 1
      }
      val lapVar =
        if (lapN == 0) 0L
        else lapSq / lapN - (lapSum / lapN) * (lapSum / lapN)
      def rowUniform(yy: Int): Boolean = {
        val row = yy * w
        val v = lum(row)
        var x = 1
        while (x < w) { if (lum(row + x) != v) return false; x += 1 }
        true
      }
      var top = 0
      while (top < h && rowUniform(top)) top += 1
      var bottom = 0
      while (bottom < h - top && rowUniform(h - 1 - bottom)) bottom += 1
      val (left, right) =
        if (top + bottom >= h) (w, 0)
        else {
          def colUniformIn(xx: Int): Boolean = {
            val v = lum(top * w + xx)
            var yy = top
            while (yy < h - bottom) {
              if (lum(yy * w + xx) != v) return false
              yy += 1
            }
            true
          }
          var l = 0
          while (l < w && colUniformIn(l)) l += 1
          var rr = 0
          while (rr < w - l && colUniformIn(w - 1 - rr)) rr += 1
          (l, rr)
        }
      (r.media_id, w, h, 1000L * math.max(w, h) / math.min(w, h),
        (sum / (w.toLong * h)).toInt, mx - mn, lapVar,
        top, bottom, left, right, ImageDedup.dHashOfLuma(lum, w, h))
    }).toDF("media_id", "width", "height", "aspect_milli", "luma_mean",
      "luma_range", "lap_var", "bar_top", "bar_bottom", "bar_left",
      "bar_right", "dhash")
      .withColumn("too_small",
        col("width") < minSide || col("height") < minSide)
      .withColumn("extreme_aspect", col("aspect_milli") > maxAspectMilli)
      .withColumn("low_contrast", col("luma_range") < minLumaRange)
      .withColumn("blurry", col("lap_var") < minLapVar)
      .withColumn("passes",
        !col("too_small") && !col("extreme_aspect") &&
          !col("low_contrast") && !col("blurry"))
  }

  /** Image dimensions from CONTAINER HEADER bytes — PNG IHDR (big-endian
    * at offset 16) or GIF logical screen descriptor (little-endian at
    * offset 6) — with NO pixel decode. The cheap path for layout-only
    * decisions (aspect bucketing, size pre-filters) over compressed
    * crawls; non-PNG/GIF payloads fall back to a real decode. */
  private[multimodal] def dimsFromHeader(payload: Array[Byte]): (Int, Int) =
    if (MediaScrub.isPng(payload) && payload.length >= 24) {
      def be(o: Int): Int = ((payload(o) & 0xff) << 24) |
        ((payload(o + 1) & 0xff) << 16) | ((payload(o + 2) & 0xff) << 8) |
        (payload(o + 3) & 0xff)
      (be(16), be(20))
    } else if (GifCodec.isGif(payload) && payload.length >= 10) {
      ((payload(6) & 0xff) | ((payload(7) & 0xff) << 8),
        (payload(8) & 0xff) | ((payload(9) & 0xff) << 8))
    } else if (MediaScrub.isJpeg(payload)) {
      // JPEG dims live in the SOF frame header (lines/samples-per-line
      // after precision) — a marker walk, zero pixel decode for the
      // most common crawled format. SOF markers: C0-CF minus the
      // non-frame C4 (DHT), C8 (JPG), CC (DAC)
      jpegDims(payload)
    } else if (MediaScrub.isRiffWebp(payload)) {
      webpDims(payload)
    } else if (Tiff.isTiff(payload)) {
      Tiff.dims(payload)
    } else if (payload.length >= 26 && payload(0) == 'B' && payload(1) == 'M') {
      // BMP info header: i32 LE dims at 18/22 (height < 0 = top-down)
      def le32(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      (le32(18), math.abs(le32(22)))
    } else {
      val img = ImageCodec.read(payload)
      require(img != null, "payload is not a decodable image")
      (img.getWidth, img.getHeight)
    }

  /** (width, height) from a JPEG SOF header — marker walk only. */
  private def jpegDims(b: Array[Byte]): (Int, Int) = {
    var off = 2
    while (true) {
      require(off + 4 <= b.length, s"truncated JPEG marker at $off")
      require((b(off) & 0xff) == 0xff, s"lost JPEG marker sync at $off")
      // step past spec-legal 0xFF fill bytes before the marker
      while (off + 4 <= b.length && (b(off + 1) & 0xff) == 0xff) off += 1
      val m = b(off + 1) & 0xff
      val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
      require(len >= 2 && off + 2 + len <= b.length,
        f"truncated JPEG segment 0x$m%02x at $off")
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        require(len >= 7, s"SOF segment too short ($len bytes)")
        // payload: precision(1), lines(2), samples/line(2)
        val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
        val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
        return (w, h)
      }
      require(m != 0xda && m != 0xd9,
        "JPEG stream reached its scan without a SOF header — dims unknown")
      off += 2 + len
    }
    throw new IllegalStateException("unreachable")
  }

  /** (width, height) from WebP header bytes — zero pixel decode. The
    * first chunk decides: VP8X carries the canvas size outright
    * (24-bit minus-one fields), VP8L packs 14-bit minus-one dims into
    * its stream header, lossy VP8 carries them in the key-frame
    * header after the 9D 01 2A start code. */
  private def webpDims(b: Array[Byte]): (Int, Int) = {
    require(b.length >= 20, "truncated WebP container")
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le24(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16)
    val id = new String(b, 12, 4, "US-ASCII")
    val body = 20 // first chunk's payload offset
    id match {
      case "VP8X" =>
        require(b.length >= body + 10, "truncated VP8X header")
        (1 + le24(body + 4), 1 + le24(body + 7))
      case "VP8L" =>
        require(b.length >= body + 5 && (b(body) & 0xff) == 0x2f,
          "VP8L stream lacks its signature byte")
        val bits = le24(body + 1) | ((b(body + 4) & 0xff) << 24)
        (1 + (bits & 0x3fff), 1 + ((bits >> 14) & 0x3fff))
      case "VP8 " =>
        require(b.length >= body + 10, "truncated VP8 frame header")
        require((b(body + 3) & 0xff) == 0x9d && (b(body + 4) & 0xff) == 0x01 &&
          (b(body + 5) & 0xff) == 0x2a,
          "VP8 key-frame start code missing — dims unknown")
        (le16(body + 6) & 0x3fff, le16(body + 8) & 0x3fff)
      case other => throw new IllegalArgumentException(
        s"WebP leads with '$other' — dims unknown")
    }
  }

  /** ASPECT-RATIO bucketing — the batch-packing pass of vision training
    * (images batch with same-shaped peers instead of being cropped to
    * one global shape): each image goes to the bucket whose ratio bw/bh
    * is nearest to w/h. The raw cross-multiplied distance
    * |w*bh - h*bw| is NOT comparable across buckets with different
    * denominators (it equals h*bh*|w/h - bw/bh|, so large-bh buckets
    * are penalized — a 16:10 image would land in 1:1), so buckets are
    * compared PAIRWISE with the bh factors cross-multiplied away:
    * bucket i beats the incumbent j iff
    * |w*bh_i - h*bw_i| * bh_j < |w*bh_j - h*bw_j| * bh_i — integer-exact,
    * no floats, ties to the EARLIEST bucket. Dims come from container
    * header bytes where possible — ZERO pixel decodes for PNG/GIF/JPEG
    * crawls. Output (media_id, width, height, bucket). */
  def aspectBuckets(media: DataFrame,
                    buckets: Seq[(Int, Int)] = Seq((1, 1), (4, 3), (3, 4),
                      (16, 9), (9, 16))): DataFrame = {
    require(buckets.nonEmpty && buckets.forall(b => b._1 > 0 && b._2 > 0),
      s"buckets must be positive ratios: $buckets")
    val spark = media.sparkSession
    import spark.implicits._
    val bs = buckets
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "image",
        s"media_id=${r.media_id}: aspect bucketing over ${r.media_type}")
      val (w, h) = dimsFromHeader(r.payload)
      var best = 0
      var bestD = math.abs(w.toLong * bs(0)._2 - h.toLong * bs(0)._1)
      var i = 1
      while (i < bs.length) {
        val d = math.abs(w.toLong * bs(i)._2 - h.toLong * bs(i)._1)
        // d/bh_i < bestD/bh_best, integer cross-multiplied; strict <
        // keeps the earliest bucket on ties
        if (d * bs(best)._2 < bestD * bs(i)._2) { bestD = d; best = i }
        i += 1
      }
      (r.media_id, w, h, s"${bs(best)._1}:${bs(best)._2}")
    }).toDF("media_id", "width", "height", "bucket")
  }

  /** Keep only images passing every gate. */
  def filterImages(media: DataFrame, minSide: Int = 16,
                   maxAspectMilli: Long = 4000L,
                   minLumaRange: Int = 8): DataFrame =
    media.join(
      imageSignals(media, minSide, maxAspectMilli, minLumaRange)
        .filter(col("passes")).select("media_id"),
      Seq("media_id"), "left_semi")

  /** Keep only clips passing every gate. */
  def filterAudio(media: DataFrame, minMs: Long = 50L,
                  minMeanAbs: Long = 100L,
                  maxClipPermille: Long = 10L): DataFrame =
    media.join(
      audioSignals(media, minMs, minMeanAbs, maxClipPermille)
        .filter(col("passes")).select("media_id"),
      Seq("media_id"), "left_semi")

  /** Keep only videos passing every gate. */
  def filterVideo(media: DataFrame, minFrames: Int = 2,
                  minMs: Long = 100L, maxMs: Long = 3600000L,
                  every: Int = 1): DataFrame =
    media.join(
      videoSignals(media, minFrames, minMs, maxMs, every)
        .filter(col("passes")).select("media_id"),
      Seq("media_id"), "left_semi")
}
