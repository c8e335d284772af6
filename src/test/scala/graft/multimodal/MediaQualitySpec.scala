package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("image gates fire exactly where the generator planted defects") {
    val mix = Multimodal.syntheticImageQualityMix(spark, docs)
    val sig = MediaQuality.imageSignals(mix).persist()
    try {
      val wrong = sig.filter(
        col("too_small") =!= (pmod(col("media_id"), lit(5L)) === 0) ||
          col("extreme_aspect") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) === 0) ||
          col("low_contrast") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) =!= 0 &&
            pmod(col("media_id"), lit(7L)) === 0))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // signals are real: solid placeholders report range 0, textures wide
      assert(sig.filter(col("low_contrast") && col("luma_range") =!= 0)
        .count() == 0)
      assert(sig.filter(col("passes") && col("luma_range") < 100).count() == 0)
      // filterImages keeps exactly the passing set
      val kept = MediaQuality.filterImages(mix)
      assert(kept.count() == sig.filter(col("passes")).count())
    } finally { sig.unpersist(); () }
  }

  test("audio gates fire exactly where the generator planted defects") {
    val mix = Multimodal.syntheticAudioQualityMix(spark, docs)
    val sig = MediaQuality.audioSignals(mix).persist()
    try {
      val wrong = sig.filter(
        col("too_short") =!= (pmod(col("media_id"), lit(5L)) === 0) ||
          col("silent") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) === 0) ||
          col("clipped") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) =!= 0 &&
            pmod(col("media_id"), lit(7L)) === 0))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the square wave really is wall-to-wall full scale; silence is 0
      assert(sig.filter(col("clipped") && col("clip_permille") =!= 1000)
        .count() == 0)
      assert(sig.filter(col("silent") && col("mean_abs") =!= 0).count() == 0)
      val kept = MediaQuality.filterAudio(mix)
      assert(kept.count() == sig.filter(col("passes")).count())
    } finally { sig.unpersist(); () }
  }

  test("video gates fire exactly where the generator planted defects") {
    val mix = Multimodal.syntheticVideoQualityMix(spark, docs)
    val sig = MediaQuality.videoSignals(mix).persist()
    try {
      // a single-frame GIF is also trivially static (one distinct hash)
      val wrong = sig.filter(
        col("too_few_frames") =!= (pmod(col("media_id"), lit(5L)) === 0) ||
          col("static_video") =!= (pmod(col("media_id"), lit(5L)) === 0 ||
            pmod(col("media_id"), lit(11L)) === 0) ||
          col("too_short") =!= (pmod(col("media_id"), lit(5L)) =!= 0 &&
            pmod(col("media_id"), lit(11L)) =!= 0 &&
            pmod(col("media_id"), lit(7L)) === 0))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // signals are real: delays round-trip (400 ms clean, 40 ms short),
      // static loops report exactly one distinct frame hash
      assert(sig.filter(col("passes") && col("duration_ms") =!= 400L)
        .count() == 0)
      assert(sig.filter(col("too_short") && col("duration_ms") =!= 40L)
        .count() == 0)
      assert(sig.filter(col("static_video") &&
        col("distinct_frame_hashes") =!= 1L).count() == 0)
      assert(sig.filter(col("passes") &&
        col("distinct_frame_hashes") =!= 4L).count() == 0)
      // nothing planted exceeds the (huge) default duration ceiling
      assert(sig.filter(col("too_long")).count() == 0)
      val kept = MediaQuality.filterVideo(mix)
      assert(kept.count() == sig.filter(col("passes")).count())
      // a tight ceiling flips the clean renders to too_long
      val capped = MediaQuality.videoSignals(mix, maxMs = 100L)
      assert(capped.filter(col("too_long")).count() ==
        sig.filter(col("duration_ms") > 100L).count())
    } finally { sig.unpersist(); () }
  }

  test("video signals decode each container exactly once per job") {
    val mix = Multimodal.syntheticVideoQualityMix(spark,
      docs.filter(col("doc_id") < 100))
    val n = mix.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    MediaQuality.videoSignals(mix).collect(): Unit
    assert(c.get() - before == n,
      s"videoSignals decoded ${c.get() - before} containers for $n videos")
  }

  test("imageSharpness: variance-of-Laplacian separates blur by orders of magnitude") {
    val mix = Multimodal.syntheticImageBlurMix(spark, docs)
    val s = MediaQuality.imageSharpness(mix)
      .withColumn("want", pmod(col("media_id"), lit(3L)) === 0)
      .persist()
    try {
      import org.apache.spark.sql.functions.{max => smax, min => smin}
      val maxBlur = s.filter(col("want"))
        .agg(smax("lap_var")).as[Long].head()
      val minSharp = s.filter(!col("want"))
        .agg(smin("lap_var")).as[Long].head()
      // the signal must not be a threshold-tuning accident: require a
      // wide gap, then check the default gate lands inside it
      assert(maxBlur * 4 < minSharp,
        s"blur gap too narrow: maxBlur=$maxBlur minSharp=$minSharp")
      assert(maxBlur < 500L && minSharp >= 500L,
        s"default minLapVar=500 outside the gap [$maxBlur, $minSharp]")
      val wrong = s.filter(col("blurry") =!= col("want"))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the filter face keeps exactly the sharp ids
      assert(MediaQuality.filterSharp(mix).count() ==
        docs.filter(col("doc_id") % 3 =!= 0).count())
    } finally { s.unpersist(); () }
  }

  test("borderBars and cropBars recover and remove the planted letterbox") {
    val mix = Multimodal.syntheticImageBarMix(spark, docs)
    val bars = MediaQuality.borderBars(mix)
    val wrong = bars.filter(
      col("bar_top") =!= pmod(col("media_id"), lit(3L)) ||
        col("bar_bottom") =!= pmod(expr("media_id div 3"), lit(3L)) ||
        col("bar_left") =!= pmod(expr("media_id div 9"), lit(3L)) ||
        col("bar_right") =!= pmod(expr("media_id div 27"), lit(3L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    // cropping removes every bar: the cropped table reports all zeros
    // and a uniform 24x24 interior
    val cropped = MediaQuality.cropBars(mix)
    val rebars = MediaQuality.borderBars(cropped)
    assert(rebars.filter(col("bar_top") =!= 0 || col("bar_bottom") =!= 0 ||
      col("bar_left") =!= 0 || col("bar_right") =!= 0).count() == 0)
    val dims = ImageDedup.hashImagesWithDims(cropped)
    assert(dims.filter(col("width") =!= 24 || col("height") =!= 24)
      .count() == 0)
    // bar-free inputs pass through byte-untouched (no re-encode drift)
    val noBars = mix.filter(pmod(col("media_id"), lit(81L)) === 0)
    val through = MediaQuality.cropBars(noBars)
      .as[Multimodal.MediaRecord].collect().map(r => r.media_id -> r.payload)
      .toMap
    noBars.as[Multimodal.MediaRecord].collect().foreach { r =>
      assert(java.util.Arrays.equals(r.payload, through(r.media_id)),
        s"media_id=${r.media_id}: bar-free image was rewritten")
    }
    // a solid placeholder reports bars == dims and passes through
    val solid = Seq((1000L, "image", {
      val img = new java.awt.image.BufferedImage(10, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      Multimodal.ImageCodec.write(img, "png")
    }, "image/png", "solid"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val sb = MediaQuality.borderBars(solid).head()
    assert(sb.getInt(1) == 8 && sb.getInt(2) == 0 &&
      sb.getInt(3) == 10 && sb.getInt(4) == 0, sb.toString)
    assert(MediaQuality.cropBars(solid).count() == 1)
    // every-interior-column-uniform images (a 1-px-tall strip, vertical
    // stripes) must pass through untouched, not crash on a zero-width
    // crop — the column analogue of the solid guard
    def png(id: Long, w: Int, h: Int)(rgb: (Int, Int) => Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, rgb(x, y))))
      (id, "image", Multimodal.ImageCodec.write(img, "png"),
        "image/png", "edge")
    }
    val edgeCases = Seq(
      png(2000L, 12, 1)((x, _) => x * 21),          // 1-px-tall strip
      png(2001L, 12, 8)((x, _) => (x * 21) << 8),   // vertical stripes
      png(2002L, 12, 8)((x, _) => (x * 21) << 16))  // horizontal gradient
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val throughEdge = MediaQuality.cropBars(edgeCases)
      .as[Multimodal.MediaRecord].collect().map(r => r.media_id -> r.payload)
      .toMap
    edgeCases.as[Multimodal.MediaRecord].collect().foreach { r =>
      assert(java.util.Arrays.equals(r.payload, throughEdge(r.media_id)),
        s"media_id=${r.media_id}: all-uniform-columns image was rewritten")
    }
  }

  test("imageProfile: one decode, value-identical to the four faces") {
    val mix = Multimodal.syntheticImageBarMix(spark,
      docs.filter(col("doc_id") < 162))
    val n = mix.count()
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    val prof = MediaQuality.imageProfile(mix).persist()
    try {
      prof.count(): Unit
      assert(c.get() - before == n,
        s"imageProfile decoded ${c.get() - before} times for $n images")
      // signal equality with every individual face
      def mismatches(face: org.apache.spark.sql.DataFrame,
                     cols: Seq[String]): Long =
        prof.select("media_id", cols: _*)
          .exceptAll(face.select("media_id", cols: _*)).count()
      assert(mismatches(MediaQuality.imageSignals(mix),
        Seq("width", "height", "aspect_milli", "luma_mean", "luma_range",
          "too_small", "extreme_aspect", "low_contrast")) == 0)
      assert(mismatches(MediaQuality.imageSharpness(mix),
        Seq("lap_var", "blurry")) == 0)
      assert(mismatches(MediaQuality.borderBars(mix),
        Seq("bar_top", "bar_bottom", "bar_left", "bar_right")) == 0)
      assert(mismatches(ImageDedup.hashImages(mix), Seq("dhash")) == 0)
    } finally { prof.unpersist(); () }
  }

  test("aspectBuckets: header dims, zero decodes, earliest-bucket ties") {
    val imgs = Multimodal.syntheticImages(spark, docs)
    val before = Multimodal.MediaCounters.imageReads.get()
    val out = MediaQuality.aspectBuckets(imgs).persist()
    try {
      out.count(): Unit
      assert(Multimodal.MediaCounters.imageReads.get() == before,
        "PNG aspect bucketing must read only header bytes")
      // header dims == decoded dims
      val dims = ImageDedup.hashImagesWithDims(imgs)
        .select(col("media_id"), col("width").as("dw"),
          col("height").as("dh"))
      assert(out.join(dims, "media_id")
        .filter(col("width") =!= col("dw") ||
          col("height") =!= col("dh")).count() == 0)
      // recompute the nearest bucket independently: NORMALIZED ratio
      // distance |w/h - bw/bh| via pairwise integer cross-multiplication
      val bs = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
      val wrong = out.collect().filter { r =>
        val w = r.getInt(1).toLong; val h = r.getInt(2).toLong
        val want = bs.tail.foldLeft(bs.head) { (best, b) =>
          val db = math.abs(w * b._2 - h * b._1)
          val dbest = math.abs(w * best._2 - h * best._1)
          if (db * best._2 < dbest * b._2) b else best
        }
        r.getString(3) != s"${want._1}:${want._2}"
      }
      assert(wrong.isEmpty, wrong.take(5).mkString("; "))
      // a square image ties 1:1 first at w=h
      assert(out.filter(col("width") === col("height"))
        .filter(col("bucket") =!= "1:1").count() == 0)
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      MediaQuality.aspectBuckets(imgs, Seq((0, 1)))
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("aspectBuckets reads JPEG dims from the SOF header — zero decodes") {
    val jpgs = Multimodal.syntheticJpegsWithMetadata(spark,
      docs.filter(col("doc_id") < 60))
    val before = Multimodal.MediaCounters.imageReads.get()
    val out = MediaQuality.aspectBuckets(jpgs).persist()
    // header dims == the generator's planted dims (== decoded dims)
    assert(out.filter(col("width") =!=
      pmod(col("media_id"), lit(32L)) + 16).count() == 0)
    assert(out.filter(col("height") =!=
      pmod(col("media_id"), lit(24L)) + 16).count() == 0)
    assert(Multimodal.MediaCounters.imageReads.get() == before,
      "JPEG dims must come from the SOF header, never a pixel decode")
    out.unpersist()
    // dims survive the metadata scrub (APP1 removal shifts SOF offsets)
    val scrubbed = graft.multimodal.MediaScrub.scrub(jpgs)
    assert(MediaQuality.aspectBuckets(scrubbed)
      .filter(col("width") =!= pmod(col("media_id"), lit(32L)) + 16)
      .count() == 0)
  }

  test("aspectBuckets: normalized distance — 16:10 and 21:9 land in 16:9") {
    // the un-normalized |w*bh - h*bw| argmin biases against large-bh
    // buckets: a 16:10 image scores 6 for 1:1 but 16 for 16:9 and would
    // be bucketed SQUARE; the true ratio distances are 0.6 vs 0.178.
    // Pin the corrected semantics on laptop (16:10), ultrawide (~21:9)
    // and portrait-phone (10:16) shapes, raw dims and scaled-up alike.
    def png(id: Long, w: Int, h: Int) = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (id, "image", Multimodal.ImageCodec.write(img, "png"),
        "image/png", "t")
    }
    val fixtures = Seq(
      png(1L, 16, 10) -> "16:9", png(2L, 1280, 800) -> "16:9",
      png(3L, 2560, 1080) -> "16:9", // 21:9 ultrawide: nearest is 16:9
      png(4L, 10, 16) -> "9:16", png(5L, 800, 1280) -> "9:16",
      png(6L, 100, 100) -> "1:1", png(7L, 400, 300) -> "4:3")
    val imgs = fixtures.map(_._1)
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val got = MediaQuality.aspectBuckets(imgs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    fixtures.foreach { case ((id, _, _, _, _), want) =>
      assert(got(id) == want, s"media_id=$id: got ${got(id)}, want $want")
    }
  }

  test("non-decodable and wrong-type records refuse loudly") {
    val junk = Seq((1L, "image", Array[Byte](1, 2, 3), "image/png", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e = intercept[org.apache.spark.SparkException] {
      MediaQuality.imageSignals(junk).collect()
    }
    assert(e.getMessage != null)
    val wrongType = Multimodal.syntheticAudioQualityMix(spark, docs.limit(1))
    val e2 = intercept[org.apache.spark.SparkException] {
      MediaQuality.imageSignals(wrongType).collect()
    }
    assert(e2.getMessage != null)
  }
}
