package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaScrubSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val mix =
    Multimodal.syntheticImagesWithMetadata(spark, docs)

  test("scrubReport finds exactly the planted metadata with zero decodes") {
    val before = Multimodal.MediaCounters.imageReads.get()
    val rep = MediaScrub.scrubReport(mix)
    val wrong = rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0) ||
      col("n_stripped") =!= when(pmod(col("media_id"), lit(4L)) === 0, 1)
        .otherwise(0))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(rep.count() == docs.count())
    assert(rep.filter(col("had_metadata"))
      .filter(!array_contains(col("stripped_types"), "tEXt")).count() == 0)
    assert(Multimodal.MediaCounters.imageReads.get() == before,
      "the chunk walk must never decode")
  }

  test("scrub strips to the byte-identical pre-injection container") {
    // insert -> strip round-trips to the ORIGINAL bytes (the JDK PNG
    // writer emits only structural chunks, all on the keep list)
    val clean = Multimodal.syntheticImages(spark, docs.limit(40))
      .as[Multimodal.MediaRecord].collect().map(r => r.media_id -> r.payload)
      .toMap
    val scrubbed = MediaScrub.scrub(mix.filter(col("media_id") < 40))
      .as[Multimodal.MediaRecord].collect()
    scrubbed.foreach { r =>
      assert(java.util.Arrays.equals(r.payload, clean(r.media_id)),
        s"media_id=${r.media_id}: scrub did not restore the original bytes")
    }
    // and the pixels decode identically (by construction, pinned anyway)
    val p = scrubbed.find(_.media_id == 0L).get.payload
    val a = Multimodal.ImageCodec.read(p)
    val b = Multimodal.ImageCodec.read(clean(0L))
    assert(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    assert((0 until a.getHeight).forall(y => (0 until a.getWidth).forall(
      x => a.getRGB(x, y) == b.getRGB(x, y))))
  }

  test("WAV scrub: LIST/INFO chunks strip, bytes restore, clip still decodes") {
    val wavMix = Multimodal.syntheticAudioWithMetadata(spark, docs)
    val rep = MediaScrub.scrubReport(wavMix)
    val wrong = rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(rep.filter(col("had_metadata"))
      .filter(!array_contains(col("stripped_types"), "LIST")).count() == 0)
    // insert -> strip restores the exact pre-injection container
    val clean = Multimodal.syntheticAudioVariants(spark, docs.limit(40),
      groups = 20).as[Multimodal.MediaRecord].collect()
      .map(r => r.media_id -> r.payload).toMap
    val scrubbed = MediaScrub.scrub(wavMix.filter(col("media_id") < 40))
      .as[Multimodal.MediaRecord].collect()
    scrubbed.foreach { r =>
      assert(java.util.Arrays.equals(r.payload, clean(r.media_id)),
        s"media_id=${r.media_id}: WAV scrub did not restore the original")
    }
    // the injected container itself still decodes (trailing LIST chunk)
    val injected = wavMix.filter(col("media_id") === 0)
      .as[Multimodal.MediaRecord].head().payload
    assert(AudioDedup.decodeMono(injected).length > 0)
  }

  test("GIF scrub: comment extensions strip, bytes restore, frames intact") {
    val gifMix = Multimodal.syntheticGifsWithMetadata(spark, docs)
    val rep = MediaScrub.scrubReport(gifMix)
    val wrong = rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(rep.filter(col("had_metadata"))
      .filter(!array_contains(col("stripped_types"), "COM")).count() == 0)
    // insert -> strip restores the exact pre-injection container
    val clean = Multimodal.syntheticGifVariants(spark, docs.limit(40),
      groups = 20).as[Multimodal.MediaRecord].collect()
      .map(r => r.media_id -> r.payload).toMap
    val scrubbed = MediaScrub.scrub(gifMix.filter(col("media_id") < 40))
      .as[Multimodal.MediaRecord].collect()
    scrubbed.foreach { r =>
      assert(java.util.Arrays.equals(r.payload, clean(r.media_id)),
        s"media_id=${r.media_id}: GIF scrub did not restore the original")
    }
    // the injected container still decodes with all four frames
    val injected = gifMix.filter(col("media_id") === 0)
      .as[Multimodal.MediaRecord].head().payload
    Multimodal.GifCodec.withReader(injected) { reader =>
      assert(reader.getNumImages(true) == 4)
    }
  }

  test("AVI scrub: LIST/INFO blocks strip, bytes restore, frames intact") {
    val aviMix = Multimodal.syntheticAvisWithMetadata(spark,
      docs.filter(col("doc_id") < 120))
    val rep = MediaScrub.scrubReport(aviMix)
    val wrong = rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(rep.filter(col("had_metadata"))
      .filter(!array_contains(col("stripped_types"), "LIST:INFO"))
      .count() == 0)
    // insert -> strip restores the exact pre-injection container
    val clean = Multimodal.syntheticAviVideos(spark, docs.limit(40))
      .as[Multimodal.MediaRecord].collect()
      .map(r => r.media_id -> r.payload).toMap
    val scrubbed = MediaScrub.scrub(aviMix.filter(col("media_id") < 40))
      .as[Multimodal.MediaRecord].collect()
    scrubbed.foreach { r =>
      assert(java.util.Arrays.equals(r.payload, clean(r.media_id)),
        s"media_id=${r.media_id}: AVI scrub did not restore the original")
    }
    // the injected container still parses with its frames intact
    val injected = aviMix.filter(col("media_id") === 0)
      .as[Multimodal.MediaRecord].head().payload
    assert(AviCodec.open(injected).numFrames == 2)
    // JUNK padding (a smuggling spot players skip unread) strips too
    val junk = new Array[Byte](8 + 16)
    System.arraycopy("JUNK".getBytes("US-ASCII"), 0, junk, 0, 4)
    junk(4) = 16
    System.arraycopy("lat=1,lon=2 ops!".getBytes("US-ASCII"), 0, junk, 8, 16)
    val base = clean(1L)
    val withJunk = new Array[Byte](base.length + junk.length)
    System.arraycopy(base, 0, withJunk, 0, 12)
    System.arraycopy(junk, 0, withJunk, 12, junk.length)
    System.arraycopy(base, 12, withJunk, 12 + junk.length, base.length - 12)
    val riffSize = withJunk.length - 8
    withJunk(4) = (riffSize & 0xff).toByte
    withJunk(5) = ((riffSize >> 8) & 0xff).toByte
    withJunk(6) = ((riffSize >> 16) & 0xff).toByte
    withJunk(7) = ((riffSize >> 24) & 0xff).toByte
    val (cleaned, dropped) = MediaScrub.stripAvi(withJunk)
    assert(dropped == Seq("JUNK"), dropped.toString)
    assert(java.util.Arrays.equals(cleaned, base),
      "JUNK strip must restore the exact original container")
  }

  test("JPEG scrub: APP1 Exif strips, scans stay byte-identical, pixels intact") {
    val jpgs = Multimodal.syntheticJpegsWithMetadata(spark,
      docs.filter(col("doc_id") < 80))
    // report: APP1 on %4=0, trailing on %4=2, clean otherwise; no decode
    val before = Multimodal.MediaCounters.imageReads.get()
    val rep = MediaScrub.scrubReport(jpgs)
    val wrong = rep.filter(col("had_metadata") =!=
      (pmod(col("media_id"), lit(4L)) === 0 ||
        pmod(col("media_id"), lit(4L)) === 2))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(rep.filter(pmod(col("media_id"), lit(4L)) === 0)
      .filter(!array_contains(col("stripped_types"), "APP1")).count() == 0)
    assert(rep.filter(pmod(col("media_id"), lit(4L)) === 2)
      .filter(!array_contains(col("stripped_types"), "TRAILING"))
      .count() == 0)
    assert(Multimodal.MediaCounters.imageReads.get() == before,
      "the segment walk must never decode")
    // insert -> strip restores the EXACT original bytes (the JDK JPEG
    // writer emits only JFIF APP0 + coding segments, all kept)
    // pin media_id 0 (4-aligned): head() over the distributed fixture
    // is partition-order-dependent
    val dirty = jpgs.filter(col("media_id") === 0)
      .as[Multimodal.MediaRecord].head()
    val (clean, dropped) = MediaScrub.stripJpeg(dirty.payload)
    assert(dropped == Seq("APP1"))
    assert(!new String(clean, "ISO-8859-1").contains("device=cam"))
    val img = Multimodal.ImageCodec.read(clean)
    assert(img != null && img.getWidth == 16)
    // idempotent + clean passthrough by reference
    assert(MediaScrub.stripJpeg(clean)._1 eq clean)
    // scrub() output carries no metadata and still hashes like clean
    val scrubbed = MediaScrub.scrub(jpgs)
    assert(MediaScrub.scrubReport(scrubbed)
      .filter(col("had_metadata")).count() == 0)
    val ha = ImageDedup.hashImages(scrubbed).withColumnRenamed("dhash", "a")
    val hb = ImageDedup.hashImages(jpgs).withColumnRenamed("dhash", "b")
    assert(ha.join(hb, "media_id").filter(col("a") =!= col("b"))
      .count() == 0, "scrub must never change decoded pixels")
    // a truncated APP segment refuses loudly
    val bad = java.util.Arrays.copyOf(dirty.payload, 40)
    val e = intercept[IllegalArgumentException] { MediaScrub.stripJpeg(bad) }
    assert(e.getMessage.contains("truncated") ||
      e.getMessage.contains("ran past"), e.getMessage)
  }

  test("bytes smuggled past the container end are stripped and reported") {
    def appended(b: Array[Byte]): Array[Byte] = {
      val smuggled = "lat=52.52,lon=13.40 operator=J.Doe".getBytes("US-ASCII")
      val out = java.util.Arrays.copyOf(b, b.length + smuggled.length)
      System.arraycopy(smuggled, 0, out, b.length, smuggled.length)
      out
    }
    val png = Multimodal.syntheticImages(spark, docs.limit(1))
      .as[Multimodal.MediaRecord].head().payload
    val wav = Multimodal.syntheticAudioVariants(spark, docs.limit(1),
      groups = 1).as[Multimodal.MediaRecord].head().payload
    val gif = Multimodal.syntheticGifVariants(spark, docs.limit(1),
      groups = 1).as[Multimodal.MediaRecord].head().payload
    val avi = Multimodal.syntheticAviVideos(spark, docs.limit(1))
      .as[Multimodal.MediaRecord].head().payload
    // PNG: after IEND; WAV/AVI: beyond the declared RIFF size (the
    // header is NOT updated — players honor it, so the payload still
    // decodes); GIF: after the 0x3b trailer
    Seq(png -> (MediaScrub.stripPng _), wav -> (MediaScrub.stripWav _),
      gif -> (MediaScrub.stripGif _), avi -> (MediaScrub.stripAvi _))
      .foreach { case (clean, strip) =>
      val dirty = appended(clean)
      val (scrubbed, dropped) = strip(dirty)
      assert(dropped == Seq("TRAILING"), dropped.toString)
      assert(java.util.Arrays.equals(scrubbed, clean),
        "trailing-byte strip must restore the exact original container")
      // a clean container reports nothing and returns the SAME array
      val (again, none) = strip(clean)
      assert(none.isEmpty && (again eq clean))
    }
    // the table faces see it too: scrub removes, scrubReport reports
    val dirtyTable = Seq(
      (1L, "image", appended(png), "image/png", "t"),
      (2L, "audio", appended(wav), "audio/wav", "t"),
      (3L, "video", appended(gif), "image/gif", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val rep = MediaScrub.scrubReport(dirtyTable)
    assert(rep.filter(!col("had_metadata")).count() == 0)
    assert(rep.filter(!array_contains(col("stripped_types"), "TRAILING"))
      .count() == 0)
    val lens = MediaScrub.scrub(dirtyTable).as[Multimodal.MediaRecord]
      .collect().map(r => r.media_id -> r.payload.length).toMap
    assert(lens(1L) == png.length && lens(2L) == wav.length &&
      lens(3L) == gif.length)
  }

  test("non-PNG payloads pass through untouched; malformed PNGs refuse") {
    val wav = Multimodal.syntheticAudioVariants(spark, docs.limit(2),
      groups = 2)
    val out = MediaScrub.scrub(wav).as[Multimodal.MediaRecord].collect()
    val in = wav.as[Multimodal.MediaRecord].collect()
    assert(out.sortBy(_.media_id).zip(in.sortBy(_.media_id)).forall {
      case (o, i) => java.util.Arrays.equals(o.payload, i.payload)
    })
    // a truncated PNG refuses loudly instead of shipping silently
    val png = Multimodal.syntheticImages(spark, docs.limit(1))
      .as[Multimodal.MediaRecord].head().payload
    val truncated = png.take(png.length - 6)
    val e = intercept[IllegalArgumentException] {
      MediaScrub.stripPng(truncated)
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }
}
