package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WebP container faces: the RIFF metadata scrub (EXIF/XMP dropped,
  * image data + ICCP kept, VP8X presence flags cleared) and
  * header-only dims for all three forms (VP8L, VP8X, lossy VP8). */
class WebpSpec extends SparkSpec {

  private def webps(n: Int, plant: Boolean) = {
    import spark.implicits._
    Multimodal.syntheticWebpImages(spark,
      (0L until n.toLong).toDF("doc_id"), plantMetadata = plant)
  }

  test("scrub drops EXIF/XMP + trailing, keeps image data, clean rows untouched") {
    import spark.implicits._
    val planted = webps(24, plant = true).as[Multimodal.MediaRecord]
      .collect().map(r => r.media_id -> r.payload).toMap
    val clean = webps(24, plant = false).as[Multimodal.MediaRecord]
      .collect().map(r => r.media_id -> r.payload).toMap
    val scrubbed = MediaScrub.scrub(webps(24, plant = true))
      .as[Multimodal.MediaRecord].collect().map(r => r.media_id -> r.payload).toMap
    (0L until 24L).foreach { id =>
      if (id % 4 == 0) {
        // EXIF+XMP stripped; VP8X forms (id%3==1) also had flags set,
        // which scrubbing clears — byte-equal to the clean render
        assert(scrubbed(id).sameElements(clean(id)), s"id=$id")
        assert(!planted(id).sameElements(clean(id)), s"id=$id fixture")
      } else if (id % 4 == 2) {
        assert(scrubbed(id).sameElements(clean(id)), s"id=$id trailing")
      } else {
        assert(scrubbed(id).sameElements(planted(id)), s"id=$id untouched")
      }
    }
  }

  test("scrubReport counts per plant class") {
    val rep = MediaScrub.scrubReport(webps(24, plant = true))
      .select("media_id", "n_stripped").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 24L).foreach { id =>
      val want = if (id % 4 == 0) 2 else if (id % 4 == 2) 1 else 0
      assert(rep(id) == want, s"id=$id")
    }
  }

  test("ICCP survives the scrub (color is rendering info, not metadata)") {
    import spark.implicits._
    val base = webps(3, plant = false).as[Multimodal.MediaRecord]
      .collect().find(_.media_id == 0L).get
    // splice an ICCP chunk after the header
    val icc = "fake-icc-profile-bytes".getBytes("US-ASCII")
    val chunk = new Array[Byte](8 + icc.length)
    System.arraycopy("ICCP".getBytes("US-ASCII"), 0, chunk, 0, 4)
    chunk(4) = icc.length.toByte
    System.arraycopy(icc, 0, chunk, 8, icc.length)
    val spliced = base.payload ++ chunk
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val (out, dropped) = MediaScrub.stripWebp(spliced)
    assert(dropped.isEmpty && out.sameElements(spliced))
  }

  test("dims come from all three header forms with zero decodes") {
    import spark.implicits._
    val got = MediaQuality.aspectBuckets(webps(30, plant = false))
      .select("media_id", "width", "height").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    (0L until 30L).foreach { id =>
      val want = (16 + (id % 32).toInt, 16 + (id % 24).toInt)
      assert(got(id) == want, s"id=$id form=${id % 3}")
    }
  }

  test("VP8X flag bits are cleared in the scrubbed header") {
    import spark.implicits._
    // id=4: % 4 == 0 (planted EXIF+XMP) and % 3 == 1 (VP8X form)
    val planted = webps(5, plant = true).as[Multimodal.MediaRecord]
      .collect().find(_.media_id == 4L).get.payload
    assert((planted(20) & 0x0c) == 0x0c, "fixture sets EXIF|XMP flags")
    val (out, dropped) = MediaScrub.stripWebp(planted)
    assert(dropped.sorted == Seq("EXIF", "XMP "))
    assert((out(20) & 0x0c) == 0, "scrub clears the presence flags")
  }

  test("a broken WebP (truncated chunk) refuses loudly") {
    import spark.implicits._
    val ok = webps(1, plant = false).as[Multimodal.MediaRecord]
      .collect().head.payload
    val bad = java.util.Arrays.copyOfRange(ok, 0, ok.length - 3)
    // keep the RIFF size field honest so the walk reaches the torn chunk
    intercept[IllegalArgumentException] { MediaScrub.stripWebp(bad) }
  }
}
