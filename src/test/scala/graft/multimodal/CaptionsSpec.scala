package graft.multimodal

import graft.SparkSpec

/** SRT/WebVTT caption parsing and the MP3 tag scrub: timed cues with
  * exact millisecond arithmetic, format auto-detection, loud refusals,
  * and byte-exact audio survival under tag stripping. */
class CaptionsSpec extends SparkSpec {

  test("SRT blocks parse with exact ms timing, indexes re-derived") {
    val srt =
      """1
        |00:00:01,500 --> 00:00:03,000
        |hello there
        |
        |2
        |00:01:00,250 --> 00:01:02,750
        |two lines
        |of text""".stripMargin
    val cues = Captions.parseSrt(srt)
    assert(cues.map(c => (c.seq, c.startMs, c.endMs)) ==
      Seq((0, 1500L, 3000L), (1, 60250L, 62750L)))
    assert(cues(1).text == "two lines\nof text")
  }

  test("WebVTT parses: NOTE blocks skipped, MM:SS stamps, cue settings") {
    val vtt =
      """WEBVTT
        |
        |NOTE this is ignored
        |
        |01:02.500 --> 01:04.000 align:start position:10%
        |short form
        |
        |cue-7
        |00:02:00.000 --> 00:02:01.250
        |long form""".stripMargin
    val cues = Captions.parseVtt(vtt)
    assert(cues.map(c => (c.startMs, c.endMs)) ==
      Seq((62500L, 64000L), (120000L, 121250L)))
    assert(cues(1).text == "long form")
    assert(Captions.isVtt(vtt) && !Captions.isVtt("1\n00:00:01,000..."))
  }

  test("malformed timings refuse loudly") {
    intercept[IllegalArgumentException] {
      Captions.parseSrt("1\n00:xx:01,000 --> 00:00:02,000\nbad")
    }
    intercept[IllegalArgumentException] {
      Captions.parseSrt("1\n00:00:03,000 --> 00:00:02,000\nbackwards")
    }
    intercept[IllegalArgumentException] {
      Captions.parseVtt("not a vtt at all")
    }
  }

  test("cues() explodes tracks map-only with planted arithmetic") {
    import spark.implicits._
    val tracks = Multimodal.syntheticCaptionTracks(spark,
      (0L until 12L).toDF("doc_id"))
    val rows = Captions.cues(tracks)
      .select("media_id", "seq", "t_start_ms", "t_end_ms").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    (0L until 12L).foreach { id =>
      val mine = rows.filter(_._1 == id).sortBy(_._2)
      assert(mine.length == 1 + (id % 4).toInt, s"id=$id")
      mine.foreach { case (_, k, s, e) =>
        assert(s == k * 2000L + (id % 5) * 100L && e == s + 1500L,
          s"id=$id k=$k")
      }
    }
  }

  test("MP3 tag scrub: ID3v2 + ID3v1 + APEv2 drop, audio bytes exact") {
    val audio = Array.tabulate[Byte](200)(i =>
      if (i % 4 == 0) 0xff.toByte else if (i % 4 == 1) 0xfb.toByte
      else (i & 0x7f).toByte)
    val tagged = MediaScrub.insertMp3Tags(audio,
      Some("artist rig-1 at 12.34,56.78"), id3v1 = true)
    assert(MediaScrub.mp3Report(tagged).sorted == Seq("ID3v1", "ID3v2"))
    val (clean, dropped) = MediaScrub.stripMp3(tagged)
    assert(dropped.sorted == Seq("ID3v1", "ID3v2"))
    assert(clean.sameElements(audio), "audio frames byte-identical")
    // tag-free payload passes through by reference
    val (again, d2) = MediaScrub.stripMp3(clean)
    assert(d2.isEmpty && (again eq clean))
    // APEv2 trailer
    val ape = new java.io.ByteArrayOutputStream()
    ape.write(audio)
    val item = "keyval".getBytes("US-ASCII")
    ape.write(item)
    ape.write("APETAGEX".getBytes("US-ASCII"))
    def le32(v: Int): Unit = { ape.write(v & 0xff); ape.write((v >> 8) & 0xff)
      ape.write((v >> 16) & 0xff); ape.write((v >> 24) & 0xff) }
    le32(2000) // version
    le32(item.length + 32) // size = items + footer
    le32(1) // item count
    le32(0) // flags: no header
    (0 until 8).foreach(_ => ape.write(0)) // reserved
    val (clean2, d3) = MediaScrub.stripMp3(ape.toByteArray)
    assert(d3 == Seq("APEv2") && clean2.sameElements(audio))
  }

  test("MediaScrub dispatch covers MP3 payloads") {
    import spark.implicits._
    val planted = Multimodal.syntheticMp3Audio(spark,
      (0L until 8L).toDF("doc_id"), plantMetadata = true)
    val rep = MediaScrub.scrubReport(planted)
      .select("media_id", "n_stripped").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 8L).foreach { id =>
      val want = if (id % 4 == 0) 2 else if (id % 4 == 2) 1 else 0
      assert(rep(id) == want, s"id=$id")
    }
  }
}
