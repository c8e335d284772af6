package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AudioScenesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val clips =
    Multimodal.syntheticAudioSegmentVariants(spark, docs)

  test("segments recover the planted utterance structure") {
    val out = AudioScenes.segments(clips, windowFrames = 400)
      .withColumn("want", pmod(col("media_id"), lit(4L)) + 1)
      .persist()
    try {
      val wrong = out.filter(col("start_window") =!= col("segment_idx") * 3 ||
        col("n_windows") =!= 2)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      val counts = out.groupBy("media_id", "want")
        .agg(count("*").as("n"), max("segment_idx").as("top"))
      assert(counts.filter(col("n") =!= col("want") ||
        col("top") =!= col("want") - 1).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("a fully silent clip emits zero segments; trailing content closes") {
    // hand-built WAV: 400 silent frames only
    def wav(frames: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](frames.length * 2)
      frames.zipWithIndex.foreach { case (v, i) =>
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.length.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
      bos.toByteArray
    }
    val silent = wav(new Array[Short](800))
    // 400 loud + 200 trailing loud PARTIAL window
    val loud = wav(Array.tabulate[Short](600)(i =>
      (math.sin(2 * math.Pi * 400 * i / 8000.0) * 8000).toShort))
    val media = Seq(
      (1L, "audio", silent, "audio/wav", "s"),
      (2L, "audio", loud, "audio/wav", "s"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val out = AudioScenes.segments(media, windowFrames = 400)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(out == Set((2L, 0, 0, 2)), out.toString) // partial window counts
  }

  test("resample: exact-rational interpolation preserves the waveform") {
    val tones = Multimodal.syntheticAudioVariants(spark,
      docs.filter(col("doc_id") < 40), groups = 20)
    val res = AudioScenes.resample(tones, 16000)
      .as[Multimodal.MediaRecord].collect()
    res.foreach { r =>
      val (samples, rate) = {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = in.getFormat
        val bytes = in.readAllBytes(); in.close()
        (Array.tabulate(bytes.length / 2)(i =>
          (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
            .toInt), f.getSampleRate.toInt)
      }
      assert(rate == 16000 && samples.length == 1600,
        s"media_id=${r.media_id}: rate=$rate n=${samples.length}")
      // the waveform is still the planted tone: compare against the
      // analytic sine at the new rate (linear interp of a smooth tone
      // stays within a few percent of full scale)
      val base = (r.media_id % 20).toInt
      val amp = if ((r.media_id / 20) % 2 == 1) 7000.0 else 14000.0
      val freq = 200.0 + base * 50.0
      // the final target samples clamp at the clip edge (no source
      // sample beyond the end) — fidelity holds on the interior, within
      // linear interpolation's chord sag amp*(1 - cos(pi*f/src)) at the
      // tone's frequency
      val maxDev = samples.zipWithIndex.dropRight(2).map { case (s, i) =>
        math.abs(s - math.sin(2 * math.Pi * freq * i / 16000.0) * amp)
      }.max
      val bound = amp * (1 - math.cos(math.Pi * freq / 8000.0)) * 1.2 + 60
      assert(maxDev < bound,
        s"media_id=${r.media_id}: resampled tone deviates $maxDev " +
          s"(chord-sag bound $bound at $freq Hz)")
    }
    // the rate-normalized store property: after resampling, the volume
    // variants of a group still fingerprint together (ids 0..19 vs
    // 20..39 are the same tones at half amplitude) and distinct groups
    // stay far — dedup over a normalized store keeps working
    val fps = res.map(r => r.media_id -> AudioDedup.fingerprint64(r.payload))
      .toMap
    (0L until 20L).foreach { g =>
      val d = java.lang.Long.bitCount(fps(g) ^ fps(g + 20))
      assert(d <= 2, s"group $g volume variants $d bits apart after resample")
    }
    // pitch resolution halves at the doubled rate (crossings per frame
    // halve), so ADJACENT 50 Hz groups legitimately compress; groups a
    // musical distance apart (>= 200 Hz) must stay far
    val far = (for { a <- 0L until 20L; b <- 0L until 20L if b - a >= 4 }
      yield java.lang.Long.bitCount(fps(a) ^ fps(b))).min
    assert(far > 4, s"two distant groups only $far bits apart after resample")
    // a clip already mono-16-bit at the target rate passes through
    // byte-untouched
    val at16k = AudioScenes.resample(AudioScenes.resample(tones, 16000),
      16000).as[Multimodal.MediaRecord].collect()
      .map(r => r.media_id -> r.payload).toMap
    res.foreach { r =>
      assert(java.util.Arrays.equals(r.payload, at16k(r.media_id)),
        s"media_id=${r.media_id}: at-rate clip was rewritten")
    }
  }

  test("segmentCard aggregates per clip; one decode per clip") {
    val v = clips.filter(col("media_id") < 100)
    val card = AudioScenes.segmentCard(v, windowFrames = 400)
    val wrong = card.filter(
      col("n_segments") =!= pmod(col("media_id"), lit(4L)) + 1 ||
        col("content_windows") =!= (pmod(col("media_id"), lit(4L)) + 1) * 2 ||
        col("max_segment_windows") =!= 2)
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    val n = v.count()
    val c = Multimodal.MediaCounters.audioReads
    val before = c.get()
    AudioScenes.segments(v, windowFrames = 400).count(): Unit
    assert(c.get() - before == n,
      s"segments decoded ${c.get() - before} times for $n clips")
    val imgs = Multimodal.syntheticImages(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      AudioScenes.segments(imgs).count()
    }
    assert(e.getMessage != null)
  }
}
