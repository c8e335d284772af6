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
