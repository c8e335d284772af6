package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Multimodal.MediaRecord

/** Silence-split audio SEGMENTATION over REAL decoded samples — the
  * audio face of [[VideoScenes]], completing the segmentation family
  * across modalities (video = shot cuts, audio = silence gaps): a
  * speech/music corpus is packed and sampled per UTTERANCE, not per
  * file, and the utterance boundary is a run of silent windows (the
  * energy-threshold voice-activity shape). A segment is a maximal run
  * of non-silent fixed-duration windows; windows whose mean |amplitude|
  * falls below `minMeanAbs` split.
  *
  * Scale shape: map-only — one PCM decode per clip per job, window
  * energies computed in sample order inside the partition, a bounded
  * handful of segment rows out per clip. Nothing shuffles; at 100 TB of
  * audio the job cost IS the single decode pass, identical to
  * [[AudioDedup]]'s.
  */
object AudioScenes {

  /** One row per segment: (media_id, segment_idx, start_window,
    * n_windows) in `windowFrames`-sized window units (the trailing
    * partial window counts, its mean over its actual frames). A fully
    * silent clip emits ZERO rows — downstream gates
    * ([[MediaQuality.audioSignals]]' `silent`) own that defect class.
    * Non-audio payloads refuse loudly. */
  def segments(media: DataFrame, windowFrames: Int = 400,
               minMeanAbs: Long = 100L): DataFrame = {
    require(windowFrames >= 8, s"windowFrames=$windowFrames too small " +
      "for a meaningful energy window")
    require(minMeanAbs >= 1, s"minMeanAbs=$minMeanAbs must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      require(r.media_type == "audio",
        s"media_id=${r.media_id}: audio segmentation over ${r.media_type}")
      val samples = AudioDedup.decodeMono(r.payload)
      val nWin = (samples.length + windowFrames - 1) / windowFrames
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, Int)]
      var segIdx = 0
      var start = -1 // -1 = currently in silence
      var w = 0
      while (w < nWin) {
        val from = w * windowFrames
        val until = math.min(samples.length, from + windowFrames)
        var sumAbs = 0L
        var i = from
        while (i < until) { sumAbs += math.abs(samples(i)); i += 1 }
        val silent = sumAbs / (until - from) < minMeanAbs
        if (silent && start >= 0) {
          out += ((r.media_id, segIdx, start, w - start))
          segIdx += 1
          start = -1
        } else if (!silent && start < 0) start = w
        w += 1
      }
      if (start >= 0) out += ((r.media_id, segIdx, start, nWin - start))
      out.iterator
    }).toDF("media_id", "segment_idx", "start_window", "n_windows")
  }

  /** PCM sample-rate NORMALIZATION — the packing pre-pass for
    * mixed-source audio corpora (utterance packing and fingerprint
    * stores assume one rate; crawled audio arrives at many): linear-
    * interpolation resampling to `targetRate`, exact integer position
    * arithmetic (pos = i * srcRate / targetRate as a rational — no
    * float drift, engine-portable), re-encoded as 16-bit mono WAV.
    * Map-only: one decode + one encode per clip; output keeps the media
    * schema. Already-at-rate MONO clips pass through byte-untouched. */
  def resample(media: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate >= 1000 && targetRate <= 192000,
      s"targetRate=$targetRate outside [1000, 192000]")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.map { r =>
      require(r.media_type == "audio",
        s"media_id=${r.media_id}: resampling over ${r.media_type}")
      val (samples, srcRateF) = AudioDedup.decodeMonoWithRate(r.payload)
      val src = srcRateF.toInt
      require(src == srcRateF && src > 0,
        s"media_id=${r.media_id}: non-integral source rate $srcRateF")
      if (src == targetRate && isMonoWav16(r.payload)) r
      else {
        val n = samples.length
        val n2 = (n.toLong * targetRate / src).toInt
        require(n2 > 0, s"media_id=${r.media_id}: clip too short to " +
          s"resample from $src to $targetRate")
        val pcm = new Array[Byte](n2 * 2)
        var i = 0
        while (i < n2) {
          val posNum = i.toLong * src
          val idx = (posNum / targetRate).toInt
          val frac = posNum % targetRate
          val a = samples(idx)
          val b = samples(math.min(n - 1, idx + 1))
          val v = (a + (b - a) * frac / targetRate).toShort
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(targetRate.toFloat,
          16, 1, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n2.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
        r.copy(payload = bos.toByteArray, mime = "audio/wav")
      }
    }).toDF()
  }

  /** True when the payload is already a little-endian 16-bit MONO WAV
    * (the pass-through precondition — a stereo clip at the target rate
    * still needs the mono-izing rewrite). */
  private def isMonoWav16(payload: Array[Byte]): Boolean =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        f.getChannels == 1 && f.getSampleSizeInBits == 16 && !f.isBigEndian
      } finally in.close()
    } catch { case _: Exception => false }

  /** Per-clip segmentation card: (media_id, n_segments, content_windows,
    * max_segment_windows) — the packing view (a clip with one long
    * segment ships whole; many short ones pack per utterance). Clips
    * that emitted no segment (fully silent) do not appear — join against
    * the id frame when completeness is needed. */
  def segmentCard(media: DataFrame, windowFrames: Int = 400,
                  minMeanAbs: Long = 100L): DataFrame =
    segments(media, windowFrames, minMeanAbs)
      .groupBy("media_id")
      .agg(count("*").cast("long").as("n_segments"),
        sum("n_windows").cast("long").as("content_windows"),
        max("n_windows").cast("long").as("max_segment_windows"))
}
