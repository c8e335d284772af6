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
