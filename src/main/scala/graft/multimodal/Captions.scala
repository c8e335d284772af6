package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Subtitle/caption track parsing — the TEXT side of video-text
  * training pairs: a crawl's videos arrive with SRT or WebVTT
  * sidecars, and the pipeline needs them as timed rows so caption
  * text can run the text stack (language ID, quality, dedup,
  * leak-gating in [[PairedCuration]]) per CUE with timing intact.
  *
  * Pure parsing, no codec: SRT blocks (`index?, HH:MM:SS,mmm -->
  * HH:MM:SS,mmm, text lines, blank`) and WebVTT (`WEBVTT` header,
  * NOTE/STYLE blocks skipped, optional cue ids, `MM:SS.mmm` and
  * `HH:MM:SS.mmm` timings, cue settings after the end stamp).
  * Malformed timings refuse loudly — a silently dropped cue is a
  * silently mis-aligned training pair.
  *
  * Scale: [[cues]] is a map-only flatMap — one task parses its
  * partition's tracks, no shuffle until the caller aggregates.
  */
object Captions {

  final case class Cue(seq: Int, startMs: Long, endMs: Long, text: String)

  private val Srt = """(\d{1,2}):(\d{2}):(\d{2})[,.](\d{1,3})""".r
  private val VttHms = """(\d{1,2}):(\d{2}):(\d{2})\.(\d{1,3})""".r
  private val VttMs = """(\d{1,2}):(\d{2})\.(\d{1,3})""".r

  private def srtStamp(s: String): Long = s.trim match {
    case Srt(h, m, sec, ms) =>
      h.toLong * 3600000L + m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case other => throw new IllegalArgumentException(
      s"malformed SRT timestamp '$other'")
  }

  private def vttStamp(s: String): Long = s.trim match {
    case VttHms(h, m, sec, ms) =>
      h.toLong * 3600000L + m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case VttMs(m, sec, ms) =>
      m.toLong * 60000L + sec.toLong * 1000L + ms.toLong
    case other => throw new IllegalArgumentException(
      s"malformed WebVTT timestamp '$other'")
  }

  def isVtt(s: String): Boolean =
    s.replaceFirst("^﻿", "").startsWith("WEBVTT")

  /** Parse an SRT track into cues (sequence numbers re-derived from
    * order — wild files renumber unreliably). */
  def parseSrt(track: String): Seq[Cue] = {
    val blocks = track.replace("\r\n", "\n").split("\n{2,}")
      .map(_.trim).filter(_.nonEmpty)
    blocks.zipWithIndex.map { case (block, i) =>
      val lines = block.split('\n')
      // optional numeric index line before the timing line
      val tIdx = lines.indexWhere(_.contains("-->"))
      require(tIdx >= 0 && tIdx <= 1,
        s"SRT block $i has no timing line: '${block.take(60)}'")
      val Array(a, b) = lines(tIdx).split("-->").map(_.trim)
      val start = srtStamp(a)
      val end = srtStamp(b)
      require(end >= start, s"SRT cue $i ends before it starts")
      Cue(i, start, end, lines.drop(tIdx + 1).mkString("\n"))
    }.toSeq
  }

  /** Parse a WebVTT track into cues. */
  def parseVtt(track: String): Seq[Cue] = {
    val body = track.replaceFirst("^﻿", "").replace("\r\n", "\n")
    require(body.startsWith("WEBVTT"), "not a WebVTT track")
    val blocks = body.split("\n{2,}").map(_.trim).filter(_.nonEmpty).drop(1)
    val cues = blocks.filterNot(b =>
      b.startsWith("NOTE") || b.startsWith("STYLE") || b.startsWith("REGION"))
    cues.zipWithIndex.map { case (block, i) =>
      val lines = block.split('\n')
      val tIdx = lines.indexWhere(_.contains("-->"))
      require(tIdx >= 0 && tIdx <= 1,
        s"WebVTT cue $i has no timing line: '${block.take(60)}'")
      val parts = lines(tIdx).split("-->")
      require(parts.length == 2, s"WebVTT cue $i timing malformed")
      val start = vttStamp(parts(0))
      // cue settings (position/align/...) trail the end stamp
      val end = vttStamp(parts(1).trim.split("\\s+").head)
      require(end >= start, s"WebVTT cue $i ends before it starts")
      Cue(i, start, end, lines.drop(tIdx + 1).mkString("\n"))
    }.toSeq
  }

  /** Parse either format (VTT detected by header). */
  def parse(track: String): Seq[Cue] =
    if (isVtt(track)) parseVtt(track) else parseSrt(track)

  /** Explode a (media_id, caption-track string) table into one row per
    * cue: (media_id, seq, t_start_ms, t_end_ms, text). Map-only. */
  def cues(tracks: DataFrame, trackCol: String = "caption"): DataFrame = {
    val spark = tracks.sparkSession
    import spark.implicits._
    tracks.select(col("media_id").cast("long"), col(trackCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, track) =>
        require(track != null, s"media_id=$id: caption track is null")
        parse(track).map(c => (id, c.seq, c.startMs, c.endMs, c.text))
      }
      .toDF("media_id", "seq", "t_start_ms", "t_end_ms", "text")
  }
}
