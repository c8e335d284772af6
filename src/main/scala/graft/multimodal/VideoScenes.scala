package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Multimodal.{MediaCounters, MediaRecord}

/** SCENE-CUT detection over REAL decoded video frames — the video
  * segmentation pass a frame-sampling training pipeline runs before
  * choosing which frames to keep: uniform sampling over-represents long
  * static scenes and misses short ones entirely; sampling one keyframe
  * per SCENE is content-balanced. A scene boundary is a consecutive
  * frame pair whose dHashes differ by more than `maxHamming` bits (hard
  * cut); within-scene re-compression noise moves a frame hash by only a
  * couple of bits, the same tolerance the dedup faces use.
  *
  * Scale shape: map-only — one container decode per video per job, frame
  * hashes compared in decode order inside the partition, a bounded
  * handful of scene rows out per video. Nothing shuffles; at 100 TB of
  * video the job cost IS the single decode pass, identical to
  * [[VideoDedup]]'s. Reference scope: the reference has no media
  * operators at all (it is a data-integration framework); this face
  * implements the standard shot-boundary-by-frame-distance construction
  * on Spark.
  */
object VideoScenes {

  /** Decode once, dHash every `every`-th frame in order. */
  private def frameHashes(payload: Array[Byte], every: Int): Array[Long] = {
    require(every >= 1, s"every=$every must be >= 1")
    require(VideoCodec.isVideo(payload),
      "payload is not a decodable video container (GIF/AVI) — no " +
        "in-JVM codec for mp4/webm")
    MediaCounters.videoReads.incrementAndGet(): Unit
    VideoCodec.withFrames(payload) { v =>
      val n = v.numFrames
      require(n >= 1, "video container holds no frames")
      Iterator.range(0, n, every)
        .map { i =>
          val (l, fw, fh) = v.lumaFrame(i)
          ImageDedup.dHashOfLuma(l, fw, fh)
        }.toArray
    }
  }

  /** One row per detected scene: (media_id, scene_idx, start_frame,
    * scene_frames) — frame indices in SAMPLED units (multiply by `every`
    * for container frame numbers when subsampling). Every video emits at
    * least one scene. Non-video payloads refuse loudly. */
  def scenes(media: DataFrame, maxHamming: Int = 8,
             every: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 32,
      s"maxHamming $maxHamming not in [0,32]")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      require(r.media_type == "video",
        s"media_id=${r.media_id}: scene detection over ${r.media_type}")
      val hs = frameHashes(r.payload, every)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, Int)]
      var sceneIdx = 0
      var start = 0
      var i = 1
      while (i < hs.length) {
        if (java.lang.Long.bitCount(hs(i) ^ hs(i - 1)) > maxHamming) {
          out += ((r.media_id, sceneIdx, start, i - start))
          sceneIdx += 1
          start = i
        }
        i += 1
      }
      out += ((r.media_id, sceneIdx, start, hs.length - start))
      out.iterator
    }).toDF("media_id", "scene_idx", "start_frame", "scene_frames")
  }

  /** Per-video scene card: (media_id, n_frames, n_scenes,
    * max_scene_frames) from the SAME single-decode pass shape — the
    * volume view (a static banner = 1 scene; a slideshow = n_frames
    * scenes) feeding sampling-rate decisions. */
  def sceneCard(media: DataFrame, maxHamming: Int = 8,
                every: Int = 1): DataFrame =
    scenes(media, maxHamming, every)
      .groupBy("media_id")
      .agg((max(col("start_frame") + col("scene_frames"))).as("n_frames"),
        count("*").cast("long").as("n_scenes"),
        max("scene_frames").cast("long").as("max_scene_frames"))

  /** KEYFRAME selection: the first frame index of every scene — the
    * content-balanced sampling set (one representative per scene instead
    * of every `k`-th frame). Output (media_id, frame_idx), ready for
    * [[Multimodal.sampleGifFrames]]-style extraction. */
  def keyframes(media: DataFrame, maxHamming: Int = 8,
                every: Int = 1): DataFrame =
    scenes(media, maxHamming, every)
      .select(col("media_id"), col("start_frame").as("frame_idx"))

  /** TIME-uniform frame sampling — completes the sampling family
    * (by-INDEX: [[Multimodal.sampleGifFrames]]; by-SCENE: [[keyframes]];
    * by-TIME: this): frame i is on screen over [cum(i), cum(i+1)) ms
    * (GraphicControlExtension delays), and each tick t = k * 1000/fps
    * inside the clip's duration emits the frame displayed at t. A
    * variable-frame-rate GIF sampled by index over-represents its fast
    * sections; by-time sampling weights content by WALL TIME. Frame
    * delays <= 1 cs (zero/absent GCEs, common in wild GIFs) render as
    * 10 cs — the browser convention — so no clip silently collapses to
    * zero duration and vanishes from the sampled corpus. Map-only,
    * one container metadata+decode pass per video; output (media_id,
    * tick, frame_idx, t_ms). `fps` must divide 1000 (integer tick
    * arithmetic — deterministic across engines). */
  def sampleAtFps(media: DataFrame, fps: Int): DataFrame = {
    require(fps >= 1 && 1000 % fps == 0,
      s"fps=$fps must be a positive divisor of 1000 (integer ticks)")
    val intervalUs = 1000000L / fps
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      require(r.media_type == "video",
        s"media_id=${r.media_id}: fps sampling over ${r.media_type}")
      require(VideoCodec.isVideo(r.payload),
        "payload is not a decodable video container (GIF/AVI) — no " +
          "in-JVM codec for mp4/webm")
      MediaCounters.videoReads.incrementAndGet(): Unit
      VideoCodec.withFrames(r.payload) { v =>
        val n = v.numFrames
        require(n >= 1, "video container holds no frames")
        // cumulative wall-clock starts in MICROSECONDS: renderedDelayUs
        // applies GIF's <= 1 cs -> 10 cs browser convention (a wild GIF
        // with zero/absent GCE delays must not collapse to zero duration
        // and vanish from the sampled corpus) while explicit AVI header
        // timing passes through at full µs precision
        val starts = new Array[Long](n + 1)
        var i = 0
        while (i < n) {
          starts(i + 1) = starts(i) + v.renderedDelayUs(i)
          i += 1
        }
        val total = starts(n)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Int, Long)]
        var k = 0
        var frame = 0
        var t = 0L
        while (t < total) {
          while (frame + 1 < n && starts(frame + 1) <= t) frame += 1
          out += ((r.media_id, k, frame, t / 1000L))
          k += 1
          t = k.toLong * intervalUs
        }
        out.toVector
      }
    }).toDF("media_id", "tick", "frame_idx", "t_ms")
  }

  /** Extract every scene's keyframe as a standalone IMAGE row — the
    * bridge from the video stack into the image stack: keyframes flow
    * into image dedup, tile decontamination and quality gates as
    * first-class images (PNG re-encode; the PNG-vs-GIF dHash equality is
    * pinned by the cross-modal decontamination suite). Output keeps the
    * source lineage — (media_id = the VIDEO's id, frame_idx, media_type
    * 'image', payload, mime, source); single-id image faces need a
    * unique key, so derive one or join on (media_id, frame_idx).
    * `frame_idx` is the CONTAINER frame index (already multiplied by
    * `every`, unlike [[scenes]]' sampled units). Segmentation +
    * extraction + re-encode all ride ONE container decode per video. */
  def keyframeImages(media: DataFrame, maxHamming: Int = 8,
                     every: Int = 1): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 32,
      s"maxHamming $maxHamming not in [0,32]")
    require(every >= 1, s"every=$every must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(_.flatMap { r =>
      require(r.media_type == "video",
        s"media_id=${r.media_id}: keyframe extraction over ${r.media_type}")
      require(VideoCodec.isVideo(r.payload),
        "payload is not a decodable video container (GIF/AVI) — no " +
          "in-JVM codec for mp4/webm")
      MediaCounters.videoReads.incrementAndGet(): Unit
      VideoCodec.withFrames(r.payload) { v =>
        val n = v.numFrames
        require(n >= 1, "video container holds no frames")
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, String, Array[Byte], String, String)]
        var prev = 0L
        var i = 0
        var sampled = 0
        while (i < n) {
          // hash from the luma fast path; decode full pixels ONLY for
          // the (rare) frames that become keyframes and need re-encode
          val (l, fw, fh) = v.lumaFrame(i)
          val h = ImageDedup.dHashOfLuma(l, fw, fh)
          // a scene starts at the first sampled frame and at every cut
          if (sampled == 0 ||
            java.lang.Long.bitCount(h ^ prev) > maxHamming)
            out += ((r.media_id, i, "image",
              Multimodal.ImageCodec.write(v.frame(i), "png"), "image/png",
              r.source))
          prev = h
          sampled += 1
          i += every
        }
        out.toVector // materialize before the reader is disposed
      }
    }).toDF("media_id", "frame_idx", "media_type", "payload", "mime",
      "source")
  }
}
