package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VideoScenesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val videos =
    Multimodal.syntheticGifSceneVariants(spark, docs)

  test("scenes recover the planted shot structure through real decode") {
    val out = VideoScenes.scenes(videos, maxHamming = 8)
      .withColumn("want_scenes", pmod(col("media_id"), lit(4L)) + 1)
      .persist()
    try {
      // every scene is 2 frames starting at 2*scene_idx
      val wrong = out.filter(col("start_frame") =!= col("scene_idx") * 2 ||
        col("scene_frames") =!= 2)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // exactly 1 + id % 4 scenes per video, contiguous indices
      val counts = out.groupBy("media_id", "want_scenes")
        .agg(count("*").as("n"), max("scene_idx").as("top"))
      assert(counts.filter(col("n") =!= col("want_scenes") ||
        col("top") =!= col("want_scenes") - 1).count() == 0)
      assert(out.count() == docs.select(
        (pmod(col("doc_id"), lit(4L)) + 1).as("n")).agg(sum("n"))
        .as[Long].head())
    } finally { out.unpersist(); () }
  }

  test("within-scene noise never splits; the boundary is a real hard cut") {
    // noisy ids (odd) carry the sparse mask on every second frame: the
    // within-scene pair differs by a few dHash bits but must stay one
    // scene; a fixture where noise crossed maxHamming would be detecting
    // the mask, not the cut
    val noisy = VideoScenes.scenes(videos.filter(
      pmod(col("media_id"), lit(2L)) === 1), maxHamming = 8)
    assert(noisy.filter(col("scene_frames") =!= 2).count() == 0,
      "re-encode noise split a scene")
    // at a PERMISSIVE threshold the cut still registers (scene hashes are
    // random-far, not marginally-over-threshold)
    val loose = VideoScenes.scenes(videos.filter(col("media_id") === 3),
      maxHamming = 16)
    assert(loose.count() == 4, s"got ${loose.count()} scenes at bound 16")
  }

  test("sceneCard and keyframes derive from the same segmentation") {
    val card = VideoScenes.sceneCard(videos, maxHamming = 8)
    val wrong = card.filter(
      col("n_scenes") =!= pmod(col("media_id"), lit(4L)) + 1 ||
        col("n_frames") =!= (pmod(col("media_id"), lit(4L)) + 1) * 2 ||
        col("max_scene_frames") =!= 2)
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    val kf = VideoScenes.keyframes(videos, maxHamming = 8)
    assert(kf.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() == 0,
      "a keyframe off a scene start")
    assert(kf.count() == card.agg(sum("n_scenes")).as[Long].head())
  }

  test("keyframeImages bridge scenes into the image stack, one decode") {
    val v = videos.filter(col("media_id") < 40)
    val n = v.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    val kf = VideoScenes.keyframeImages(v, maxHamming = 8).persist()
    try {
      val nKf = kf.count() // materialize ON the cache: one decode pass
      assert(c.get() - before == n,
        s"keyframeImages decoded ${c.get() - before} times for $n videos")
      assert(nKf == VideoScenes.scenes(v, maxHamming = 8).count())
      // one keyframe per planted scene, at the scene-start frame
      val wrong = kf.filter(pmod(col("frame_idx"), lit(2)) =!= 0)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the extracted rows are REAL images: the image hash pass accepts
      // them, and a keyframe's dHash equals its source GIF frame's
      // (cross-codec equality) — scene 0's keyframe is frame 0
      val asImages = kf
        .withColumn("media_id",
          col("media_id") * 100 + col("frame_idx")) // unique derived ids
        .select("media_id", "media_type", "payload", "mime", "source")
      val hashed = ImageDedup.hashImages(asImages)
      assert(hashed.count() == kf.count())
      val gifH = Multimodal.sampleGifFrames(v.filter(col("media_id") === 3),
        every = 1).count() // container frames for id 3: 4 scenes x 2
      assert(gifH == 8)
    } finally { kf.unpersist(); () }
  }

  test("sampleAtFps: time-uniform ticks, variable-frame-rate weighting") {
    // planted fixture: 100 ms/frame, duration 200*(1 + id%4) ms —
    // at 5 fps tick k shows frame 2k
    val v = videos.filter(col("media_id") < 40)
    val out = VideoScenes.sampleAtFps(v, fps = 5)
      .withColumn("want_ticks", pmod(col("media_id"), lit(4L)) + 1)
      .persist()
    try {
      val wrong = out.filter(col("frame_idx") =!= col("tick") * 2 ||
        col("t_ms") =!= col("tick") * 200)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.groupBy("media_id", "want_ticks")
        .agg(count("*").as("n"))
        .filter(col("n") =!= col("want_ticks")).count() == 0)
    } finally { out.unpersist(); () }
    // VARIABLE frame rate: delays 400/100/100 ms — by-time sampling at
    // 5 fps holds the slow first frame for two ticks (by-index would
    // weight all frames equally)
    def gray(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach { x =>
        val g = (seed * 83 + x * 31 + y * 17) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      })
      img
    }
    val vfr = Multimodal.GifCodec.writeAnimatedVfr(
      Seq(gray(1), gray(2), gray(3)), Seq(40, 10, 10))
    val media = Seq((7L, "video", vfr, "image/gif", "vfr"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val ticks = VideoScenes.sampleAtFps(media, fps = 5)
      .select("tick", "frame_idx", "t_ms")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(ticks == Seq((0, 0, 0L), (1, 0, 200L), (2, 1, 400L)),
      ticks.toString)
    val e = intercept[IllegalArgumentException] {
      VideoScenes.sampleAtFps(media, fps = 3)
    }
    assert(e.getMessage.contains("divisor"), e.getMessage)
    // ZERO-delay GIFs (delayTime=0 is common in the wild) must not
    // silently vanish from the sampled corpus: browsers render delay
    // <= 1 cs as 10 cs, and so does by-time sampling — three 0-delay
    // frames sample as 100 ms each at 5 fps
    val zeroDelay = Multimodal.GifCodec.writeAnimatedVfr(
      Seq(gray(4), gray(5), gray(6)), Seq(0, 0, 0))
    val zd = Seq((8L, "video", zeroDelay, "image/gif", "zd"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val zdTicks = VideoScenes.sampleAtFps(zd, fps = 5)
      .select("tick", "frame_idx", "t_ms")
      .as[(Int, Int, Long)].collect().sortBy(_._1).toSeq
    assert(zdTicks == Seq((0, 0, 0L), (1, 2, 200L)), zdTicks.toString)
  }

  test("one decode per video; non-video payloads refuse loudly") {
    val v = videos.filter(col("media_id") < 100)
    val n = v.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    VideoScenes.scenes(v, maxHamming = 8).count(): Unit
    assert(c.get() - before == n,
      s"scenes decoded ${c.get() - before} times for $n videos")
    val imgs = Multimodal.syntheticImages(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      VideoScenes.scenes(imgs).count()
    }
    assert(e.getMessage != null)
  }
}
