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
