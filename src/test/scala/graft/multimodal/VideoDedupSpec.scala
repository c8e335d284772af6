package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val variants =
    Multimodal.syntheticGifVariants(spark, docs, groups = 20)

  test("fps-invariant dedup: VFR and CFR renders of one timeline group together") {
    val vv = Multimodal.syntheticVfrVariants(spark,
      docs.filter(col("doc_id") < 80), groups = 20)
    val n = vv.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    // time-sampled fingerprints: the frame on screen at every 100 ms
    // tick matches across renders -> identical fold -> one exact group
    // per content timeline, min id = the group index
    val grouped = VideoDedup.exactGroupsAtFps(vv, fps = 10)
    assert(grouped.filter(
      col("group_rep") =!= pmod(col("media_id"), lit(20L))).count() == 0)
    assert(c.get() - before == n,
      s"time-sampled fold decoded ${c.get() - before} containers for $n")
    // THE GAP IS REAL: the index-based fold weights container frames,
    // not wall time — vote multiplicities 4/1/1/2 vs 1/1/1/1 drift the
    // two renders apart (exactly 2 distinct fingerprints per group)
    val idx = VideoDedup.hashVideos(vv)
      .withColumn("g", pmod(col("media_id"), lit(20L)))
    assert(idx.groupBy("g").agg(countDistinct("vhash").as("nh"))
      .filter(col("nh") =!= 2).count() == 0,
      "index-based folds unexpectedly agreed across frame rates")
    // tick 0 exists for ANY clip (delays clamp to >= 2 cs > 0 ms), so
    // even a sub-tick clip folds its first frame instead of folding air
    val tiny = Multimodal.GifCodec.writeAnimatedVfr(
      Seq(new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)), Seq(2)) // 20 ms
    assert(VideoDedup.fingerprint64AtFps(tiny, fps = 10) ==
      VideoDedup.fingerprint64(tiny))
  }

  test("fps-invariant decontamination flags what the whole-fold probe misses") {
    val corpus = Multimodal.syntheticVfrVariants(spark,
      docs.filter(expr("(doc_id div 20) % 2 = 0 AND doc_id < 120")),
      groups = 20)
    val eval = Multimodal.syntheticVfrVariants(spark,
      docs.filter(col("doc_id").between(20L, 24L)), groups = 20)
    val out = VideoDedup.decontaminateAtFps(corpus, eval,
      fps = 10, maxHamming = 3)
    try {
      assert(out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5)).count() == 0)
      // the index-based probe on the same fixture flags NOTHING: the
      // CFR eval re-render's fold drifts far from every VFR corpus fold
      val shallow = VideoDedup.decontaminate(corpus, eval, maxHamming = 3)
      try assert(shallow.filter(col("contaminated")).count() == 0)
      finally { shallow.unpersist(); () }
    } finally { out.unpersist(); () }
  }

  test("fingerprint geometry: perturbed near its base, distinct bases far") {
    val h = VideoDedup.hashVideos(variants)
      .withColumn("base", pmod(col("media_id"), lit(20L)))
      .withColumn("perturbed", expr("(media_id div 20) % 2 = 1"))
      .persist()
    try {
      // byte-identical renders -> one fingerprint per (base, parity)
      assert(h.groupBy("base", "perturbed")
        .agg(countDistinct("vhash").as("n"))
        .filter(col("n") =!= 1).count() == 0)
      val basil = h.filter(!col("perturbed")).select(col("base"),
        col("vhash").as("h0")).distinct()
      val dist = h.filter(col("perturbed")).join(basil, "base")
        .select(bit_count(col("vhash").bitwiseXOR(col("h0"))).as("d"))
        .agg(max("d")).as[Int].head()
      assert(dist <= 4, s"single-frame perturbation moved fingerprint by $dist bits")
      val cross = basil.select(col("base").as("ba"), col("h0").as("ha"))
        .crossJoin(basil.select(col("base").as("bb"), col("h0").as("hb")))
        .filter(col("ba") < col("bb"))
        .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(cross > 10, s"two distinct bases only $cross bits apart")
    } finally { h.unpersist(); () }
  }

  test("exactGroups: re-renders of a base share one representative") {
    val unperturbed = variants.filter(expr("(media_id div 20) % 2 = 0"))
    val g = VideoDedup.exactGroups(unperturbed)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(20L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
  }

  test("clusters recover the planted groups across frame perturbation") {
    val out = VideoDedup.clusters(variants, maxHamming = 4)
    try {
      val wrong = out.filter(col("cluster_id") =!= pmod(col("media_id"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.select("cluster_id").distinct().count() == 20)
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
  }

  test("incrementalSurvivors == exact anti-join; committed content drops") {
    val committed = VideoDedup.hashVideos(
      Multimodal.syntheticGifVariants(spark,
        docs.filter(col("doc_id") < 250), groups = 10))
      .select(col("vhash").cast("string").as("h"))
    val batch = Multimodal.syntheticGifVariants(spark,
      docs.filter(col("doc_id") >= 250), groups = 20)
    val out = VideoDedup.incrementalSurvivors(batch, committed)
    val want = graft.dedup.IncrementalDedup.survivorsExact(
      VideoDedup.hashVideos(batch), committed, "media_id",
      col("vhash").cast("string"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    // bases 0..9 were committed (same textures); bases 10..19 are new
    assert(out.filter(pmod(col("media_id"), lit(20L)) < 10).count() == 0)
    assert(out.count() > 0)
  }

  test("decontaminate flags exactly the eval groups' videos") {
    val eval = variants.filter(col("media_id") < 5)
    val out = VideoDedup.decontaminate(variants, eval, maxHamming = 4)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == docs.count())
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      VideoDedup.decontaminate(variants, variants, maxHamming = 4,
        maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("frame overlap: clipped/extended copies cluster where the fold cannot see") {
    val ov = Multimodal.syntheticGifOverlapVariants(spark, docs, groups = 20)
    // the extended copies really do share all 4 base frames
    val pairs = VideoDedup.sharedFramePairs(ov, maxHamming = 2, minShared = 2)
    try {
      val cross = pairs.filter(
        pmod(col("id_a"), lit(20L)) =!= pmod(col("id_b"), lit(20L)))
      assert(cross.count() == 0, cross.limit(5).collect().mkString("; "))
      assert(pairs.filter(col("shared") < 4).count() == 0,
        "every within-group pair shares all 4 base frames")
    } finally { pairs.unpersist(); () }
    val out = VideoDedup.overlapClusters(ov, maxHamming = 2, minShared = 2)
    try {
      val wrong = out.filter(col("cluster_id") =!= pmod(col("media_id"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.select("cluster_id").distinct().count() == 20)
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
    // one container decode per video per job
    val n = ov.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    VideoDedup.overlapClusters(ov, maxHamming = 2, minShared = 2).unpersist()
    assert(c.get() - before == n,
      s"overlapClusters decoded ${c.get() - before} containers for $n videos")
  }

  test("frame overlap survives 60-bit media ids (no packing overflow)") {
    // readMediaDir assigns media_id = portableHash60 — a uniform 60-bit
    // hash, far past the old composite-id radix (2^51). The struct-keyed
    // banding must pair and cluster those ids exactly like small ones.
    val offset = 20L * ((1L << 59) / 20L + 1L) // > 2^51, multiple of 20
    val ov = Multimodal.syntheticGifOverlapVariants(
      spark, docs.filter(col("doc_id") < 100), groups = 20)
      .withColumn("media_id", col("media_id") + lit(offset))
    val pairs = VideoDedup.sharedFramePairs(ov, maxHamming = 2, minShared = 2)
    try {
      assert(pairs.count() > 0)
      val cross = pairs.filter(
        pmod(col("id_a"), lit(20L)) =!= pmod(col("id_b"), lit(20L)))
      assert(cross.count() == 0, cross.limit(5).collect().mkString("; "))
    } finally { pairs.unpersist(); () }
    val out = VideoDedup.overlapClusters(ov, maxHamming = 2, minShared = 2)
    try {
      val wrong = out.filter(
        pmod(col("cluster_id"), lit(20L)) =!= pmod(col("media_id"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.select("cluster_id").distinct().count() == 20)
      assert(out.agg(min("media_id")).as[Long].head() > (1L << 51),
        "test must exercise the past-radix id regime")
    } finally { out.unpersist(); () }
  }

  test("decontaminateFrames flags videos containing an eval IMAGE as a frame") {
    // eval = standalone PNG renders of frame 1 of groups 0..4 — pixel-
    // identical to those videos' actual frame 1 (unperturbed copies) and
    // within the Hamming bound for perturbed ones (frame 1 carries the
    // sparse mask). Whole-video fingerprints can't see one frame; the
    // frame-level probe must.
    val eval = Multimodal.syntheticGifFrameImages(
      spark, docs.filter(col("doc_id") < 5), groups = 20, frame = 1)
    // cross-codec sanity: the PNG render dHashes exactly like the GIF
    // frame (both codecs round-trip 8-bit gray losslessly)
    val evalH = ImageDedup.hashImages(eval)
      .select(col("media_id").as("base"), col("dhash").as("ih"))
    val frameH = VideoDedup.hashFrames(
      variants.filter(col("media_id") < 5), every = 1)
      .filter(col("frame_idx") === 1)
      .select(col("media_id").as("base"), col("fhash"))
    val d = evalH.join(frameH, "base")
      .select(bit_count(col("ih").bitwiseXOR(col("fhash"))).as("d"))
      .agg(max("d")).as[Int].head()
    assert(d == 0, s"PNG eval render dHashes $d bits from the GIF frame")
    val out = VideoDedup.decontaminateFrames(variants, eval, maxHamming = 3)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == docs.count())
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    // decode accounting: one container decode per video, one image
    // decode per eval record
    val n = variants.count()
    val cv = Multimodal.MediaCounters.videoReads
    val ci = Multimodal.MediaCounters.imageReads
    val (bv, bi) = (cv.get(), ci.get())
    VideoDedup.decontaminateFrames(variants, eval, maxHamming = 3).unpersist()
    assert(cv.get() - bv == n, s"decoded ${cv.get() - bv} containers for $n")
    assert(ci.get() - bi == 5, s"decoded ${ci.get() - bi} eval images for 5")
  }

  test("one container decode per video per job: the hash frame is persisted") {
    val n = variants.count()
    val c = Multimodal.MediaCounters.videoReads
    var before = c.get()
    VideoDedup.clusters(variants, maxHamming = 4).unpersist()
    assert(c.get() - before == n,
      s"clusters decoded ${c.get() - before} containers for $n videos")
    before = c.get()
    VideoDedup.nearDupPairs(VideoDedup.hashVideos(variants), maxHamming = 4)
      .unpersist()
    assert(c.get() - before == n,
      s"nearDupPairs decoded ${c.get() - before} containers for $n videos")
  }

  test("non-video and non-GIF payloads refuse loudly") {
    val imgs = Multimodal.syntheticImages(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      VideoDedup.hashVideos(imgs).collect()
    }
    assert(e.getMessage != null)
    val junk = Seq((1L, "video", Array[Byte](9, 9, 9, 9, 9, 9, 9),
      "video/mp4", "t"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e2 = intercept[org.apache.spark.SparkException] {
      VideoDedup.hashVideos(junk).collect()
    }
    assert(e2.getMessage != null)
  }

  test("survivorsByFrames keeps the longest cut per cluster from one decode") {
    val ov = Multimodal.syntheticGifOverlapVariants(spark,
      docs.filter(col("doc_id") < 120), groups = 20)
    val n = ov.count()
    val c = Multimodal.MediaCounters.videoReads
    val before = c.get()
    val out = VideoDedup.survivorsByFrames(ov, maxHamming = 2, minShared = 2)
    try {
      // frame counts come from the SAME pass as the overlap edges
      assert(c.get() - before == n,
        s"decoded ${c.get() - before} times for $n videos")
      // every cluster keeps its 6-frame extended cut; ties to min id, so
      // the EARLIEST extended copy (id g+40 among g+40 and g+100) wins
      val got = out.select("media_id", "n_frames").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      val want = (0 until 20).map(g => (g + 40L, 6L))
      assert(got == want, s"survivors: $got")
    } finally { out.unpersist(); () }
  }
}
