package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val variants =
    Multimodal.syntheticImageVariants(spark, docs, groups = 25)

  test("dHash: deterministic, far across contents, near under perturbation") {
    val h = ImageDedup.hashImages(variants)
      .withColumn("base", pmod(col("media_id"), lit(25L)))
      .withColumn("perturbed", expr("(media_id div 25) % 2 = 1"))
      .persist()
    try {
      // unperturbed copies of a base are byte-identical -> ONE hash each
      assert(h.filter(!col("perturbed"))
        .groupBy("base").agg(countDistinct("dhash").as("n"))
        .filter(col("n") =!= 1).count() == 0)
      // perturbed variants stay within a small Hamming ball of their base
      val basil = h.filter(!col("perturbed")).select(col("base"),
        col("dhash").as("h0")).distinct()
      val dist = h.filter(col("perturbed")).join(basil, "base")
        .select(bit_count(col("dhash").bitwiseXOR(col("h0"))).as("d"))
        .agg(max("d")).as[Int].head()
      assert(dist <= 3, s"perturbation moved dHash by $dist bits")
      // distinct bases land FAR apart (pseudo-random textures)
      val cross = basil.select(col("base").as("ba"), col("h0").as("ha"))
        .crossJoin(basil.select(col("base").as("bb"), col("h0").as("hb")))
        .filter(col("ba") < col("bb"))
        .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(cross > 10, s"two distinct bases only $cross bits apart")
    } finally { h.unpersist(); () }
  }

  test("banding is a complete candidate generator within the Hamming bound") {
    // pure hash-level check, no images: flipped-bit constructions
    val base = 0x5a3c96e1b4d27f08L
    val rows = Seq(
      (1L, base),
      (2L, base ^ 1L),                              // 1 bit
      (3L, base ^ ((1L << 5) | (1L << 40))),        // 2 bits, bands apart
      (4L, base ^ ((1L << 0) | (1L << 20) | (1L << 45))), // 3 bits
      (5L, base ^ 0x000f000f000f000fL),             // 16 bits: far
      (6L, ~base))                                  // 64 bits: far
    val pairs = ImageDedup.nearDupPairs(
      rows.toDF("media_id", "dhash"), maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val close = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // every pair of {1,2,3,4} is within Hamming <= 6 of each other? No —
    // verify exactly: banding may only MISS nothing within the bound and
    // report nothing beyond it
    val within = for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)
    assert(pairs == within.toSet, s"got $pairs want ${within.toSet} ($close)")
  }

  test("exactGroups labels byte-identical content with one representative") {
    val unperturbed = variants.filter(expr("(media_id div 25) % 2 = 0"))
    val g = ImageDedup.exactGroups(unperturbed)
    // min media_id sharing a hash IS the base id (doc_ids start at 0)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(25L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
  }

  test("clusters recover the planted duplicate groups end-to-end") {
    val out = ImageDedup.clusters(variants, maxHamming = 3)
    val wrong = out.filter(col("cluster_id") =!= pmod(col("media_id"), lit(25L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(out.select("cluster_id").distinct().count() == 25)
    assert(out.count() == docs.count())
  }

  test("decontaminate flags exactly the eval groups' images, corpus never shuffles") {
    // eval = the unperturbed base image of groups 0..4; every corpus
    // variant of those groups (incl. perturbed near-copies) must flag
    val eval = variants.filter(col("media_id") < 5)
    val out = ImageDedup.decontaminate(variants, eval, maxHamming = 3)
    val wrong = out.filter(col("contaminated") =!=
      (pmod(col("media_id"), lit(25L)) < 5))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
    assert(out.count() == docs.count())
    // the eval side broadcasts; the corpus is never exchange-shuffled
    // for the probe (its only exchange is the final left join's)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    // bounded-eval refusal
    val e = intercept[IllegalArgumentException] {
      ImageDedup.decontaminate(variants, variants, maxHamming = 3,
        maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("incrementalSurvivors admits only never-committed content, O(batch)") {
    // committed: groups 0..24, both parities (ids 0..249 under groups=25)
    val committedImgs = Multimodal.syntheticImageVariants(spark,
      docs.filter(col("doc_id") < 250), groups = 25)
    val committed = ImageDedup.hashImages(committedImgs)
      .select(col("dhash").cast("string").as("h"))
    // batch: ids 250..499 under groups=50 — bases 0..24 render content
    // byte-identical to the committed copies (same pixel function),
    // bases 25..49 are genuinely new textures
    val batch = Multimodal.syntheticImageVariants(spark,
      docs.filter(col("doc_id") >= 250), groups = 50)
    val out = ImageDedup.incrementalSurvivors(batch, committed)
    // byte-identical to the reference exact anti-join (the text path's
    // own equality contract, through the image hash pass)
    val want = graft.dedup.IncrementalDedup.survivorsExact(
      ImageDedup.hashImages(batch), committed, "media_id",
      col("dhash").cast("string"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    // every committed-base copy is dropped; only new bases survive
    assert(out.filter(pmod(col("media_id"), lit(50L)) < 25).count() == 0)
    assert(out.count() >= 25, s"new bases must survive: ${out.count()}")
    // an empty store admits the whole batch, collapsed by content
    val first = ImageDedup.incrementalSurvivors(batch, committed.limit(0))
    val distinctContents = ImageDedup.hashImages(batch)
      .select("dhash").distinct().count()
    assert(first.count() == distinctContents)
  }

  test("scale pin: near-dup pairing is a band equi-join, never a cartesian") {
    // pin the PAIRING plan itself (nearDupPairs returns a materialized
    // cache; the shared banding path is where a cartesian could hide)
    val h = ImageDedup.hashImages(variants).persist()
    try {
      val plan = graft.dedup.HammingBands.pairs(
        h, "media_id", "dhash", maxHamming = 3, 100000L, "test")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    } finally { h.unpersist(); () }
  }

  test("one decode per image per job: the hash frame is persisted") {
    // the decode-count tripwire for the multi-branch faces: every image
    // decodes exactly ONCE per job (plus the eval set once for the
    // decontamination probe) — the 2-5x recompute multiplier that an
    // unpersisted lazy hash pass costs at 100 TB cannot return unnoticed
    val n = variants.count()
    val c = Multimodal.MediaCounters.imageReads
    var before = c.get()
    ImageDedup.clusters(variants, maxHamming = 3).unpersist()
    assert(c.get() - before == n,
      s"clusters decoded ${c.get() - before} times for $n images")
    before = c.get()
    ImageDedup.nearDupPairs(ImageDedup.hashImages(variants), maxHamming = 3)
      .unpersist()
    assert(c.get() - before == n,
      s"nearDupPairs decoded ${c.get() - before} times for $n images")
    before = c.get()
    val eval = variants.filter(col("media_id") < 5)
    ImageDedup.decontaminate(variants, eval, maxHamming = 3).unpersist()
    assert(c.get() - before == n + 5,
      s"decontaminate decoded ${c.get() - before} times for $n corpus + 5 eval")
  }

  test("survivorsByResolution keeps the largest copy of each near-dup group") {
    val rv = Multimodal.syntheticImageResVariants(spark, docs, groups = 20)
    // geometry first: the downscaled render stays within the Hamming
    // bound of its base while distinct bases stay far
    val h = ImageDedup.hashImagesWithDims(rv)
      .withColumn("base", pmod(col("media_id"), lit(20L)))
      .withColumn("small", expr("(media_id div 20) % 2 = 1"))
      .persist()
    try {
      val basil = h.filter(!col("small")).select(col("base"),
        col("dhash").as("h0")).distinct()
      val dist = h.filter(col("small")).join(basil, "base")
        .select(bit_count(col("dhash").bitwiseXOR(col("h0"))).as("d"))
        .agg(max("d")).as[Int].head()
      assert(dist <= 3, s"downscale moved dHash by $dist bits")
      val cross = basil.select(col("base").as("ba"), col("h0").as("ha"))
        .crossJoin(basil.select(col("base").as("bb"), col("h0").as("hb")))
        .filter(col("ba") < col("bb"))
        .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(cross > 10, s"two distinct bases only $cross bits apart")
    } finally { h.unpersist(); () }
    // the survivor per group is the LARGEST copy with the minimum id —
    // exactly the base render of id = group
    val out = ImageDedup.survivorsByResolution(rv, maxHamming = 3)
    try {
      assert(out.filter(col("width") =!= 36).count() == 0,
        "a thumbnail survived over its original")
      assert(out.select("media_id").as[Long].collect().sorted.toSeq ==
        (0L until 20L))
    } finally { out.unpersist(); () }
    // still one decode per image per job (hash + dims share the pass)
    val n = rv.count()
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    ImageDedup.survivorsByResolution(rv, maxHamming = 3).unpersist()
    assert(c.get() - before == n,
      s"survivorsByResolution decoded ${c.get() - before} times for $n images")
  }

  test("degenerate band buckets shed loudly, not ground through") {
    // constant-content corpus: every image identical -> every bucket huge
    val flat = docs.select(col("doc_id")).as[Long].map { id =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (id, "image", Multimodal.ImageCodec.write(img, "png"),
        "image/png", "flat")
    }.toDF("media_id", "media_type", "payload", "mime", "source")
    val pairs = ImageDedup.nearDupPairs(
      ImageDedup.hashImages(flat), maxHamming = 3, maxBucket = 50L)
    assert(pairs.isEmpty, "shed buckets must not emit pairs")
  }

  test("crop variants: whole-image hashes diverge, tiles re-align") {
    val cv = Multimodal.syntheticImageCropVariants(spark, docs, groups = 20)
      .persist()
    try {
      // the defect class is REAL: a tile-column crop shifts the 9x8
      // downscale grid under every cell, so the whole-image dHash lands
      // far from its base — whole-image clustering cannot see it
      val whole = ImageDedup.hashImages(cv)
        .withColumn("base", pmod(col("media_id"), lit(20L)))
        .withColumn("kind", expr("(media_id div 20) % 3"))
      val baseH = whole.filter(col("kind") === 0)
        .select(col("base"), col("dhash").as("h0")).distinct()
      val minDist = whole.filter(col("kind") =!= 0).join(baseH, "base")
        .select(bit_count(col("dhash").bitwiseXOR(col("h0"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(minDist > 4,
        s"cropped/extended copy only $minDist whole-image bits from base " +
          "— fixture no longer exercises the crop-tolerance gap")
      // tile hashes re-align: cropped (12 of 16 tiles) and extended
      // (all 16 base tiles) cluster with their base
      val out = ImageDedup.cropClusters(cv, tileW = 16, tileH = 16,
        maxHamming = 2, minShared = 4)
      try {
        val wrong = out.filter(
          col("cluster_id") =!= pmod(col("media_id"), lit(20L)))
        assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
        assert(out.select("cluster_id").distinct().count() == 20)
        assert(out.count() == docs.count())
      } finally { out.unpersist(); () }
      // tile geometry: 16 tiles for base, 12 cropped, 20 extended
      val t = ImageDedup.hashTiles(cv.filter(col("media_id") < 60), 16, 16)
        .withColumn("kind", expr("(media_id div 20) % 3"))
      val counts = t.groupBy("kind").agg(
        countDistinct("media_id").as("imgs"), count("*").as("tiles"))
        .collect().map(r => r.getLong(2) / r.getLong(1))
      assert(counts.sorted.toSeq == Seq(12L, 16L, 20L),
        s"tiles per image by kind: ${counts.mkString(",")}")
    } finally { cv.unpersist(); () }
  }

  test("decontaminateTiles catches cropped-eval leaks the whole-image probe misses") {
    val corpus = Multimodal.syntheticImageCropVariants(spark,
      docs.filter(expr("(doc_id div 20) % 3 != 1")), groups = 20)
    val eval = Multimodal.syntheticImageCropVariants(spark,
      docs.filter(expr("(doc_id div 20) % 3 = 1 AND doc_id % 20 < 5")),
      groups = 20)
    // the whole-image probe sees none of the cropped leaks
    val whole = ImageDedup.decontaminate(corpus, eval, maxHamming = 2)
    try assert(whole.filter(col("contaminated")).count() == 0,
      "whole-image probe unexpectedly catches cropped copies")
    finally { whole.unpersist(); () }
    val out = ImageDedup.decontaminateTiles(corpus, eval,
      tileW = 16, tileH = 16, maxHamming = 2, minShared = 4)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == corpus.count())
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      ImageDedup.decontaminateTiles(corpus, corpus, 16, 16,
        maxHamming = 2, maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("tile faces decode each image exactly once per job") {
    val cv = Multimodal.syntheticImageCropVariants(spark,
      docs.filter(col("doc_id") < 120), groups = 20)
    val n = cv.count()
    val c = Multimodal.MediaCounters.imageReads
    var before = c.get()
    ImageDedup.cropClusters(cv, 16, 16, maxHamming = 2, minShared = 4)
      .unpersist()
    assert(c.get() - before == n,
      s"cropClusters decoded ${c.get() - before} times for $n images")
    before = c.get()
    ImageDedup.sharedTilePairs(cv, 16, 16, maxHamming = 2, minShared = 4)
      .unpersist()
    assert(c.get() - before == n,
      s"sharedTilePairs decoded ${c.get() - before} times for $n images")
  }
}
