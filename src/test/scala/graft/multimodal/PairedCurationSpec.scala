package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PairedCurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val images =
    Multimodal.syntheticMediaPipelineMix(spark, docs)
      .filter(col("media_type") === "image")

  test("pair stages: caption gate, image gate, keep-best dedup, kept") {
    val out = PairedCuration.curate(images, docs,
      minCaptionChars = 200L, maxHamming = 3).persist()
    try {
      assert(out.count() == docs.count())
      // recompute the expected stage with doc arithmetic: caption gate
      // first, then the planted defect chain, then keep-best-resolution
      // (res 1152 on even id/20 cycles, 288 odd) among survivors of both
      val s = docs.select(col("doc_id").as("media_id"),
        (col("n_chars") < 200).as("cap_g"),
        (col("doc_id") % 5 === 0).as("img_def"),
        when(expr("(doc_id div 20) % 2 = 0"), lit(1152))
          .otherwise(lit(288)).as("res"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(col("media_id"), lit(20L)))
        .orderBy(col("res").desc, col("media_id").asc)
      val surv = s.filter(!col("cap_g") && !col("img_def"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).select(col("media_id"))
      val want = s.join(surv.withColumn("__k", lit(true)),
        Seq("media_id"), "left")
        .select(col("media_id"),
          when(col("cap_g"), lit("caption_gated"))
            .when(col("img_def"), lit("media_gated"))
            .when(col("__k").isNotNull, lit("kept"))
            .otherwise(lit("dup_dropped")).as("want"))
      val wrong = out.join(want, "media_id")
        .filter(col("stage") =!= col("want"))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the card partitions the corpus
      assert(PairedCuration.card(out).agg(sum("n")).as[Long].head() ==
        docs.count())
    } finally { out.unpersist(); () }
  }

  test("caption-gated pairs never pay the decode; survivors decode once") {
    val nCapOk = docs.filter(col("n_chars") >= 200).count()
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    PairedCuration.curate(images, docs,
      minCaptionChars = 200L, maxHamming = 3).unpersist()
    assert(c.get() - before == nCapOk,
      s"curate decoded ${c.get() - before} images for $nCapOk " +
        "caption-surviving pairs")
  }

  test("eval decontamination flags survivors of eval groups, not dropped members") {
    val eval = Multimodal.syntheticMediaPipelineMix(spark,
      docs.filter(col("doc_id").isin(1L, 2L)))
      .filter(col("media_type") === "image")
    val out = PairedCuration.curate(images, docs, minCaptionChars = 200L,
      maxHamming = 3, evalMedia = Some(eval)).persist()
    try {
      val cont = out.filter(col("stage") === "contaminated")
        .select("media_id").as[Long].collect().toSet
      assert(cont.nonEmpty, "eval groups produced no contaminated survivor")
      assert(cont.forall(id => id % 20 == 1 || id % 20 == 2),
        s"contamination outside the eval groups: $cont")
      // exactly the groups' SURVIVORS flag: each eval group contributes
      // at most one (its kept-slot member), and nothing is 'kept' in an
      // eval group
      assert(out.filter(col("stage") === "kept")
        .filter(pmod(col("media_id"), lit(20L)).isin(1L, 2L))
        .count() == 0)
      // without eval the same ids are 'kept' (stage order unchanged)
      val base = PairedCuration.curate(images, docs,
        minCaptionChars = 200L, maxHamming = 3)
      try {
        val kept = base.filter(col("stage") === "kept")
          .select("media_id").as[Long].collect().toSet
        assert(cont.subsetOf(kept))
      } finally { base.unpersist(); () }
      // bounded-eval refusal
      val e = intercept[IllegalArgumentException] {
        PairedCuration.curate(images, docs, minCaptionChars = 200L,
          maxHamming = 3, evalMedia = Some(images), maxEval = 10L)
      }
      assert(e.getMessage.contains("maxEval"), e.getMessage)
    } finally { out.unpersist(); () }
  }

  test("caption-key dedup collapses spammed captions among media survivors") {
    val caps = docs.withColumn("cap_key", col("doc_id") % 12)
    val out = PairedCuration.curate(images, caps, minCaptionChars = 200L,
      maxHamming = 3, capKeyCol = Some("cap_key")).persist()
    try {
      // per caption key: at most ONE pair is kept
      val kept = out.filter(col("stage") === "kept")
        .withColumn("k", pmod(col("media_id"), lit(12L)))
      assert(kept.groupBy("k").count().filter(col("count") > 1)
        .count() == 0, "two kept pairs share a caption key")
      // caption_dup rows would have been kept without caption dedup
      val base = PairedCuration.curate(images, caps,
        minCaptionChars = 200L, maxHamming = 3)
      try {
        val capDups = out.filter(col("stage") === "caption_dup")
          .select("media_id")
        val baseKept = base.filter(col("stage") === "kept")
          .select("media_id")
        assert(capDups.exceptAll(baseKept).isEmpty,
          "a caption_dup was not a media-dedup survivor")
        assert(capDups.count() > 0, "fixture planted no caption dups")
        // every other stage is unchanged by caption dedup
        assert(out.filter(col("stage").isin("caption_gated", "media_gated",
          "dup_dropped")).exceptAll(base.filter(col("stage")
          .isin("caption_gated", "media_gated", "dup_dropped"))).isEmpty)
      } finally { base.unpersist(); () }
    } finally { out.unpersist(); () }
  }

  test("caption-key dedup is a pre-aggregate, not a per-key window; a mega-key cannot skew") {
    // ONE caption key spammed across EVERY pair — the operator's
    // motivating case (boilerplate caption on millions of distinct
    // images). A row_number window would drag every survivor into one
    // partition; the pre-aggregate reduces the mega-key map-side.
    val megaCaps = docs.withColumn("cap_key", lit(0L))
    val out = PairedCuration.curate(images, megaCaps,
      minCaptionChars = 200L, maxHamming = 3,
      capKeyCol = Some("cap_key")).persist()
    try {
      val kept = out.filter(col("stage") === "kept")
        .select("media_id").as[Long].collect()
      assert(kept.length == 1, s"mega-key must keep exactly one pair: " +
        kept.mkString(","))
      // the winner is the MIN id among media-dedup survivors
      val base = PairedCuration.curate(images, megaCaps,
        minCaptionChars = 200L, maxHamming = 3)
      try {
        val survMin = base.filter(col("stage") === "kept")
          .agg(min("media_id")).as[Long].head()
        assert(kept.head == survMin,
          s"winner ${kept.head} is not the min survivor $survMin")
        assert(out.filter(col("stage") === "caption_dup").count() ==
          base.filter(col("stage") === "kept").count() - 1)
      } finally { base.unpersist(); () }
      // PLAN PIN: the caption-key stage must be an Aggregate over
      // __cap_key (combiner-reduced min), never a row_number window
      // partitioned by the caption key (the skew shape this test guards)
      val plan = out.queryExecution.analyzed.toString
      assert(!plan.contains("windowspecdefinition(__cap_key"),
        "caption-key dedup regressed to a per-key window")
      assert(plan.contains("__cap_key"),
        "caption-key stage missing from the lineage")
    } finally { out.unpersist(); () }
  }

  test("caption-text decontamination gates leaked pairs BEFORE the decode") {
    val evalCaps = docs.filter(col("doc_id") % 50 === 0)
    // expected leak set by q72's gram arithmetic (eval ids self-flag —
    // the benchmark caption itself is in the crawl)
    val grams = graft.dedup.MinHashDedup.shingles(col("text"), 4)
    val bench = evalCaps.select(explode(grams).as("g")).distinct()
    val leak = docs.select(col("doc_id"), explode(grams).as("g"))
      .join(broadcast(bench), "g").select("doc_id").distinct()
      .as[Long].collect().toSet
    val capOk = docs.filter(col("n_chars") >= 200)
      .select("doc_id").as[Long].collect().toSet
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    val out = PairedCuration.curate(images, docs,
      minCaptionChars = 200L, maxHamming = 3,
      evalCaptions = Some(evalCaps)).persist()
    try {
      // leaked pairs never pay the media decode — the probe is text-only
      assert(c.get() - before == (capOk -- leak).size,
        s"decoded ${c.get() - before} for ${(capOk -- leak).size} pairs")
      val got = out.filter(col("stage") === "caption_contaminated")
        .select("media_id").as[Long].collect().toSet
      assert(got == (capOk intersect leak),
        s"leaked-stage mismatch: ${got.size} vs ${(capOk intersect leak).size}")
      assert(got.nonEmpty, "fixture planted no caption leaks")
      // the stage frame still partitions the pair corpus
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
  }

  test("curateDeep catches cropped eval leaks the whole-hash curate misses") {
    val media = Multimodal.syntheticImageCropVariants(spark,
      docs.filter(expr("(doc_id div 20) % 3 != 1")), groups = 20)
    val eval = Multimodal.syntheticImageCropVariants(spark,
      docs.filter(col("doc_id").between(20L, 24L)), groups = 20)
    val nCapOk = docs.filter(expr("(doc_id div 20) % 3 != 1"))
      .filter(col("n_chars") >= 200).count()
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    val out = PairedCuration.curateDeep(media, docs,
      minCaptionChars = 200L, maxHamming = 3, minShared = 2,
      evalMedia = Some(eval)).persist()
    try {
      // cost contract unchanged: caption-failing pairs never decode,
      // survivors decode once, eval decodes once
      assert(c.get() - before == nCapOk + 5,
        s"decoded ${c.get() - before} for $nCapOk pairs + 5 eval")
      val cont = out.filter(col("stage") === "contaminated")
        .select("media_id").as[Long].collect().toSet
      assert(cont.nonEmpty && cont.forall(_ % 20 < 5),
        s"contamination outside the eval groups: $cont")
      // every caption-passing SURVIVOR of groups 0..4 flags: both the
      // base and the border-extended kind keep one survivor each
      assert(out.filter(col("stage") === "kept")
        .filter(pmod(col("media_id"), lit(20L)) < 5).count() == 0)
      // THE GAP IS REAL: the whole-hash paired pipeline flags nothing
      // (a crop shifts the downscale grid under every cell)
      val shallow = PairedCuration.curate(media, docs,
        minCaptionChars = 200L, maxHamming = 3, evalMedia = Some(eval))
      try assert(shallow.filter(col("stage") === "contaminated")
        .count() == 0, "whole-hash probe unexpectedly saw the crop")
      finally { shallow.unpersist(); () }
      // stage algebra intact: the frame partitions the pair corpus
      assert(out.count() == media.count())
    } finally { out.unpersist(); () }
  }

  test("media rows without a caption row are not pairs") {
    val out = PairedCuration.curate(images,
      docs.filter(col("doc_id") < 100),
      minCaptionChars = 0L, maxHamming = 3)
    try assert(out.count() == 100)
    finally { out.unpersist(); () }
  }
}
