package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val mixed = Multimodal.syntheticMediaPipelineMix(spark, docs)
  private lazy val evalSet = Multimodal.syntheticMediaPipelineMix(
    spark, docs.filter(col("doc_id").isin(1L, 2L)))

  private def expectedStage =
    when(pmod(col("media_id"), lit(5L)) === 0, "gated")
      .when(col("media_id") >= 20, "dup_dropped")
      .when(col("media_id").isin(1L, 2L), "contaminated")
      .otherwise("kept")

  test("curate labels every record with the planted stage, all modalities") {
    val out = MediaPipeline.curate(mixed, evalSet, maxHamming = 3)
    try {
      val wrong = out.filter(col("stage") =!= expectedStage)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == 3 * docs.count())
      assert(out.select("media_type").distinct().count() == 3)
      // the card summarizes the same frame without re-decoding
      val card = MediaPipeline.card(out)
      val kept = card.filter(col("stage") === "kept")
        .select("n").as[Long].collect()
      assert(kept.length == 3 && kept.distinct.length == 1,
        s"every modality keeps the same planted count: ${kept.mkString(",")}")
    } finally { out.unpersist(); () }
  }

  test("one decode per record per modality across ALL stages") {
    val n = docs.count()
    val ci = Multimodal.MediaCounters.imageReads
    val ca = Multimodal.MediaCounters.audioReads
    val cv = Multimodal.MediaCounters.videoReads
    val (bi, ba, bv) = (ci.get(), ca.get(), cv.get())
    MediaPipeline.curate(mixed, evalSet, maxHamming = 3).unpersist()
    // corpus: n per modality; eval: 2 per modality — nothing re-decodes
    // across gate -> dedup -> decontamination -> assembly
    assert(ci.get() - bi == n + 2,
      s"images decoded ${ci.get() - bi} times for $n corpus + 2 eval")
    assert(ca.get() - ba == n + 2,
      s"audio decoded ${ca.get() - ba} times for $n corpus + 2 eval")
    assert(cv.get() - bv == n + 2,
      s"videos decoded ${cv.get() - bv} times for $n corpus + 2 eval")
  }

  test("keep-best keeps the full-resolution image even when a smaller id is small") {
    // ids 21..39 (small renders) must lose to base id g even though the
    // group also holds later full-res copies (ids 40+) — the prefer
    // column (pixel count) ranks before id
    val out = MediaPipeline.curate(mixed, evalSet, maxHamming = 3)
    try {
      val imgKept = out.filter(col("media_type") === "image" &&
        col("stage").isin("kept", "contaminated"))
        .select("media_id").as[Long].collect().toSet
      assert(imgKept == Set(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 11L, 12L,
        13L, 14L, 16L, 17L, 18L, 19L),
        s"image survivors: ${imgKept.toSeq.sorted.mkString(",")}")
    } finally { out.unpersist(); () }
  }

  private lazy val deepMixed =
    Multimodal.syntheticMediaPipelineDeepMix(spark, docs)
  private lazy val deepEval = Multimodal.syntheticMediaPipelineDeepMix(
    spark, docs.filter(col("doc_id").isin(21L, 22L)))
  private lazy val expectedDeepStage =
    when(col("media_id") % 5 === 0, lit("gated"))
      .when(col("media_id") >= 60, lit("dup_dropped"))
      .when(pmod(col("media_id"), lit(20L)).isin(1L, 2L),
        lit("contaminated"))
      .otherwise(lit("kept"))

  test("curateDeep labels every record; parts catch the shifted eval leaks") {
    val out = MediaPipeline.curateDeep(deepMixed, deepEval,
      maxHamming = 3, minShared = 2)
    try {
      val wrong = out.filter(col("stage") =!= expectedDeepStage)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == 3 * docs.count())
    } finally { out.unpersist(); () }
    // the gap is REAL: the whole-hash pipeline flags ONLY the corpus
    // copies carrying the eval's exact edit (kind 1 -> ids 21/22); the
    // base and opposite-edit renders of groups 1/2 sail through it
    val shallow = MediaPipeline.curate(deepMixed, deepEval, maxHamming = 3)
    try {
      val flagged = shallow.filter(col("stage") === "contaminated")
        .select("media_id").distinct().as[Long].collect().toSet
      assert(flagged == Set(21L, 22L),
        s"whole-hash probe flagged ${flagged.toSeq.sorted.mkString(",")}")
    } finally { shallow.unpersist(); () }
  }

  test("curateDeep catches a rot90 eval edit through the orientation probe") {
    // corpus = kind-0 (base) renders only; eval = rot90 renders of
    // groups 0..4. Tiles TURN with a rotation (their dHashes no longer
    // match any eval tile) and the whole hash lands far away, so both
    // the shallow pipeline and the tile probe see NOTHING — only the
    // dihedral orientation hashes riding the same profile decode
    // re-align the leak
    val corpus = Multimodal.syntheticImageRotationVariants(spark,
      docs.filter(expr("(doc_id div 20) % 4 = 0")), groups = 20)
    val eval = Multimodal.syntheticImageRotationVariants(spark,
      docs.filter(col("doc_id").between(20L, 24L)), groups = 20)
    val ci = Multimodal.MediaCounters.imageReads
    val before = ci.get()
    val n = corpus.count()
    val out = MediaPipeline.curateDeep(corpus, eval,
      maxHamming = 3, minShared = 2).persist()
    try {
      // decode counters unchanged by the orientation emission: one per
      // corpus record + one per eval record
      assert(ci.get() - before == n + 5,
        s"decoded ${ci.get() - before} images for $n corpus + 5 eval")
      val want =
        when(col("media_id") >= 20, lit("dup_dropped"))
          .when(col("media_id") < 5, lit("contaminated"))
          .otherwise(lit("kept"))
      val wrong = out.filter(col("stage") =!= want)
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // the gap is REAL: the whole-hash pipeline flags nothing
      val shallow = MediaPipeline.curate(corpus, eval, maxHamming = 3)
      try assert(shallow.filter(col("stage") === "contaminated")
        .count() == 0, "whole-hash probe unexpectedly saw the rotation")
      finally { shallow.unpersist(); () }
    } finally { out.unpersist(); () }
  }

  test("curateDeep decodes once per record per modality across all stages") {
    val sub = docs.filter(col("doc_id") < 120)
    val dm = Multimodal.syntheticMediaPipelineDeepMix(spark, sub)
    val n = sub.count()
    val ci = Multimodal.MediaCounters.imageReads
    val ca = Multimodal.MediaCounters.audioReads
    val cv = Multimodal.MediaCounters.videoReads
    val (bi, ba, bv) = (ci.get(), ca.get(), cv.get())
    MediaPipeline.curateDeep(dm, deepEval, maxHamming = 3).unpersist()
    // parts ride the profile decode: gates, whole-hash dedup AND the
    // part-level probe together still cost one decode per record
    assert(ci.get() - bi == n + 2,
      s"images decoded ${ci.get() - bi} times for $n corpus + 2 eval")
    assert(ca.get() - ba == n + 2,
      s"audio decoded ${ca.get() - ba} times for $n corpus + 2 eval")
    assert(cv.get() - bv == n + 2,
      s"videos decoded ${cv.get() - bv} times for $n corpus + 2 eval")
  }

  test("unknown media_type and oversized eval refuse loudly") {
    val junk = Seq((1L, "text", Array[Byte](1), "t/x", "s"))
      .toDF("media_id", "media_type", "payload", "mime", "source")
    val e = intercept[org.apache.spark.SparkException] {
      MediaPipeline.profile(junk).collect()
    }
    assert(e.getMessage != null)
    val e2 = intercept[IllegalArgumentException] {
      MediaPipeline.curate(mixed, evalSet, maxHamming = 3, maxEval = 1L)
    }
    assert(e2.getMessage.contains("maxEval"), e2.getMessage)
  }
}
