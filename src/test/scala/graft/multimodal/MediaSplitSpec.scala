package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.text.LeakSafeSplit

class MediaSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private val bands = Seq("train" -> 80, "val" -> 10, "test" -> 10)

  test("image split: near-dup clusters never straddle, clusters exact") {
    val imgs = Multimodal.syntheticImageVariants(spark, docs, groups = 25)
    val out = MediaSplit.byPerceptualCluster(imgs, "image", 3, bands)
      .persist()
    try {
      assert(out.filter(
        col("cluster_id") =!= pmod(col("media_id"), lit(25L))).count() == 0)
      assert(LeakSafeSplit.leakage(out, "cluster_id").isEmpty)
      assert(out.count() == docs.count())
      // all three labels actually occur over 25 clusters... not
      // guaranteed by pigeonhole; assert at least train occurs and
      // labels are only from the band set
      assert(out.select("split").distinct().as[String].collect().toSet
        .subsetOf(Set("train", "val", "test")))
      assert(out.filter(col("split") === "train").count() > 0)
    } finally { out.unpersist(); () }
  }

  test("audio and video splits ride their modality's fingerprint") {
    val audio = Multimodal.syntheticAudioVariants(spark,
      docs.filter(col("doc_id") < 200), groups = 20)
    val a = MediaSplit.byPerceptualCluster(audio, "audio", 2, bands)
    assert(a.filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)
    assert(LeakSafeSplit.leakage(a, "cluster_id").isEmpty)
    val video = Multimodal.syntheticGifVariants(spark,
      docs.filter(col("doc_id") < 120), groups = 20)
    val v = MediaSplit.byPerceptualCluster(video, "video", 2, bands)
    assert(v.filter(
      col("cluster_id") =!= pmod(col("media_id"), lit(20L))).count() == 0)
    assert(LeakSafeSplit.leakage(v, "cluster_id").isEmpty)
    val e = intercept[IllegalArgumentException] {
      MediaSplit.byPerceptualCluster(audio, "text", 2, bands)
    }
    assert(e.getMessage.contains("modality"), e.getMessage)
  }

  test("mixed-modality split: one decode pass, per-modality clustering") {
    // one table holding all three modalities, ids made unique per
    // modality (mixed split resolves clusters by id)
    val slice = docs.filter(col("doc_id") < 100)
    val mixed = Multimodal.syntheticMediaPipelineMix(spark, slice)
      .withColumn("media_id", col("media_id") +
        when(col("media_type") === "audio", 1000L)
          .when(col("media_type") === "video", 2000L).otherwise(0L))
    val before = (Multimodal.MediaCounters.imageReads.get(),
      Multimodal.MediaCounters.audioReads.get(),
      Multimodal.MediaCounters.videoReads.get())
    val out = MediaSplit.byPerceptualCluster(mixed, "mixed", 3, bands)
      .persist()
    try {
      assert(out.count() == 300)
      assert(Multimodal.MediaCounters.imageReads.get() - before._1 == 100)
      assert(Multimodal.MediaCounters.audioReads.get() - before._2 == 100)
      assert(Multimodal.MediaCounters.videoReads.get() - before._3 == 100)
      assert(graft.text.LeakSafeSplit.leakage(out, "cluster_id").isEmpty)
      // per modality: clean members cluster to the group minimum in
      // their OWN id space (defects are unique contents -> singletons)
      val wrong = out
        .withColumn("base", pmod(col("media_id"), lit(1000L)))
        .filter(pmod(col("base"), lit(5L)) =!= 0)
        .filter(col("cluster_id") =!=
          col("media_id") - col("base") + pmod(col("base"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      // modalities never merge: image group g and audio group g keep
      // distinct cluster ids
      assert(out.select("cluster_id").distinct().count() >=
        3 * 16) // 16 clean groups per modality at least
    } finally { out.unpersist(); () }
  }

  test("carveEval quarantines perceptual-cluster peers of eval members") {
    val imgs = Multimodal.syntheticImageVariants(spark, docs, groups = 25)
    val out = MediaSplit.carveEval(imgs, "image", 3, perStratum = 1)
      .persist()
    try {
      assert(out.count() == docs.count())
      // per stratum (source = grp<base>) exactly one eval item
      val perStratum = out.filter(col("role") === "eval")
        .groupBy("source").count().filter(col("count") =!= 1).count()
      assert(perStratum == 0)
      // every non-eval member of an eval cluster is quarantined — with
      // groups=25 and source==group, that is the whole rest of the corpus
      val leak = out.filter(col("role") === "train")
        .join(out.filter(col("role") === "eval")
            .select(col("cluster_id")).distinct(), Seq("cluster_id"))
      assert(leak.count() == 0, "a train item shares an eval cluster")
    } finally { out.unpersist(); () }
  }

  test("one decode per image for the split pass") {
    val imgs = Multimodal.syntheticImageVariants(spark,
      docs.filter(col("doc_id") < 100), groups = 25)
    val n = imgs.count()
    val c = Multimodal.MediaCounters.imageReads
    val before = c.get()
    MediaSplit.byPerceptualCluster(imgs, "image", 3, bands).count(): Unit
    assert(c.get() - before == n,
      s"split decoded ${c.get() - before} times for $n images")
  }
}
