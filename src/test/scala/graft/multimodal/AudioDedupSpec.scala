package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val variants =
    Multimodal.syntheticAudioVariants(spark, docs, groups = 20)

  test("fingerprint: volume-invariant, pitch-sensitive, deterministic") {
    val h = AudioDedup.hashAudio(variants)
      .withColumn("base", pmod(col("media_id"), lit(20L)))
      .withColumn("halved", expr("(media_id div 20) % 2 = 1"))
      .persist()
    try {
      // byte-identical renders -> one hash per (base, parity)
      assert(h.groupBy("base", "halved").agg(countDistinct("ahash").as("n"))
        .filter(col("n") =!= 1).count() == 0)
      // VOLUME variants fingerprint identically to their full-amplitude base
      val full = h.filter(!col("halved"))
        .select(col("base"), col("ahash").as("h0")).distinct()
      val diverged = h.filter(col("halved")).join(full, "base")
        .filter(col("ahash") =!= col("h0")).count()
      assert(diverged == 0, s"$diverged halved clips diverged from their base")
      // distinct pitches land on distinct fingerprints
      assert(full.select("h0").distinct().count() == 20)
    } finally { h.unpersist(); () }
  }

  test("exactGroups recovers the planted groups across volume variants") {
    val g = AudioDedup.exactGroups(variants)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(20L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
  }

  test("incrementalSurvivors == exact anti-join; committed content drops") {
    val committed = AudioDedup.hashAudio(
      Multimodal.syntheticAudioVariants(spark,
        docs.filter(col("doc_id") < 250), groups = 10))
      .select(col("ahash").cast("string").as("h"))
    val batch = Multimodal.syntheticAudioVariants(spark,
      docs.filter(col("doc_id") >= 250), groups = 20)
    val out = AudioDedup.incrementalSurvivors(batch, committed)
    val want = graft.dedup.IncrementalDedup.survivorsExact(
      AudioDedup.hashAudio(batch), committed, "media_id",
      col("ahash").cast("string"))
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    // bases 0..9 were committed (same pitches); bases 10..19 are new
    assert(out.filter(pmod(col("media_id"), lit(20L)) < 10).count() == 0)
    assert(out.count() > 0)
  }

  test("non-audio records refuse loudly") {
    val imgs = Multimodal.syntheticImages(spark, docs.limit(1))
    val e = intercept[org.apache.spark.SparkException] {
      AudioDedup.hashAudio(imgs).collect()
    }
    assert(e.getMessage != null)
  }
}
