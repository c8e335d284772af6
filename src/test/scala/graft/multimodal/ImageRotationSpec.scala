package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ImageRotationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val variants =
    Multimodal.syntheticImageRotationVariants(spark, docs, groups = 20)

  test("rotation variants: whole-image hashes diverge, orientation sets re-align") {
    val v = variants.filter(col("media_id") < 80).persist() // one clean cycle
    try {
      // the defect class is REAL: a 90/180-degree turn or mirror moves
      // the gradient field under every 9x8 cell, so the whole-image
      // dHash lands far from its base — plain clustering cannot see it
      val whole = ImageDedup.hashImages(v)
        .withColumn("base", pmod(col("media_id"), lit(20L)))
        .withColumn("kind", expr("(media_id div 20) % 4"))
      val baseH = whole.filter(col("kind") === 0)
        .select(col("base"), col("dhash").as("h0"))
      val minDist = whole.filter(col("kind") =!= 0).join(baseH, "base")
        .select(bit_count(col("dhash").bitwiseXOR(col("h0"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(minDist > 4,
        s"rotated/mirrored copy only $minDist whole-image bits from base " +
          "— fixture no longer exercises the rotation-tolerance gap")
      // orientation-hash SETS are permutations of the base's: pixel-exact
      // dihedral transforms land the SAME 8 hashes, reordered
      val sets = ImageDedup.hashOrientations(v)
        .groupBy(col("media_id"))
        .agg(sort_array(collect_list(col("ohash"))).as("hs"))
        .withColumn("base", pmod(col("media_id"), lit(20L)))
      val nPerGroup = sets.groupBy("base")
        .agg(countDistinct("hs").as("n"))
        .filter(col("n") =!= 1).count()
      assert(nPerGroup == 0, "orientation sets differ within a group")
      // and the canonical (unsigned-min) hash is identical per group
      val canon = ImageDedup.hashCanonical(v)
        .withColumn("base", pmod(col("media_id"), lit(20L)))
      assert(canon.groupBy("base").agg(countDistinct("chash").as("n"))
        .filter(col("n") =!= 1).count() == 0)
      // distinct bases stay far even across ALL orientation pairs
      val oh = ImageDedup.hashOrientations(v.filter(col("media_id") < 20))
      val cross = oh.select(col("media_id").as("ba"), col("ohash").as("ha"))
        .crossJoin(oh.select(col("media_id").as("bb"), col("ohash").as("hb")))
        .filter(col("ba") < col("bb"))
        .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("d"))
        .agg(min("d")).as[Int].head()
      assert(cross > 6, s"two distinct bases only $cross bits apart " +
        "across orientations")
    } finally { v.unpersist(); () }
  }

  test("canonicalGroups labels pixel-exact rotations with one representative") {
    val clean = variants.filter(expr("(media_id div 80) % 2 = 0"))
    val g = ImageDedup.canonicalGroups(clean)
    val wrong = g.filter(col("group_rep") =!= pmod(col("media_id"), lit(20L)))
    assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
  }

  test("rotationClusters recover the planted groups through noise end-to-end") {
    val out = ImageDedup.rotationClusters(variants, maxHamming = 3)
    try {
      val wrong = out.filter(
        col("cluster_id") =!= pmod(col("media_id"), lit(20L)))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.select("cluster_id").distinct().count() == 20)
      assert(out.count() == docs.count())
    } finally { out.unpersist(); () }
  }

  test("decontaminateRotations catches rotated-eval leaks the plain probe misses") {
    val corpus = Multimodal.syntheticImageRotationVariants(spark,
      docs.filter(expr("(doc_id div 20) % 4 != 1")), groups = 20)
    val eval = Multimodal.syntheticImageRotationVariants(spark,
      docs.filter(expr("(doc_id div 20) % 4 = 1 AND doc_id % 20 < 5")),
      groups = 20)
    // the plain whole-image probe sees none of the rotated leaks
    val whole = ImageDedup.decontaminate(corpus, eval, maxHamming = 3)
    try assert(whole.filter(col("contaminated")).count() == 0,
      "whole-image probe unexpectedly catches rotated copies")
    finally { whole.unpersist(); () }
    val out = ImageDedup.decontaminateRotations(corpus, eval, maxHamming = 3)
    try {
      val wrong = out.filter(col("contaminated") =!=
        (pmod(col("media_id"), lit(20L)) < 5))
      assert(wrong.count() == 0, wrong.limit(5).collect().mkString("; "))
      assert(out.count() == corpus.count())
      // eval broadcasts; the corpus is never exchange-shuffled for the probe
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    } finally { out.unpersist(); () }
    val e = intercept[IllegalArgumentException] {
      ImageDedup.decontaminateRotations(corpus, corpus, maxHamming = 3,
        maxEval = 10L)
    }
    assert(e.getMessage.contains("maxEval"), e.getMessage)
  }

  test("orientation faces decode each image exactly once per job") {
    val v = variants.filter(col("media_id") < 160)
    val n = v.count()
    val c = Multimodal.MediaCounters.imageReads
    var before = c.get()
    ImageDedup.rotationClusters(v, maxHamming = 3).unpersist()
    assert(c.get() - before == n,
      s"rotationClusters decoded ${c.get() - before} times for $n images")
    before = c.get()
    val eval = variants.filter(col("media_id") < 5)
    ImageDedup.decontaminateRotations(v, eval, maxHamming = 3).unpersist()
    assert(c.get() - before == n + 5,
      s"decontaminateRotations decoded ${c.get() - before} times for " +
        s"$n corpus + 5 eval")
  }
}
