package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QualityTiersSpec extends SparkSpec {
  import spark.implicits._

  test("distinct scores split into k near-equal tiers, best = tier 1") {
    val df = (1 to 90).map(i => (i.toLong, (91 - i).toLong)).toDF("id", "s")
    val out = QualityTiers.tiers(df, "s", k = 3)
      .select("id", "tier").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // ids 1..30 carry the 30 best scores -> tier 1, etc.
    assert((1L to 30L).forall(out(_) == 1))
    assert((31L to 60L).forall(out(_) == 2))
    assert((61L to 90L).forall(out(_) == 3))
  }

  test("ties never straddle a tier boundary") {
    // 10 rows of score 5 would straddle the n/2 cut at 6 rows
    val df = (Seq.fill(10)(5L) ++ Seq.fill(2)(9L)).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val tiers = QualityTiers.tiers(df, "s", k = 2)
      .select("s", "tier").distinct()
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tiers(9L) == 1)
    assert(tiers.size == 2, "each score maps to exactly one tier")
  }

  test("total membership: every row gets exactly one tier") {
    val docs = Tables.load(spark, sf, "documents")
    val model = NgramLm.train(docs, "text")
    val fam = NgramLm.familiarity(docs, model, "doc_id", "text")
    val out = QualityTiers.tiers(fam, "fam_q", k = 3)
    assert(out.count() == fam.count())
    val sizes = out.groupBy("tier").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1, 2, 3), s"all tiers populated: $sizes")
    // near-equal thirds, slack for value ties
    val n = fam.count()
    sizes.values.foreach(s => assert(math.abs(s - n / 3) <= n / 5,
      s"tier sizes should be near-thirds: $sizes"))
  }

  test("corpus-scale plan: no global sort of the corpus itself") {
    val docs = Tables.load(spark, sf, "documents")
    val fam = NgramLm.familiarity(docs, NgramLm.train(docs, "text"),
      "doc_id", "text")
    val plan = QualityTiers.tiers(fam, "fam_q", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tier table must broadcast back:\n$plan")
  }

  test("input lineage runs once: no eager action, cached scan under both consumers") {
    // the round-9 finding: tiers() ran its input lineage 3x (an eager
    // count plus two uncached plan subtrees). Pin the fix structurally:
    // building the frame must launch NO job, and the executed plan must
    // read the expensive input through InMemoryTableScan on both
    // consumers (per-score aggregate + output join).
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val docs = Tables.load(spark, sf, "documents")
    val model = NgramLm.train(docs, "text") // trains eagerly, outside tiers
    val fam = NgramLm.familiarity(docs, model, "doc_id", "text")
    val mid = sc.statusTracker.getJobIdsForGroup(null).length
    val out = QualityTiers.tiers(fam, "fam_q", k = 3)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == mid,
      s"tiers() must not run an eager action (jobs before=$before mid=$mid after=$after)")
    val plan = out.queryExecution.executedPlan.toString
    val cachedScans = "InMemoryTableScan".r.findAllIn(plan).length
    assert(cachedScans >= 2,
      s"both consumers must read the scored input from cache:\n$plan")
    spark.sharedState.cacheManager.clearCache()
  }

  test("tiersReleasable: release() drops the scored-input cache") {
    // the round-10 advice finding: tiers() persisted the scored input
    // with no way for a long-lived session to release it
    spark.sharedState.cacheManager.clearCache()
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "n_chars")
    val t = QualityTiers.tiersReleasable(docs, "n_chars", k = 3)
    t.frame.count() // materialize: the scored input is now cached
    assert(!spark.sharedState.cacheManager.isEmpty, "input should be cached")
    t.release()
    assert(spark.sharedState.cacheManager.isEmpty,
      "release() must unpersist the scored-input cache")
  }
}
