package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LshIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("probe finds cross-corpus near-dups that candidatePairs would find") {
    val corpus = mk(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark shuffles and joins"),
      (3L, "another totally different document about parquet files"))
    val batch = mk(
      (100L, "the quick brown fox jumps over the lazy dog today"), // ~dup of 1
      (101L, "nothing like anything in the corpus at all whatsoever"))
    val dir = tmpDir("lsh-idx")
    LshIndex.build(spark, corpus, "doc_id", "text", "lsh_t1", s"$dir/t1",
      numBuckets = 4)
    try {
      val cands = LshIndex.probe(spark, "lsh_t1", batch, "doc_id", "text")
      val verified = MinHashDedup.verifyShingleJaccard(
        cands, corpus.unionByName(batch), "doc_id", "text",
        n = 3, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(verified == Set((1L, 100L)))
    } finally spark.sql("DROP TABLE IF EXISTS lsh_t1")
  }

  test("append makes later batches visible to probes") {
    val corpus = mk((1L, "alpha beta gamma delta epsilon zeta eta theta"))
    val b1 = mk((10L, "iota kappa lambda mu nu xi omicron pi rho sigma"))
    val b2 = mk((20L, "iota kappa lambda mu nu xi omicron pi rho tau")) // ~dup of 10
    val dir = tmpDir("lsh-append")
    LshIndex.build(spark, corpus, "doc_id", "text", "lsh_t2", s"$dir/t2",
      numBuckets = 4)
    try {
      // admit batch 1, append its signatures, then probe batch 2
      LshIndex.append(spark, b1, "doc_id", "text", "lsh_t2", numBuckets = 4)
      val cands = LshIndex.probe(spark, "lsh_t2", b2, "doc_id", "text")
      val verified = MinHashDedup.verifyShingleJaccard(
        cands, corpus.unionByName(b1).unionByName(b2), "doc_id", "text",
        n = 3, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(verified == Set((10L, 20L)))
    } finally spark.sql("DROP TABLE IF EXISTS lsh_t2")
  }

  test("probe join reads the index bucketed: no exchange on the index side") {
    val corpus = mk((1L to 20L).map(i =>
      (i, s"document number $i with some shared words plus token$i")): _*)
    val batch = mk((99L, "document number 7 with some shared words plus token7"))
    val dir = tmpDir("lsh-plan")
    LshIndex.build(spark, corpus, "doc_id", "text", "lsh_plan_t", s"$dir/t",
      numBuckets = 4)
    try {
      val cands = LshIndex.probe(spark, "lsh_plan_t", batch, "doc_id", "text")
      val p = cands.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("Bucketed: true"),
        s"index scan must use the bucketed layout:\n$p")
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
      // batch signatures shuffle to the index's bucketing; the distinct's
      // aggregation rides the same keys. The index itself NEVER moves.
      assert(exchanges <= 1,
        s"expected at most the batch-side exchange, saw $exchanges:\n$p")
    } finally spark.sql("DROP TABLE IF EXISTS lsh_plan_t")
  }

  test("oversized index buckets are shed map-side via bucket_n") {
    // 30 identical docs -> every band bucket holds all 30
    val corpus = mk((1L to 30L).map(i =>
      (i, "same boilerplate text repeated in every single document")): _*)
    val batch = mk((99L, "same boilerplate text repeated in every single document"))
    val dir = tmpDir("lsh-cap")
    LshIndex.build(spark, corpus, "doc_id", "text", "lsh_t3", s"$dir/t3",
      numBuckets = 4)
    try {
      val capped = LshIndex.probe(spark, "lsh_t3", batch, "doc_id", "text",
        maxBucketSize = 10)
      assert(capped.isEmpty) // shed: exact dedup's job, not LSH's
      val uncapped = LshIndex.probe(spark, "lsh_t3", batch, "doc_id", "text")
      assert(uncapped.count() == 30)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_t3")
  }
}
