package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def fp = graft.text.TextStats.contentFingerprint(col("text"))

  test("survivors drops committed content, collapses within-batch dups") {
    val committed = Seq("aaa", "bbb").toDF("text").select(md5($"text").as("h"))
    val batch = Seq(
      (10L, "aaa"), // committed -> dropped
      (11L, "new one"), // new -> survives
      (12L, "new two"), (13L, "new two"), // within-batch dup -> min id
      (14L, "bbb") // committed -> dropped
    ).toDF("doc_id", "text")
    val out = IncrementalDedup.survivors(batch, committed, "doc_id", fp)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 12L))
  }

  test("bloom prefilter result equals the exact anti-join at high fpp") {
    // fpp=0.5 forces plenty of false positives through the sketch; the
    // exact verify join must remove every one of them
    val docs = (0L until 400L).map(i => (i, s"doc number ${i % 120}"))
      .toDF("doc_id", "text")
    val committed = docs.filter($"doc_id" < 300).select(md5($"text").as("h"))
    val batch = docs.filter($"doc_id" >= 300)
    val fast = IncrementalDedup.survivors(batch, committed, "doc_id", fp,
      fpp = 0.5)
    val exact = IncrementalDedup.survivorsExact(batch, committed, "doc_id", fp)
    assert(fast.count() == exact.count())
    assert(fast.join(exact, Seq("content_hash", "doc_id"), "left_anti").isEmpty)
    assert(exact.join(fast, Seq("content_hash", "doc_id"), "left_anti").isEmpty)
  }

  test("null fingerprints survive as definitely-new, matching the exact path") {
    val committed = Seq("aaa").toDF("text").select(md5($"text").as("h"))
    val batch = Seq((1L, "aaa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val fast = IncrementalDedup.survivors(batch, committed, "doc_id", fp)
    val exact = IncrementalDedup.survivorsExact(batch, committed, "doc_id", fp)
    assert(fast.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(exact.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("empty committed store admits the whole (deduped) batch") {
    val committed = Seq.empty[String].toDF("h")
    val batch = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val out = IncrementalDedup.survivors(batch, committed, "doc_id", fp)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L))
  }
}
