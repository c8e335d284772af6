package graft.text

import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence survives; later copies are cut from their docs") {
    val docs = Seq(
      (1L, "a b c d e f"),     // spans (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),     // "a b c" is doc 1's -> only "x y z" stays
      (3L, "x y z"),           // whole doc is doc 2's span -> disappears
      (4L, "q r s a b c")      // "a b c" at pos 1 loses; "q r s" stays
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", spanWords = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "a b c d e f",
      2L -> "x y z",
      4L -> "q r s"))
  }

  test("within one doc, the earlier position wins") {
    val docs = Seq((7L, "p q r p q r tail x")).toDF("doc_id", "text")
    // spans: "p q r"(0), "p q r"(1), "tail x"(2) -> pos 1 is the dup
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", spanWords = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(7L -> "p q r tail x"))
  }

  test("short tail span and single-span docs round-trip") {
    val docs = Seq((1L, "only two"), (2L, "a b c d")).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", spanWords = 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "only two", 2L -> "a b c d"))
  }

  test("within-doc dedup removes repeats per doc, never across docs") {
    val docs = Seq(
      (1L, "a b c a b c x y"),  // spans(3): "a b c","a b c","x y" -> dedup
      (2L, "a b c")             // doc 1's span does NOT affect doc 2
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpansWithinDoc(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a b c x y", 2L -> "a b c"))
  }

  test("null text yields no spans, not garbage rows") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = SpanDedup.dedupSpans(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(corpus == Map(1L -> "a b c")) // null-text doc has nothing to keep
    val within = SpanDedup.dedupSpansWithinDoc(docs, "doc_id", "text", 3)
      .as[(Long, String)].collect().toMap
    assert(within == Map(1L -> "a b c", 2L -> ""))
  }

  test("within-doc dedup is shuffle-free") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = SpanDedup.dedupSpansWithinDoc(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("plan: no cartesian product; winner agg is hash-aggregated") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = SpanDedup.dedupSpans(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("HashAggregate")) // not a global-sort window
  }
}
