package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("charGrams: sliding windows, short-text empty, exact count") {
    val out = Seq("abcde", "ab", "", "abc").toDF("t")
      .select(NgramLm.charGrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("abc", "bcd", "cde"))
    assert(out(1).isEmpty && out(2).isEmpty)
    assert(out(3) == Seq("abc"))
  }

  test("train counts grams across docs and enforces minCount") {
    val m = NgramLm.train(
      Seq("abcd", "abcd", "zzzq").toDF("text"), "text", n = 3, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "abc","bcd" occur twice; "zzq"/"zzz" once -> filtered
    assert(m == Map("abc" -> 2L, "bcd" -> 2L))
  }

  test("floorLog2 via bin-length is exact at powers of two") {
    val vals = Seq(1L, 2L, 3L, 4L, 7L, 8L, 1023L, 1024L).toDF("c")
      .select(NgramLm.floorLog2(col("c")).as("l"))
      .collect().map(_.getLong(0))
    assert(vals.toSeq == Seq(0L, 1L, 1L, 2L, 2L, 3L, 9L, 10L))
  }

  test("familiarity separates corpus-like text from gibberish") {
    val corpus = Seq.tabulate(50)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "text")
    val probe = Seq((100L, "the cat sat"), (101L, "xqzj vwkp fgh")).toDF("doc_id", "text")
    val scores = NgramLm.familiarity(probe, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fam_q")).toMap
    assert(scores(100L) > scores(101L),
      s"corpus-like text must outscore gibberish: $scores")
    assert(scores(101L) == 0L, "fully-OOV text scores the smoothing floor")
  }

  test("self-scoring the documents table is deterministic and total") {
    val model = NgramLm.train(docs, "text")
    val out = NgramLm.familiarity(docs, model, "doc_id", "text")
    assert(out.count() == docs.filter(length(col("text")) >= 3).count())
    val a = out.orderBy("doc_id").collect()
    val b = NgramLm.familiarity(docs, NgramLm.train(docs, "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("trainCollected equals the lazy model; oversized vocab refused loudly") {
    val lazyRows = NgramLm.train(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val collected = NgramLm.trainCollected(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(collected == lazyRows)
    // scoring through the collected model is row-identical
    val a = NgramLm.familiarity(docs, NgramLm.train(docs, "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    val b = NgramLm.familiarity(docs, NgramLm.trainCollected(docs, "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val e = intercept[IllegalArgumentException] {
      NgramLm.trainCollected(docs, "text", maxGrams = 3)
    }
    assert(e.getMessage.contains("maxGrams"))
  }

  test("trainCollected: compatible 2M default, strict opt-in, size gauged into metrics") {
    // the DEFAULT stays at the original 2,000,000 so an upgrade never
    // silently refuses an existing caller's model; the stricter bound is
    // an explicit opt-in (RecommendedMaxGrams) — pin both so a change to
    // either is a conscious API decision
    val m = NgramLm.getClass.getMethods
      .find(_.getName == "trainCollected$default$5").get
      .invoke(NgramLm)
    assert(m == 2000000, s"default maxGrams changed: $m")
    assert(NgramLm.RecommendedMaxGrams == 200000)
    val ctx = graft.metrics.MetricContext.root("lm-train")
    NgramLm.trainCollected(docs, "text", metrics = Some(ctx))
    val gauged = ctx.gaugeValue("ngram_lm.collected_grams")
    assert(gauged.exists(_ > 0), s"collected size must be gauged: $gauged")
    // the gauge lands even when the guard refuses (that is its point)
    val ctx2 = graft.metrics.MetricContext.root("lm-train-blown")
    intercept[IllegalArgumentException] {
      NgramLm.trainCollected(docs, "text", maxGrams = 3, metrics = Some(ctx2))
    }
    assert(ctx2.gaugeValue("ngram_lm.collected_grams").exists(_ > 3))
  }

  test("scoring plan: model broadcast, one combiner-reduced doc shuffle") {
    val model = NgramLm.train(docs, "text")
    val p = NgramLm.familiarity(docs, model, "doc_id", "text")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"model side must broadcast:\n$p")
    // exactly the model-count exchange + the per-doc agg exchange reach
    // the corpus path; the doc grams themselves never join-shuffle
    assert(!p.contains("SortMergeJoin"), s"grams must not sort-merge:\n$p")
    assert(p.contains("partial_count"), s"doc agg must map-side combine:\n$p")
  }
}
