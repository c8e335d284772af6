package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  // w=3 keeps the vectors hand-checkable
  private val W = 3

  test("a passage shared across docs is duplicated in the HIGHER doc only") {
    val d = docs(
      1L -> "the quick brown fox jumps over lazy dogs",
      2L -> "intro words the quick brown fox jumps closing")
    // doc 2 copies the 6-token passage "the quick brown fox jumps";
    // its windows at positions 3..6 (1-based) match doc 1's windows
    val dup = SubstringDedup.dupPositions(d, "id", "text", W)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(dup.forall(_._1 == 2L), "keeper doc 1 must keep everything")
    assert(dup.map(_._2).toSeq == Seq(3L, 4L, 5L), dup.toSeq.toString)
  }

  test("stats: merged spans count covered tokens once, short docs drop") {
    val d = docs(
      1L -> "the quick brown fox jumps over lazy dogs",
      2L -> "intro words the quick brown fox jumps closing",
      3L -> "too short")
    val s = SubstringDedup.stats(d, "id", "text", W)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!s.contains(3L), "docs under w tokens carry no windows")
    assert(s(1L) == ((6L, 0L, 0L)))
    // doc 2: 8 tokens -> 6 windows; dup windows 3,4,5 merge into ONE
    // span covering tokens 3..7 = 5 tokens (not 3*3=9)
    assert(s(2L) == ((6L, 3L, 5L)), s.toString)
  }

  test("clean scrubs the copy, keeps the keeper, empties a full copy") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "start alpha beta gamma delta epsilon zeta end",
      3L -> "alpha beta gamma delta epsilon zeta") // full copy of doc 1
    val out = SubstringDedup.clean(d, "id", "text", W)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha beta gamma delta epsilon zeta",
      "keeper text untouched")
    assert(out(2L) == "start end", out(2L))
    assert(out(3L) == "", "a fully-duplicated doc comes back empty, not dropped")
  }

  test("disjoint docs are untouched; within-doc repetition is NOT cross-doc dup") {
    val d = docs(
      1L -> "one two three one two three one two three",
      2L -> "completely different words in this other document here")
    val s = SubstringDedup.stats(d, "id", "text", W)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) == 0L, "self-repetition belongs to SpanDedup, not cross-doc")
    assert(s(2L) == 0L)
  }

  test("incremental: batch vs committed gram index equals full recompute") {
    val committed = docs(
      1L -> "the quick brown fox jumps over lazy dogs",
      2L -> "some other committed content entirely here today")
    val batch = docs(
      10L -> "intro words the quick brown fox jumps closing", // hits doc 1
      11L -> "fresh new content nobody committed before now",
      12L -> "fresh new content nobody committed before also") // hits 11 in-batch
    val idx = SubstringDedup.gramIndex(committed, "id", "text", W)
    val inc = SubstringDedup.incrementalDupPositions(batch, "id", "text",
      idx, W).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // reference: run the FULL dedup over committed ∪ batch, keep batch rows
    val full = SubstringDedup.dupPositions(
      committed.unionByName(batch), "id", "text", W)
      .filter(col("id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc.exists(_._1 == 10L), "committed hit must flag")
    assert(inc.exists(_._1 == 12L), "batch-internal dup must flag")
    assert(!inc.exists(_._1 == 11L), "the batch keeper survives")
    // empty index: only batch-internal dups remain
    val cold = SubstringDedup.incrementalDupPositions(batch, "id", "text",
      idx.limit(0), W).collect().map(_.getLong(0)).distinct.sorted.toSeq
    assert(cold == Seq(12L))
    // stats face rides the same positions
    val s = SubstringDedup.incrementalStats(batch, "id", "text", idx, W)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(10L) == 3L && s(11L) == 0L && s(12L) > 0L)
  }

  test("plan: no cartesian, keeper aggregate map-side combined") {
    val d = Tables.load(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text"))
    val plan = SubstringDedup.stats(d, "id", "text", 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"the keeper min(doc) aggregate must map-side combine:\n$plan")
  }

  test("real documents corpus: planted copies found, originals clean") {
    val base = Tables.load(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 40)
    // plant: copy the first 30 tokens of every 5th doc into a new doc
    val planted = base.filter(col("id") % 5 === 0)
      .select((col("id") + 1000000L).as("id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 30)).as("text"))
    val corpus = base.unionByName(planted)
    val s = SubstringDedup.stats(corpus, "id", "text", 20)
    val plantedRows = s.filter(col("id") >= 1000000L)
    // every planted doc: 30 tokens -> 11 windows, ALL duplicated,
    // covering all 30 tokens
    assert(plantedRows.filter(col("dup_windows") =!= 11L ||
      col("dup_tokens") =!= 30L).count() == 0)
    assert(plantedRows.count() == planted.count())
    // the %5==0 sources are the KEEPERS of their planted copies' windows
    // (lower id), so the plants alone flag nothing in them — any base
    // dup is the corpus's own natural cross-doc repetition (the
    // synthetic generator reuses sentences; 17 docs at this SF), which
    // must stay internally consistent: never more dup windows than
    // windows, never more covered tokens than the doc holds
    assert(s.filter(col("dup_windows") > col("n_grams")).count() == 0)
    assert(s.filter(col("dup_tokens") > col("n_grams") + 19).count() == 0)
  }
}
