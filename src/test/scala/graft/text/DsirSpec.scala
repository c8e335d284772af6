package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("ngramFeatures: unigrams then bigrams, in order; empties dropped") {
    val out = Seq("The cat, sat!", "one", "", "??!").toDF("t")
      .select(Dsir.ngramFeatures(col("t")).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("the", "cat", "sat", "the_cat", "cat_sat"))
    assert(out(1) == Seq("one"))
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("bucket: stable in [0, buckets) and spreads grams") {
    val b = Seq.tabulate(200)(i => s"gram$i").toDF("g")
      .select(Dsir.bucket(col("g"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b.forall(x => x >= 0 && x < 64))
    assert(b.distinct.length > 32, "200 grams into 64 buckets must spread")
    // determinism across evaluations
    val b2 = Seq.tabulate(200)(i => s"gram$i").toDF("g")
      .select(Dsir.bucket(col("g"), 64).as("b"))
      .collect().map(_.getLong(0))
    assert(b.sameElements(b2))
  }

  test("importanceTable signs: target-only buckets positive, raw-only negative") {
    val target = Seq.fill(40)("alpha beta").toDF("text")
    val raw = Seq.fill(40)("gamma delta").toDF("text")
    val buckets = 1 << 12
    val tab = Dsir.importanceTable(
      Dsir.fitBucketCounts(target, "text", buckets),
      Dsir.fitBucketCounts(raw, "text", buckets))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alphaB = Seq("alpha").toDF("g")
      .select(Dsir.bucket(col("g"), buckets)).head().getLong(0)
    val gammaB = Seq("gamma").toDF("g")
      .select(Dsir.bucket(col("g"), buckets)).head().getLong(0)
    assert(tab(alphaB) > 0, s"target-only bucket must be positive: $tab")
    assert(tab(gammaB) < 0, s"raw-only bucket must be negative: $tab")
  }

  test("selectLikeTarget pulls target-like docs ahead of gibberish") {
    // raw corpus: 10 English-like docs + 10 hex-gibberish docs; target
    // is a disjoint English-like sample (no doc overlap — the score must
    // generalize via shared grams, not memorize ids)
    val english = Seq.tabulate(10)(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog $i"))
    val noise = Seq.tabulate(10)(i =>
      (100L + i, s"zx$i qqj wvk ppl mmn bbv ccx zzl kkj hhg$i"))
    val raw = (english ++ noise).toDF("doc_id", "text")
    val target = Seq.tabulate(5)(i =>
      (1000L + i, "the quick red fox walks over the calm dog"))
      .toDF("doc_id", "text")
    val picked = Dsir.selectLikeTarget(raw, target, "doc_id", "text", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(picked == english.map(_._1).toSet,
      s"top-10 must be exactly the English-like docs: $picked")
  }

  test("scores are deterministic and total over the real documents table") {
    val target = docs.filter(col("lang") === "en")
    val a = Dsir.selectLikeTarget(docs, target, "doc_id", "text", k = 50)
      .collect()
    val b = Dsir.selectLikeTarget(docs, target, "doc_id", "text", k = 50)
      .collect()
    assert(a.sameElements(b))
    assert(a.length == 50)
    // scoring drops only gram-free docs
    val table = Dsir.importanceTable(
      Dsir.fitBucketCounts(target, "text"), Dsir.fitBucketCounts(docs, "text"))
    val scored = Dsir.score(docs, table, "doc_id", "text")
    assert(scored.count() ==
      docs.filter(size(Dsir.ngramFeatures(col("text"))) > 0).count())
  }

  test("selection favors the target language on real data") {
    val target = docs.filter(col("lang") === "en")
    val picked = Dsir.selectLikeTarget(docs, target, "doc_id", "text", k = 50)
    val langs = picked.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.getOrElse("en", 0L) >= 40,
      s"picking like-en must mostly pick en: $langs")
  }

  test("plan: lambda table broadcasts; top-k is TakeOrdered, not a global sort") {
    val target = docs.filter(col("lang") === "en")
    val table = Dsir.importanceTable(
      Dsir.fitBucketCounts(target, "text"), Dsir.fitBucketCounts(docs, "text"))
    val plan = Dsir.selectTopK(
      Dsir.score(docs, table, "doc_id", "text"), "doc_id", 50)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      s"lambda table must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"gram side must never sort-merge:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must avoid a full sort:\n$plan")
  }
}
