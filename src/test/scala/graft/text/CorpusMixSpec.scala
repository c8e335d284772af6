package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CorpusMixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("integer weights repeat every doc exactly w times with epoch ids") {
    val out = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map("src0" -> 3.0, "src1" -> 0.0), default = 1.0))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == base("src0") * 3)
    assert(!bySrc.contains("src1")) // weight 0 drops the source entirely
    assert(bySrc("src5") == base("src5"))
    // epochs are dense per doc: a src0 doc has epochs {0,1,2}
    val epochs = out.filter(col("source") === "src0")
      .groupBy("doc_id").agg(collect_set("epoch").as("e"))
      .select("e").collect().map(_.getSeq[Long](0).toSet)
    assert(epochs.forall(_ == Set(0L, 1L, 2L)))
  }

  test("fractional weights thin deterministically near the target rate") {
    val out = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map.empty, default = 0.5))
    val n = out.count()
    val total = docs.count()
    // hash-threshold sampling at 50%: exact count is fixed for this data
    assert(n > total * 3 / 10 && n < total * 7 / 10)
    // deterministic: a second run is row-identical
    val again = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map.empty, default = 0.5))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("mixed weight = whole epochs plus a hash-sampled fractional epoch") {
    val out = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map("src2" -> 2.5), default = 1.0))
    val src2Docs = docs.filter(col("source") === "src2").count()
    val src2Rows = out.filter(col("source") === "src2").count()
    assert(src2Rows >= src2Docs * 2 && src2Rows <= src2Docs * 3)
    // every src2 doc has at least epochs {0,1}; some have epoch 2
    val minMax = out.filter(col("source") === "src2")
      .groupBy("doc_id").agg(max("epoch").as("m"))
      .groupBy("m").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(minMax.keySet == Set(1L, 2L))
  }

  test("the mix plan is map-only: no exchange, generator inline") {
    val p = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map("src0" -> 2.5)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"mix must not shuffle:\n$p")
    assert(p.contains("Generate"))
  }

  test("temperature targets: alpha=1 keeps natural proportions") {
    // at alpha=1 the sampling probability equals the natural share, so
    // every source's target mass is budgetFraction * its own mass ->
    // w_pct = round(100 * budgetFraction) for ALL sources
    val w = CorpusMix.temperatureTargets(docs, "source", "n_chars",
      alpha = 1.0, budgetFraction = 0.5)
    val pcts = w.select("w_pct").collect().map(_.getLong(0)).toSet
    assert(pcts == Set(50L), s"alpha=1 must be uniform thinning: $pcts")
  }

  test("temperature targets: small alpha upsamples small sources") {
    val w = CorpusMix.temperatureTargets(docs, "source", "n_chars",
      alpha = 0.3, budgetFraction = 1.0)
      .collect().map(r => r.getAs[Long]("n_w") -> r.getAs[Long]("w_pct"))
    val smallest = w.minBy(_._1)
    val largest = w.maxBy(_._1)
    assert(smallest._2 > largest._2,
      s"flattening must weight the small source harder: $smallest vs $largest")
    // mass conservation: sum(n_w * w_pct/100) ~ budget = sum(n_w) * 1.0
    val total = w.map(_._1).sum.toDouble
    val mixed = w.map { case (n, p) => n.toDouble * p / 100.0 }.sum
    assert(math.abs(mixed - total) / total < 0.02,
      s"targets must conserve the budget: $mixed vs $total")
  }

  test("mixByWeightTable matches mixByWeights for the same integer weights") {
    val weights = Seq(("src0", 250L), ("src1", 40L)).toDF("source", "w_pct")
    val viaTable = docs.transform(CorpusMix.mixByWeightTable(
      weights, "source", "doc_id", defaultPct = 100L))
      .select("doc_id", "source", "epoch")
    val viaMap = docs.transform(CorpusMix.mixByWeights(
      "source", "doc_id", Map("src0" -> 2.5, "src1" -> 0.4), default = 1.0))
      .select("doc_id", "source", "epoch")
    assert(viaTable.exceptAll(viaMap).isEmpty && viaMap.exceptAll(viaTable).isEmpty)
  }

  test("the weight-table mix is a broadcast join: no corpus-side exchange") {
    val weights = Seq(("src0", 250L)).toDF("source", "w_pct")
    val p = docs.transform(CorpusMix.mixByWeightTable(weights, "source", "doc_id"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), s"weights must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the corpus must not shuffle for the mix:\n$p")
  }
}
