package graft.text

import graft.{SparkSpec, Tables}
import graft.operators.Converters
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import QualityClassifier._

  // planted linearly-separable rule over REAL corpus text: a doc is
  // "high quality" iff it mentions 'slow' more often than 'fast'
  private def labeled = {
    val docs = Tables.load(spark, sf, "documents")
    docs.withColumn("label",
      (size(split(col("text"), "slow")) >
        size(split(col("text"), "fast"))).cast("int"))
  }

  test("recovers the planted rule on the training corpus") {
    val df = labeled
    val m = train(df, "doc_id", "text", "label", buckets = 512, epochs = 40)
    val scored = score(df, m, "doc_id", "text")
    val acc = scored
      .agg(avg((col("quality_pred") === (col("label") === 1)).cast("double")))
      .collect()(0).getDouble(0)
    assert(acc >= 0.95, s"training accuracy $acc")
  }

  test("generalizes to a held-out split") {
    val df = labeled.transform(Converters.hashSplit("doc_id",
      Seq("train" -> 80, "test" -> 20)))
    val m = train(df.filter(col("split") === "train"),
      "doc_id", "text", "label", buckets = 512, epochs = 40)
    val heldOut = df.filter(col("split") === "test")
    val acc = score(heldOut, m, "doc_id", "text")
      .agg(avg((col("quality_pred") === (col("label") === 1)).cast("double")))
      .collect()(0).getDouble(0)
    assert(acc >= 0.85, s"holdout accuracy $acc")
  }

  test("learned weights carry the planted signs") {
    val m = train(labeled, "doc_id", "text", "label",
      buckets = 512, epochs = 40)
    def bucket(word: String): Int = {
      val h = spark.range(1).select(pmod(
        TextStats.portableHash60(lit(word)), lit(512L))).collect()(0)
      h.getLong(0).toInt
    }
    assert(m.weights(bucket("slow")) > 0,
      s"w(slow)=${m.weights(bucket("slow"))}")
    assert(m.weights(bucket("fast")) < 0,
      s"w(fast)=${m.weights(bucket("fast"))}")
  }

  test("tokenless docs score at the bias instead of dropping") {
    import spark.implicits._
    val df = Seq((1L, "slow slow fast", 1), (2L, "", 0))
      .toDF("doc_id", "text", "label")
    val m = LrModel(new Array[Double](16), bias = 2.0, buckets = 16)
    val out = score(df, m, "doc_id", "text").collect()
    assert(out.length == 2)
    val empty = out.find(_.getLong(0) == 2L).get
    assert(math.abs(empty.getAs[Double]("quality_score") -
      1.0 / (1.0 + math.exp(-2.0))) < 1e-12)
  }

  test("training sample is capped deterministically") {
    val df = labeled
    // cap below corpus size: training must still work and be reproducible
    val m1 = train(df, "doc_id", "text", "label", buckets = 256,
      epochs = 5, maxTrainDocs = 100)
    val m2 = train(df, "doc_id", "text", "label", buckets = 256,
      epochs = 5, maxTrainDocs = 100)
    // same sampled rows both times; float merge order may differ at
    // the ulp level, so compare to tolerance rather than bitwise
    val maxDiff = m1.weights.zip(m2.weights)
      .map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-9 && math.abs(m1.bias - m2.bias) < 1e-9,
      s"maxDiff=$maxDiff")
  }

  test("oversized bucket space is refused") {
    intercept[IllegalArgumentException] {
      train(labeled, "doc_id", "text", "label", buckets = 1 << 21)
    }
  }

  test("scoring plan broadcasts the weight table") {
    val m = LrModel(new Array[Double](64), 0.0, 64)
    val plan = score(Tables.load(spark, sf, "documents"), m,
      "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
