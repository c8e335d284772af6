package graft.ann

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantizeSpec extends SparkSpec {

  test("codes stay in int8 range; round-trip error is bounded by scale/2") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = Quantize.quantizeInt8(emb, "vec_id", "embedding")
    val joined = q.join(emb, "vec_id")
      .withColumn("deq", Quantize.dequantizeInt8(q))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      .select(
        array_max(transform(col("codes"), c => abs(c))).as("max_abs_code"),
        array_min(col("codes")).as("min_code"),
        array_max(zip_with(col("deq"),
          col("embedding").cast("array<double>"),
          (a, b) => abs(a - b))).as("max_err"),
        col("scale"))
    val bad = joined.filter(col("min_code") < -128 ||
      col("max_abs_code") > 128 ||
      col("max_err") > col("scale") / 2 + lit(1e-12)).count()
    assert(bad == 0)
    assert(q.count() == emb.count())
  }

  test("constant vector codes to zeros and reconstructs exactly") {
    import spark.implicits._
    val df = Seq((1L, Seq(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(df, "vec_id", "embedding")
    val row = q.withColumn("deq", Quantize.dequantizeInt8(q))
      .select("codes", "deq").head
    assert(row.getSeq[Int](0) == Seq(0, 0, 0))
    assert(row.getSeq[Double](1) == Seq(2.5, 2.5, 2.5))
  }

  test("extremes hit the full [-128, 127] range") {
    import spark.implicits._
    val df = Seq((1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(df, "vec_id", "embedding")
    assert(q.select("codes").head.getSeq[Int](0) == Seq(-128, 127))
  }

  test("plan is map-only: no exchange") {
    val emb = Tables.load(spark, sf, "embeddings")
    val plan = Quantize.quantizeInt8(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
