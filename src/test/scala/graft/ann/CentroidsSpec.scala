package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine to own-label sum vector matches a driver-side reference") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Centroids.centroidCosine(emb, "label", "embedding")
      .select("vec_id", "cos_c")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = emb.select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x * 1000.0).toDouble).toArray))
    val sums = rows.groupBy(_._2).map { case (l, rs) =>
      l -> rs.map(_._3).transpose.map(_.sum)
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    rows.foreach { case (id, l, v) =>
      val c = sums(l).toArray
      val want = BigDecimal(dot(v, c) / (math.sqrt(dot(v, v)) *
        math.sqrt(dot(c, c))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want, s"vec $id: ${got(id)} vs $want")
    }
  }

  test("an off-distribution vector scores below its in-cluster peers") {
    val emb = Tables.load(spark, sf, "embeddings")
    // plant an inverted copy of vec 0 under the same label
    val planted = emb.limit(1)
      .withColumn("vec_id", lit(999999L))
      .withColumn("embedding", transform(col("embedding"),
        x => -x))
    val scored = Centroids.centroidCosine(emb.unionByName(planted),
        "label", "embedding")
      .select("vec_id", "cos_c").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val label0 = emb.limit(1).select("label").collect()(0).getInt(0)
    val peers = emb.filter(col("label") === label0)
      .select("vec_id").as[Long].collect()
    val peerMean = peers.map(scored).sum / peers.length
    assert(scored(999999L) < peerMean,
      s"inverted vector ${scored(999999L)} vs peer mean $peerMean")
  }

  test("null labels and zero vectors score NULL, others unaffected") {
    val df = Seq(
      (1L, Some(0), Seq(1.0f, 0.0f)),
      (2L, Some(0), Seq(0.0f, 1.0f)),
      (3L, None, Seq(1.0f, 1.0f)),
      (4L, Some(0), Seq(0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Centroids.centroidCosine(df, "label", "embedding")
      .select("vec_id", "cos_c").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(3L).isEmpty, "null label")
    assert(out(4L).isEmpty, "zero vector")
    assert(out(1L).isDefined && out(2L).isDefined)
    // sum vector is (1000, 1000): both unit axes score cos 45°
    assert(out(1L) == out(2L))
    assert(math.abs(out(1L).get.asInstanceOf[Double] - 0.707107) < 1e-6)
  }

  test("scoring plan broadcasts the sum-vector table") {
    val emb = Tables.load(spark, sf, "embeddings")
    val plan = Centroids.centroidCosine(emb, "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
  }
}
