package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exactTop(df: org.apache.spark.sql.DataFrame, key: String,
                       m: Int): Seq[(String, Long)] =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc).limit(m)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("topExact equals the plain groupBy top-m on real corpus words") {
    val words = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
    val got = HeavyHitters.topExact(words, "word", m = 10, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exactTop(words, "word", 10))
  }

  test("summaries never exceed k counters per partition") {
    val k = 8
    // 40 distinct keys per partition forces constant overflow
    val ds = spark.range(0, 20000).map(i => s"k${i % 40}")
      .repartition(4)
    val perPartition = HeavyHitters.summaries(ds, k)
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPartition.forall(_ <= k))
  }

  test("skewed stream: planted heavy keys found exactly despite tiny k") {
    // 3 heavy keys at 6000 each over 6000 unique singletons:
    // N = 24000, k = 15 → N/(k+1) = 1500 < 6000, certificate holds
    val heavy = (0 until 6000).flatMap(i => Seq("hot1", "hot2", "hot3"))
    val noise = (0 until 6000).map(i => s"u$i")
    val df = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(heavy ++ noise), 8).toDF("key")
    val got = HeavyHitters.topExact(df, "key", m = 3, k = 15)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq("hot1" -> 6000L, "hot2" -> 6000L, "hot3" -> 6000L))
  }

  test("uncertifiable top-m is refused, not silently approximate") {
    // near-uniform keys with k far too small: m-th count ≤ N/(k+1)
    val df = spark.range(0, 4000).map(i => s"k${i % 400}").toDF("key")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topExact(df, "key", m = 5, k = 3)
    }
    assert(e.getMessage.contains("not certifiable"))
  }

  test("integral keys widen to bigint and count exactly") {
    val ev = Tables.load(spark, sf, "events")
    val got = HeavyHitters.topExact(ev, "user_id", m = 5, k = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id").asc).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("oversized candidate set is refused by maxCandidates") {
    val df = spark.range(0, 2000).map(i => s"k$i").toDF("key")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topExact(df, "key", m = 1, k = 4096, maxCandidates = 100)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }
}
