package graft.operators

import graft.SparkSpec
import graft.text.TextStats
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QuotaCapSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, keys: Int) =
    spark.range(n).toDF("id")
      .withColumn("key", concat(lit("k"), pmod(col("id"), lit(keys.toLong))))

  /** The semantics in one line: a single per-key window (the thing the
    * two-level version must never run over a mega-key at scale). */
  private def naive(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val h = TextStats.portableHash60(concat(lit("quota"), col("id").cast("string")))
    df.withColumn("__h", h)
      .withColumn("quota_rank",
        row_number().over(Window.partitionBy(col("key"))
          .orderBy(col("__h"), col("id"))).cast("long"))
      .filter(col("quota_rank") <= n)
      .drop("__h")
  }

  test("matches the single-window definition exactly") {
    val df = corpus(500, 7)
    val got = QuotaCap.capPerKey(df, "key", "id", n = 20, subBuckets = 8)
      .select("id", "key", "quota_rank").as[(Long, String, Long)].collect().toSet
    val want = naive(df, 20)
      .select("id", "key", "quota_rank").as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("output is invariant to subBuckets") {
    val df = corpus(300, 5)
    def run(b: Int) = QuotaCap.capPerKey(df, "key", "id", n = 15, subBuckets = b)
      .select("id", "quota_rank").as[(Long, Long)].collect().toSet
    assert(run(1) == run(5))
    assert(run(5) == run(64))
  }

  test("caps at n per key; smaller keys keep all rows with dense ranks") {
    // k0 has 4 rows, k1 has 40
    val df = (0L until 44L).map(i => (i, if (i < 4) "k0" else "k1")).toDF("id", "key")
    val out = QuotaCap.capPerKey(df, "key", "id", n = 10)
    val byKey = out.groupBy("key").agg(count("*").as("c"), max("quota_rank").as("m"))
      .as[(String, Long, Long)].collect().map { case (k, c, m) => k -> (c, m) }.toMap
    assert(byKey("k0") == (4L, 4L))
    assert(byKey("k1") == (10L, 10L))
  }

  test("the kept subset is a hash-ordered prefix: adding rows never evicts a smaller-hash winner") {
    val small = corpus(200, 4)
    val big = corpus(400, 4)
    val keptSmallHashes = QuotaCap.capPerKey(small, "key", "id", n = 5)
      .select("id").as[Long].collect().toSet
    val keptBigTop = QuotaCap.capPerKey(big, "key", "id", n = 5)
    // every survivor of the bigger corpus that existed in the smaller one
    // must also have survived there (prefix-stability of hash order)
    val bigSurvivorsFromSmall = keptBigTop.filter(col("id") < 200)
      .select("id").as[Long].collect().toSet
    assert(bigSurvivorsFromSmall.subsetOf(keptSmallHashes))
  }

  test("level-1 window is salted by sub-bucket so a mega-key never sorts in one task") {
    val plan = QuotaCap.capPerKey(corpus(100, 2), "key", "id", n = 5, subBuckets = 8)
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.exists(l => l.contains("pmod") || l.contains("_w")),
      s"no salted level-1 window found in:\n$plan")
    assert(windowLines.size >= 2, s"expected two window levels in:\n$plan")
  }
}
