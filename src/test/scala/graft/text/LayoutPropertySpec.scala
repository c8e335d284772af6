package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.QuotaCap

/** Property-based laws for the corpus-layout operators (SURVEY §5 style:
  * fixed-seed generators, one DataFrame per law so Spark runs once per
  * property, not once per case). */
class LayoutPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A]): A =
    g.apply(Gen.Parameters.default, Seed(1729L))
      .getOrElse(sys.error("gen failed"))

  test("ShardPack law: for random weights/budgets, distributed == naive global window") {
    val cases = sample(Gen.listOfN(4, for {
      n <- Gen.choose(1, 400)
      budget <- Gen.choose(1L, 5000L)
      buckets <- Gen.oneOf(1, 3, 32, 1024)
      weights <- Gen.listOfN(n, Gen.choose(0L, 300L))
    } yield (n, budget, buckets, weights)))
    cases.foreach { case (_, budget, buckets, weights) =>
      val df = weights.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "w")
      val got = ShardPack.packByBudget(df, "id", "w", budget, buckets = buckets)
        .select("id", "cum_before", "shard_id")
        .as[(Long, Long, Long)].collect().toSet
      val h = TextStats.portableHash60(concat(lit("shard"), col("id").cast("string")))
      val want = df.withColumn("__h", h)
        .withColumn("cum_before", coalesce(
          sum(col("w")).over(Window.orderBy(col("__h"), col("id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("shard_id", expr(s"cum_before div ${budget}L"))
        .select("id", "cum_before", "shard_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"mismatch at budget=$budget buckets=$buckets")
    }
  }

  test("QuotaCap law: for random skew, two-level == naive; never more than n per key") {
    val cases = sample(Gen.listOfN(3, for {
      n <- Gen.choose(1, 30)
      keys <- Gen.choose(1, 6)
      rows <- Gen.choose(1, 500)
      sub <- Gen.oneOf(1, 4, 64)
    } yield (n, keys, rows, sub)))
    cases.foreach { case (n, keys, rows, sub) =>
      // geometric-ish skew: key k gets ~rows/2^k rows — one mega-key
      val df = spark.range(rows.toLong).toDF("id")
        .withColumn("key", concat(lit("k"),
          floor(log2(pmod(col("id"), lit(255L)) + 1)).cast("int")))
        .filter(pmod(col("id"), lit(keys.toLong)) >= 0) // keep all; key dist is skewed
      val got = QuotaCap.capPerKey(df, "key", "id", n, subBuckets = sub)
        .select("id", "quota_rank").as[(Long, Long)].collect().toSet
      val h = TextStats.portableHash60(concat(lit("quota"), col("id").cast("string")))
      val want = df.withColumn("__h", h)
        .withColumn("quota_rank", row_number().over(
          Window.partitionBy(col("key")).orderBy(col("__h"), col("id"))).cast("long"))
        .filter(col("quota_rank") <= n)
        .select("id", "quota_rank").as[(Long, Long)].collect().toSet
      assert(got == want, s"mismatch at n=$n sub=$sub rows=$rows")
      val counts = QuotaCap.capPerKey(df, "key", "id", n, subBuckets = sub)
        .groupBy("key").count().as[(String, Long)].collect()
      assert(counts.forall(_._2 <= n))
    }
  }

  test("Chunker law: stride == seqLen partitions the token stream exactly (lossless, disjoint)") {
    val texts = sample(Gen.listOfN(60, for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dddd"))
    } yield toks.mkString(" ")))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val seqLen = 7
    val rebuilt = Chunker.chunkByTokens(df, "text", seqLen, stride = seqLen)
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .getField("chunk_text"), " ").as("rebuilt"),
        sum("n_chunk_tokens").as("n"))
    val bad = rebuilt.join(df, "doc_id")
      .filter(col("rebuilt") =!= col("text") ||
        col("n") =!= size(split(col("text"), " ")))
    assert(bad.isEmpty, s"reconstruction broke: ${bad.take(2).mkString}")
  }

  test("Chunker law: every token position is covered by at least one window for stride <= seqLen") {
    val df = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    for ((seqLen, stride) <- Seq((5, 3), (8, 8), (10, 1))) {
      val covered = Chunker.chunkByTokens(df, "text", seqLen, stride)
        .select(explode(split(col("chunk_text"), " ")).as("tok"))
        .distinct().count()
      assert(covered == 100L, s"lost tokens at seqLen=$seqLen stride=$stride")
    }
  }
}
