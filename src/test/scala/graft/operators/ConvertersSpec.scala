package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

class ConvertersSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sf, "orders")
  private lazy val lineitem = Tables.load(spark, sf, "lineitem")

  test("pickFields keeps exactly the requested columns") {
    val out = orders.transform(Converters.pickFields(Seq("o_orderkey", "o_totalprice")))
    assert(out.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    assert(out.count() == orders.count())
  }

  test("dropFields removes columns") {
    val out = orders.transform(Converters.dropFields(Seq("o_orderpriority")))
    assert(!out.columns.contains("o_orderpriority"))
  }

  test("filterEq keeps only matching records") {
    val out = orders.transform(Converters.filterEq("o_orderstatus", "F"))
    assert(out.filter(col("o_orderstatus") =!= "F").count() == 0)
    assert(out.count() > 0)
  }

  test("filterRegex matches pattern") {
    val out = orders.transform(Converters.filterRegex("o_orderpriority", "^1-"))
    assert(out.count() == orders.filter(col("o_orderpriority").startsWith("1-")).count())
  }

  test("splitToRows is a 1:N flatMap") {
    val base = orders.select("o_orderkey", "o_orderpriority")
    val out = base.transform(Converters.splitToRows("o_orderpriority", "-"))
    assert(out.count() >= base.count())
    assert(out.columns.toSeq.sorted == Seq("o_orderkey", "token"))
  }

  test("derivePartition formats timestamps") {
    val out = orders.transform(Converters.derivePartition("o_orderdate", "yyyy-MM-dd"))
    val v = out.select("datepartition").head.getString(0)
    assert(v.matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("sampleByKeyMod is deterministic and proportional") {
    val a = lineitem.transform(Converters.sampleByKeyMod("l_orderkey", 2, 10)).count()
    val b = lineitem.transform(Converters.sampleByKeyMod("l_orderkey", 2, 10)).count()
    assert(a == b)
    assert(a > 0 && a < lineitem.count())
  }

  test("sampleBernoulli approximates the ratio") {
    val n = lineitem.count()
    val s = lineitem.transform(Converters.sampleBernoulli(0.2)).count()
    assert(s > n * 0.1 && s < n * 0.3)
  }

  test("parseJson extracts typed fields") {
    val ev = Tables.load(spark, sf, "events")
    val out = ev.transform(Converters.parseJson("props",
      StructType(Seq(StructField("k", LongType)))))
    assert(out.select(col("json.k")).filter(col("k").isNotNull).count() > 0)
  }

  test("toJsonString round-trips") {
    val out = orders.limit(5).transform(Converters.toJsonString())
    assert(out.head.getString(0).startsWith("{"))
  }

  test("chain composes in order") {
    val out = orders.transform(Converters.chain(Seq(
      Converters.filterEq("o_orderstatus", "F"),
      Converters.pickFields(Seq("o_orderkey")))))
    assert(out.columns.toSeq == Seq("o_orderkey"))
  }

  test("castFields changes types") {
    val out = orders.transform(Converters.castFields(Map("o_orderkey" -> StringType)))
    assert(out.schema("o_orderkey").dataType == StringType)
  }

  test("stratifiedSampleByHash: per-stratum rates, deterministic, layout-free") {
    import spark.implicits._
    val docs = Tables.load(spark, sf, "documents")
    val sampled = docs.transform(Converters.stratifiedSampleByHash(
      "doc_id", "lang", Map("en" -> 50, "de" -> 20), defaultRate = 10))
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    // hash is uniform: kept fraction lands near the configured rate
    assert(math.abs(frac("en") - 0.50) < 0.15, s"en=${frac("en")}")
    assert(math.abs(frac("de") - 0.20) < 0.15, s"de=${frac("de")}")
    assert(total.keySet.diff(Set("en", "de")).forall(l => frac(l) < 0.30))
    // deterministic across runs and layouts (repartition changes nothing)
    val again = docs.repartition(7)
      .transform(Converters.stratifiedSampleByHash(
        "doc_id", "lang", Map("en" -> 50, "de" -> 20), defaultRate = 10))
      .select("doc_id").as[Long].collect().toSet
    assert(again == sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("hashSplit: total partition, stable under growth, near target fractions") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
    val bands = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val split = docs.transform(Converters.hashSplit("doc_id", bands))
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byLabel.values.sum.toDouble
    // every row labeled, fractions near the band widths
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("train") / n - 0.80) < 0.10)
    assert(math.abs(byLabel("val") / n - 0.10) < 0.08)
    // growth stability: the assignment on a SUBSET matches the full
    // corpus assignment row-for-row — adding docs never flips a split
    val subset = docs.filter(col("doc_id") % 3 === 0)
      .transform(Converters.hashSplit("doc_id", bands))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = split.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
    // widths must sum to mod
    intercept[IllegalArgumentException] {
      Converters.hashSplit("doc_id", Seq("a" -> 50, "b" -> 20))(docs)
    }
  }

  test("weightedSample: deterministic, weight-proportional, no global sort") {
    import spark.implicits._
    val docs = graft.Tables.load(spark, sf, "documents")
      .withColumn("w", when(col("doc_id") % 10 === 0, 10.0).otherwise(1.0))
    val s1 = docs.transform(Converters.weightedSample("doc_id", "w", 100))
      .select("doc_id").as[Long].collect().toSet
    // layout-independent: identical sample from a different partitioning
    val s2 = docs.repartition(13)
      .transform(Converters.weightedSample("doc_id", "w", 100))
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 100)
    // inclusion tracks weight: heavy rows (w=10, 10% of corpus) must be
    // sampled at a much higher RATE than light rows
    val heavyRate = s1.count(_ % 10 == 0) / 50.0
    val lightRate = s1.count(_ % 10 != 0) / 450.0
    assert(heavyRate > 3 * lightRate,
      s"heavy $heavyRate vs light $lightRate")
    // zero/negative/null weights can never win a weighted draw
    val withBad = docs.withColumn("w",
      when(col("doc_id") % 2 === 0, lit(null).cast("double")).otherwise(lit(-1.0)))
    assert(withBad.transform(Converters.weightedSample("doc_id", "w", 10))
      .count() == 0)
    // selection is a top-n, not a global sort
    val plan = docs.transform(Converters.weightedSample("doc_id", "w", 100))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n$plan")
  }
}
