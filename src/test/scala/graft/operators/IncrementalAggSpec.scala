package graft.operators

import graft.{SparkSpec, Tables}
import graft.operators.IncrementalAgg._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("user_id", "event_type")
  private val specs = Seq(
    AggSpec.count("n"), AggSpec.sum("total", col("value")),
    AggSpec.min("vmin", col("value")), AggSpec.max("vmax", col("value")))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("user_id", "event_type")
      .collect().map(_.toSeq.map {
        case d: Double => f"$d%.9g"
        case v => String.valueOf(v)
      }.mkString("|")).toSeq

  test("merge of split partials equals the full aggregate") {
    val ev = Tables.load(spark, sf, "events")
    val full = state(ev, keys, specs)
    // split three ways on an arbitrary hash — no alignment with keys
    val parts = (0 until 3).map(i =>
      state(ev.filter(pmod(xxhash64(col("event_id")), lit(3)) === i),
        keys, specs))
    assert(canon(merge(parts, keys, specs)) == canon(full))
  }

  test("keys present in only one partial pass through unchanged") {
    val ev = Tables.load(spark, sf, "events")
    val a = ev.filter(col("user_id") < 5)
    val b = ev.filter(col("user_id") >= 5)
    val m = merge(Seq(state(a, keys, specs), state(b, keys, specs)),
      keys, specs)
    assert(canon(m) == canon(state(ev, keys, specs)))
  }

  test("rollup of a finer state equals the direct coarser aggregate") {
    val ev = Tables.load(spark, sf, "events")
    val hourSpecs = Seq(AggSpec.count("n"), AggSpec.sum("sv", col("value")))
    val hourly = state(ev.withColumn("bucket", date_trunc("hour", col("ts"))),
      Seq("event_type", "bucket"), hourSpecs)
    val daily = IncrementalAgg.rollup(hourly,
      Seq("bucket" -> date_trunc("day", col("bucket"))),
      Seq("event_type"), hourSpecs)
    val direct = state(ev.withColumn("bucket", date_trunc("day", col("ts"))),
      Seq("event_type", "bucket"), hourSpecs)
    def canonB(df: DataFrame): Seq[String] =
      df.orderBy("event_type", "bucket").collect()
        .map(_.toSeq.map {
          case d: Double => f"$d%.9g"
          case v => String.valueOf(v)
        }.mkString("|")).toSeq
    assert(canonB(daily.select("event_type", "bucket", "n", "sv")) ==
      canonB(direct.select("event_type", "bucket", "n", "sv")))
  }

  test("merging an empty delta is a no-op") {
    val ev = Tables.load(spark, sf, "events")
    val st = state(ev, keys, specs)
    val empty = state(ev.filter(lit(false)), keys, specs)
    assert(canon(merge(Seq(st, empty), keys, specs)) == canon(st))
  }
}
