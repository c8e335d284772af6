package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("percentile law: smallest value whose cumulative share reaches p") {
    // 1..10, uniform: p50 = 5 (cum 5/10 = 50%), p90 = 9, p99 = 10
    val df = (1 to 10).map(_.toLong).toDF("x")
    val row = Profile.numericProfile(df, Seq("x")).collect()(0)
    assert(row.getAs[Double]("p50") == 5.0)
    assert(row.getAs[Double]("p90") == 9.0)
    assert(row.getAs[Double]("p99") == 10.0)
    assert(row.getAs[Long]("n") == 10L && row.getAs[Long]("n_distinct") == 10L)
  }

  test("skewed counts move the cut") {
    // 97 copies of 1, then 2, 3, 4: p99 lands on 3 (cum 99/100)
    val df = (Seq.fill(97)(1L) ++ Seq(2L, 3L, 4L)).toDF("x")
    val row = Profile.numericProfile(df, Seq("x")).collect()(0)
    assert(row.getAs[Double]("p50") == 1.0)
    assert(row.getAs[Double]("p99") == 3.0)
    assert(row.getAs[Double]("vmax") == 4.0)
  }

  test("nulls are counted but excluded from the distribution") {
    val df = Seq(Some(1L), None, Some(3L), None).toDF("x")
    val row = Profile.numericProfile(df, Seq("x")).collect()(0)
    assert(row.getAs[Long]("n") == 2L)
    assert(row.getAs[Long]("nulls") == 2L)
    assert(row.getAs[Double]("vmin") == 1.0 && row.getAs[Double]("vmax") == 3.0)
  }

  test("unbounded domains are refused loudly") {
    val li = Tables.load(spark, sf, "lineitem")
    val e = intercept[IllegalArgumentException] {
      Profile.numericProfile(li, Seq("l_extendedprice"), maxDistinct = 100L)
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("one row per column over real data") {
    val li = Tables.load(spark, sf, "lineitem")
    val out = Profile.numericProfile(li, Seq("l_quantity", "l_discount"))
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("colname")).toSet ==
      Set("l_quantity", "l_discount"))
    assert(rows.forall(r => r.getAs[Long]("nulls") == 0L))
  }

  test("winsorize clamps into the exact percentile band, nulls pass") {
    // 1..100 uniform: p5 = 5, p95 = 95
    val df = ((1 to 100).map(i => Some(i.toLong)) :+ None)
      .toDF("x")
    val out = Profile.winsorize(df, "x", 5, 95, "c")
      .collect().map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(Some(1L)) == Some(5.0))
    assert(out(Some(4L)) == Some(5.0))
    assert(out(Some(5L)) == Some(5.0))
    assert(out(Some(50L)) == Some(50.0))
    assert(out(Some(95L)) == Some(95.0))
    assert(out(Some(99L)) == Some(95.0))
    assert(out(None).isEmpty, "NULL input stays NULL")
    // degenerate inputs refused loudly
    intercept[IllegalArgumentException] {
      Profile.winsorize(Seq.empty[Option[Long]].toDF("x"), "x", 5, 95)
    }
    intercept[IllegalArgumentException] {
      Profile.winsorize(df, "x", 95, 5)
    }
  }

  test("groupedPercentiles: per-group cuts equal per-group ungrouped profiles") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), floor(col("value")).as("v"))
    val grouped = Profile.groupedPercentiles(ev, "event_type", "v",
        ps = Seq(50, 90))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0))
    types.foreach { ty =>
      val one = Profile.numericProfile(ev.filter(col("event_type") === ty),
        Seq("v"), Seq(50, 90)).collect()(0)
      assert(grouped(ty) == ((one.getAs[Double]("p50"),
        one.getAs[Double]("p90"))), s"group $ty")
    }
    // per-group distinct guard fires on oversized domains — in-plan
    // (raise_error) so the probe costs no extra scan of the input
    val e = intercept[Exception] {
      Profile.groupedPercentiles(ev, "event_type", "v",
        maxDistinctPerGroup = 3).collect()
    }
    assert(e.getMessage.contains("quantize before profiling"), e.getMessage)
  }
}
