package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, String, Double)]) =
    rows.toDF("k", "t", "v").select(col("k"),
      to_timestamp(col("t")).as("ts"), col("v"))

  test("grid is dense from first to last bucket per key") {
    val df = mk(Seq(
      (1L, "2024-01-01 00:10:00", 1.0),
      (1L, "2024-01-01 03:50:00", 4.0),
      (2L, "2024-01-01 01:00:00", 9.0)))
    val out = Resample.gridFill(df, Seq("k"), "ts", "1 hour",
      max(col("v")), "hour")
      .select(col("k"), col("bucket").cast("string"), col("value"))
      .as[(Long, String, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 01:00:00", 1.0), // gap: forward-filled
      (1L, "2024-01-01 02:00:00", 1.0), // gap: forward-filled
      (1L, "2024-01-01 03:00:00", 4.0),
      (2L, "2024-01-01 01:00:00", 9.0))) // single bucket, no grid beyond
  }

  test("bucket aggregation reduces multi-event buckets before the fill") {
    val df = mk(Seq(
      (1L, "2024-01-01 05:01:00", 2.0),
      (1L, "2024-01-01 05:59:00", 7.0),
      (1L, "2024-01-01 07:00:00", 1.0)))
    val out = Resample.gridFill(df, Seq("k"), "ts", "1 hour",
      max(col("v")), "hour")
      .select(col("value")).as[Double].collect().toSeq.sorted
    // 05h = max(2,7) = 7; 06h forward-fills 7; 07h = 1
    assert(out == Seq(1.0, 7.0, 7.0))
  }

  test("no empty buckets survive and counts match span on real events") {
    val ev = Tables.load(spark, sf, "events")
    val out = Resample.gridFill(ev, Seq("user_id"), "ts", "1 hour",
      max(col("value")), "hour").persist()
    try {
      assert(out.filter(col("value").isNull).count() == 0)
      // per key: rows == hours between min and max bucket inclusive
      val bad = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"), min("bucket").as("lo"),
          max("bucket").as("hi"))
        .withColumn("expect",
          (unix_timestamp(col("hi")) - unix_timestamp(col("lo"))) / 3600 + 1)
        .filter(col("n") =!= col("expect"))
      assert(bad.count() == 0)
    } finally { out.unpersist(); () }
  }
}
