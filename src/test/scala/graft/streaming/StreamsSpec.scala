package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StreamsSpec extends SparkSpec {

  test("streaming tumbling counts equal batch counts (stream/batch parity)") {
    val stream = Tables.loadStream(spark, sf, "events")
    val out = Streams.runToCompletion(
      Streams.tumblingCounts(stream, "ts", "1 minute"), "streams_spec_tbl")
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("minute", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("cnt"))
    assert(out.count() == batch.count())
    assert(out.exceptAll(batch).isEmpty && batch.exceptAll(out).isEmpty)
  }

  test("streaming fork writes each micro-batch to all sinks") {
    val dir = tmpDir("sfork")
    val stream = Tables.loadStream(spark, sf, "events")
    val q = Streams.forkSinks(stream, s"$dir/ckpt", Seq(
      "a" -> ((b: org.apache.spark.sql.DataFrame) =>
        b.select("event_id", "event_type").write.mode("append").parquet(s"$dir/a")),
      "b" -> ((b: org.apache.spark.sql.DataFrame) =>
        b.filter(col("event_type") === "error").write.mode("append")
          .parquet(s"$dir/b"))))
    q.awaitTermination()
    val n = Tables.load(spark, sf, "events").count()
    assert(spark.read.parquet(s"$dir/a").count() == n)
    assert(spark.read.parquet(s"$dir/b").count() ==
      Tables.load(spark, sf, "events").filter(col("event_type") === "error").count())
  }
}
